package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Packed sign-bit sketch of a float vector against `bits` deterministic
  * hyperplanes, as ONE codegen expression: bucket bit i is the sign of the
  * dot product with plane i, whose component j is exact-integer-derived —
  * `((i·64 + j)·2654435761 mod 1000003)/1000003 − 0.5` — so any engine
  * regenerates the planes from arithmetic alone (the qL36 oracle recomputes
  * the identical left-fold dots with list_reduce).
  *
  * Exists for the same reason as [[LshBuckets]]: Spark's higher-order
  * functions (zip_with/aggregate) evaluate INTERPRETED, so the
  * formulation of this math as 8 HOF passes per row pays per-plane
  * closure dispatch plus a materialized `sequence(0, size-1)` array —
  * this is a single bits × dim tight loop inside whole-stage codegen.
  * The fold order (j ascending, products accumulated left to right in
  * double) is bit-identical to both the HOF formulation and DuckDB's
  * `list_reduce(list_prepend(0.0, ...))`, which is what keeps the sketch
  * oracle-checkable.
  */
case class SignSketch(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"sign_sketch: bits must be in [1,63], got $bits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_sketch requires array<float>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_sketch"

  // A null ELEMENT propagates to a NULL sketch — the HOF formulation's dot
  // product goes NULL on the first null component and DuckDB's list_reduce
  // does the same, so reading unspecified bytes via getFloat would silently
  // diverge from both. Hence nullable even over a non-null array column.
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (SignSketch.hasNullElement(arr)) null
    else java.lang.Long.valueOf(SignSketch.sketch(arr, bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if (graft.functions.SignSketch.hasNullElement($c)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SignSketch.sketch($c, $bits);
      }""")

  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)
}

object SignSketch {

  /** Plane stride: component (i, j) hashes index i·Stride + j, FIXED at 64
    * (not the vector length) so a sketch is a pure function of (bits,
    * values) and the oracle SQL needs no dimension plumbing.
    */
  val Stride = 64

  /** Null-element scan shared by interpreted eval and generated code —
    * one cheap pass vs the bits×n sketch loop.
    */
  def hasNullElement(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return true
      j += 1
    }
    false
  }

  /** Called from both interpreted eval and generated code; callers must
    * reject null elements first ([[hasNullElement]]).
    */
  def sketch(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var i = 0
    while (i < bits) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val m = ((i.toLong * Stride + j) * 2654435761L) % 1000003L
        dot += arr.getFloat(j).toDouble * (m.toDouble / 1000003.0 - 0.5)
        j += 1
      }
      if (dot >= 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(SignSketch(ColumnBridge.expression(c), bits))
}
