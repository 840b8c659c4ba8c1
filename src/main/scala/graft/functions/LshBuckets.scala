package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Multi-table random-hyperplane LSH signatures as one codegen expression:
  * for each of `tables` hash tables, the sign bits of `bits` hyperplane
  * dot products, with the table index folded into the bucket id (so the
  * result explodes directly into a join key).
  *
  * Hyperplane components are splitmix64-derived pseudo-randoms in
  * [-0.5, 0.5) — deterministic, data-independent, no stored model. The
  * higher-order-function formulation of the same math ran one interpreted
  * zip_with/aggregate pass per plane (tables × bits passes per row, ~16 ms
  * per 64-dim vector); this is a single tables × bits × dim tight loop
  * inside whole-stage codegen.
  */
case class LshBuckets(child: Expression, bits: Int, tables: Int, seed: Long)
    extends UnaryExpression {

  // sig occupies bits 0..bits-1 and the table id bits 32+; more than 32
  // signature bits would silently overlap the table field
  require(bits >= 1 && bits <= 32, s"lsh_buckets: bits must be in [1,32], got $bits")
  require(tables >= 1, s"lsh_buckets: tables must be >= 1, got $tables")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires array<float>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], bits, tables, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBuckets.buckets($c, $bits, $tables, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** splitmix64 finalizer — cheap, well-distributed. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Called from both interpreted eval and generated code. */
  def buckets(arr: ArrayData, bits: Int, tables: Int, seed: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var h = 0
      while (h < bits) {
        val planeSeed = mix(seed + t * 1000L + h)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val r = mix(planeSeed ^ (i.toLong * 0x2545F4914F6CDD1DL))
          val comp = ((r >>> 11).toDouble / (1L << 53).toDouble) - 0.5
          acc += arr.getFloat(i) * comp
          i += 1
        }
        if (acc >= 0) sig |= (1L << h)
        h += 1
      }
      out(t) = (t.toLong << 32) | sig // table id folded into the join key
      t += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, bits: Int, tables: Int, seed: Long = 0L): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(c), bits, tables, seed))
}
