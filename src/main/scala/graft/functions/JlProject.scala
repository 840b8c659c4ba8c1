package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Johnson-Lindenstrauss ±1 sign projection of an int8-quantized vector
  * (`array<int>` codes from Similarity.quantizeInt8) into `m` exact
  * BIGINT coordinates, as ONE codegen expression: coordinate j is
  * Σᵢ qv[i] · sign(i, j), with sign(i, j) = +1 when
  * ((i + j·64) · 2654435761 mod 1000003) is even, −1 otherwise — the
  * same exact-integer hyperplane family as [[SignSketch]] (hash input
  * plane·64 + element), so no projection matrix is stored and any engine
  * regenerates it from arithmetic alone (the qL53 oracle respells the
  * identical ±1 sums in SQL).
  *
  * Exists for the same reason as [[SignSketch]] and [[LshBuckets]]
  * (Similarity.scala's qL36 lesson): Spark's higher-order functions
  * evaluate INTERPRETED, so the previous formulation — m=16 separate
  * `aggregate(zip_with(qv, sequence(...)))` passes per row — paid
  * per-coordinate closure dispatch plus m materialized index arrays.
  * This is a single m × dim tight loop inside whole-stage codegen, and
  * the projection stays what it must be at 100 TB: a pure per-row map,
  * zero shuffle at any corpus size.
  *
  * Null semantics are bit-compatible with the HOF formulation it
  * replaces: a NULL input array or any NULL element yields an array of m
  * NULL coordinates (the per-coordinate folds each go NULL), never a
  * NULL array — so swapping the implementations cannot flip a row hash.
  */
case class JlProject(child: Expression, m: Int)
    extends UnaryExpression {

  require(m >= 1 && m <= 1024, s"jl_project: m must be in [1,1024], got $m")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jl_project requires array<int> quantized codes, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "jl_project"

  // The RESULT array is never NULL — a NULL/degenerate input degrades to
  // an array of NULL coordinates exactly like the m independent HOF
  // folds did — so eval/doGenCode handle nulls themselves instead of the
  // nullSafe wrappers (which would nullify the whole array).
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    JlProject.project(
      if (v == null) null else v.asInstanceOf[ArrayData], m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.JlProject.project(
            ${c.isNull} ? null : ${c.value}, $m);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {

  /** Stride between coordinate hash blocks — FIXED at 64 like
    * [[SignSketch.Stride]], so a projection is a pure function of
    * (m, codes) and the oracle SQL needs no dimension plumbing.
    */
  val Stride = 64

  /** Called from both interpreted eval and generated code. `arr == null`
    * or any null element degrades to an all-NULL coordinate array (the
    * HOF-fold semantics this expression replaces).
    */
  def project(arr: ArrayData, m: Int): ArrayData = {
    // EMPTY arrays are null coordinates too: the HOF folds this replaced
    // zipped the empty array against sequence(0, -1) = [0, -1], padding
    // with nulls → every fold went NULL (not 0) — bit-compat demands it
    if (arr == null || arr.numElements() == 0 ||
        SignSketch.hasNullElement(arr))
      return new GenericArrayData(Array.fill[Any](m)(null))
    val n = arr.numElements()
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val base = j.toLong * Stride
      var acc = 0L
      var i = 0
      while (i < n) {
        val h = ((i.toLong + base) * 2654435761L) % 1000003L
        acc += (if ((h & 1L) == 0L) arr.getInt(i).toLong
                else -arr.getInt(i).toLong)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def apply(c: Column, m: Int): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expression(c), m))
}
