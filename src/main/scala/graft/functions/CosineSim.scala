package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float vectors as one codegen expression: a
  * single fused loop accumulates dot product and both squared norms —
  * numerically identical to the sequential-left-fold zip_with/aggregate
  * composition it replaces (same order of double additions), but ~50×
  * cheaper per pair: the higher-order form ran three interpreted
  * lambda passes per evaluation, which dominated the LSH near-dup join
  * (millions of candidate pairs).
  *
  * `safe = true` maps zero-norm inputs to -1 (rank last in a descending
  * top-k); `safe = false` returns the raw 0/0 = NaN, which both Spark and
  * DuckDB order as the largest double — the oracle-parity behavior.
  */
case class CosineSim(left: Expression, right: Expression, safe: Boolean)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // mismatched dimensions yield NULL (matching the zip_with null-padding
  // semantics this replaced), so the expression is nullable even for
  // non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else CosineSim.sim(x, y, safe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSim.sim($a, $b, $safe);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Called from both interpreted eval and generated code. Accumulation
    * order matches the sequential left folds of the zip_with/aggregate
    * formulation, so results are bit-identical across both paths.
    */
  def sim(a: ArrayData, b: ArrayData, safe: Boolean): Double = {
    // equal dimensions are enforced by the expression (mismatch → NULL)
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (safe && denom == 0.0) -1.0 else dot / denom
  }

  def apply(a: Column, b: Column, safe: Boolean): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a),
      ColumnBridge.expression(b), safe))
}
