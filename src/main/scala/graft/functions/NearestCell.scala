package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The centroid set of a [[NearestCell]] in executor-ready form: cell
  * ids as UTF8String, centroid vectors as primitive arrays, and each
  * centroid's norm precomputed ONCE (the per-row cosine then needs only
  * the dot product and the row's own norm; the precomputed value is the
  * same left-fold-of-squares double [[CosineSim.sim]] accumulates, so
  * scores stay bit-identical to the expression it replaces).
  */
final class NearestCellPacked(val cells: Array[UTF8String],
    val cents: Array[Array[Float]]) extends Serializable {
  val norms: Array[Double] = cents.map { ct =>
    var nb = 0.0
    var i = 0
    while (i < ct.length) { val y = ct(i).toDouble; nb += y * y; i += 1 }
    math.sqrt(nb)
  }
}

/** Nearest-centroid assignment as ONE codegen expression: the best cell
  * id for a float vector under [[CosineSim]] cosine (safe variant:
  * zero-norm scores -1), ties to the smallest cell id — exactly the
  * `ORDER BY sim DESC, cell` window rank it replaces in
  * [[graft.operators.Ivf.buildIndex]], minus the corpus × cells
  * shuffle: assignment is a row-local argmax over O(cells) broadcast
  * metadata, so the old cross-join + window-partitioned-by-vec_id shape
  * exchanged the entire corpus (embeddings included), cells times over,
  * on every bootstrap / append / retrain / Lloyd iteration for nothing
  * a per-row loop doesn't do. Same lesson as [[JlProject]]: a
  * higher-order-function fold would stay map-only but evaluate
  * interpreted per element; this is a cells × dim tight loop inside
  * whole-stage codegen.
  *
  * A NULL input vector, or one matching NO centroid's dimension, yields
  * NULL (the caller drops the row). The window shape it replaces
  * "assigned" such rows to an arbitrary cell via an all-NULL-ranked
  * tie — an accident of row_number, not a contract; no corpus here
  * carries them.
  */
case class NearestCell(child: Expression, cells: Seq[String],
    cents: Seq[Array[Float]]) extends UnaryExpression {

  require(cells.length == cents.length,
    s"nearest_cell: ${cells.length} cells vs ${cents.length} centroids")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell requires array<float>, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "nearest_cell"
  override def nullable: Boolean = true

  @transient private lazy val packed = new NearestCellPacked(
    cells.map(UTF8String.fromString).toArray, cents.toArray)

  // Array fields compare by REFERENCE under the synthesized case-class
  // equals, so two structurally identical assignments would never
  // canonicalize equal — Catalyst semanticEquals, exchange reuse, and
  // cached-plan matching would silently miss. Compare element-wise.
  override def equals(o: Any): Boolean = o match {
    case that: NearestCell =>
      child == that.child && cells == that.cells &&
        cents.length == that.cents.length &&
        cents.iterator.zip(that.cents.iterator)
          .forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }

  // cached: Catalyst hashes expressions repeatedly (ExpressionSet,
  // canonicalization, exchange-reuse maps) and the centroid sweep is
  // O(cells × dim) — at a sqrt-n cell layout that is millions of
  // floats per call
  @transient private lazy val cachedHash: Int = {
    var h = child.hashCode() * 31 + cells.hashCode()
    cents.foreach(a => h = h * 31 + java.util.Arrays.hashCode(a))
    h
  }

  override def hashCode(): Int = cachedHash

  override protected def nullSafeEval(v: Any): Any =
    NearestCell.best(v.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("nearestPacked", packed,
      "graft.functions.NearestCellPacked")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.NearestCell.best($a, $pRef);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {

  /** Called from both interpreted eval and generated code. Cells whose
    * dimension mismatches the vector are skipped ([[CosineSim]] scores
    * such a pair NULL); no scoreable cell → null.
    */
  def best(v: ArrayData, p: NearestCellPacked): UTF8String = {
    val n = v.numElements()
    var bestSim = Double.NegativeInfinity
    var bestCell: UTF8String = null
    var c = 0
    while (c < p.cents.length) {
      val ct = p.cents(c)
      if (ct.length == n) {
        var dot = 0.0
        var na = 0.0
        var i = 0
        while (i < n) {
          val x = v.getFloat(i).toDouble
          dot += x * ct(i).toDouble
          na += x * x
          i += 1
        }
        val denom = math.sqrt(na) * p.norms(c)
        val sim = if (denom == 0.0) -1.0 else dot / denom
        if (sim > bestSim || (sim == bestSim &&
            (bestCell == null || p.cells(c).compareTo(bestCell) < 0))) {
          bestSim = sim
          bestCell = p.cells(c)
        }
      }
      c += 1
    }
    bestCell
  }

  def apply(c: Column, cells: Seq[String], cents: Seq[Array[Float]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(c), cells, cents))
}
