package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Top-k rows per group as a first-class operator: logical node, planner
  * strategy, and a heap-based physical operator.
  *
  * The composed form (`row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * then filter) shuffles EVERY row and sorts every partition — O(n log n)
  * per partition and full-input shuffle volume. This operator keeps a
  * bounded heap of k rows per group instead: O(n log k) with no sort, and
  * the strategy plans it as partial → shuffle → final (the aggregation
  * pattern), so the shuffle carries at most k rows per (group, input
  * partition) — at 100 TB the shuffle shrinks from the whole input to
  * ~k × groups × partitions rows. Top-k is merge-idempotent, which is what
  * makes the partial pass correct: the global top-k of a group is contained
  * in the union of per-partition top-ks.
  *
  * Semantics: the retained set equals `row_number` ≤ k (not `rank`): ties
  * at the boundary are broken arbitrarily, so pass a total ordering when
  * deterministic output matters (same contract as row_number itself).
  * Reference analog: the clone tool's per-constraint `ORDER BY key_ordinal`
  * top-list idiom (/root/reference/Program.cs:255-272) done distributed.
  */
case class GroupTopK(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"group_top_k: k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Physical heap-based top-k per group. `partial = true` instances accept
  * any input distribution (map-side pruning before the exchange); the
  * final instance requires clustering on the group keys.
  */
case class GroupTopKExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val orderE = ordering
    val limit = k
    val outRows = longMetric("numOutputRows")
    val groups = longMetric("numGroups")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      val ord = RowOrdering.create(orderE, schema)
      // max-heap per group: head is the worst retained row, evicted when a
      // better (ordering-smaller) row arrives at capacity
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      groups += heaps.size
      heaps.valuesIterator.flatMap { h => outRows += h.size; h.iterator }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

/** Plans [[GroupTopK]] as partial-then-final [[GroupTopKExec]]; the
  * exchange EnsureRequirements inserts between them carries only the
  * partial winners.
  */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(g, o, k, child) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
