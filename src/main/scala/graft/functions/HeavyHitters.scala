package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator: bounded state
  * (≤ `capacity` counters) per partial aggregate, mergeable, one pass.
  *
  * The naive top-k tokens plan (`groupBy(token).count.orderBy.limit`)
  * shuffles one row per DISTINCT token — billions of keys at corpus
  * scale. The sketch caps partial-aggregate state at `capacity` entries,
  * so the shuffle carries at most capacity counters per partition
  * regardless of vocabulary size. Guarantee: any item with true count
  * > N/(capacity+1) is retained, with its counter underestimating by at
  * most N/(capacity+1) — so the sketch yields a candidate set, and an
  * exact recount restricted to those candidates (a second pruned pass)
  * recovers exact counts. See [[graft.operators.LLMOps.qL17]].
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"heavy_hitters: capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < capacity => b.updated(tok, 1L)
      // full and unseen: decrement every counter (the classic MG step),
      // dropping zeros — amortized O(1) decrements per stream element
      case None => b.flatMap { case (k, c) =>
        if (c > 1) Some(k -> (c - 1)) else None
      }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count from everything and
      // keep the positives — the standard mergeable-MG reduction, which
      // preserves the N/(capacity+1) error bound
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)
        .drop(capacity).head
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
