package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — SURVEY §2.C marks it absent from the
  * reference; added as the time-series operator a training-data pipeline
  * needs (joining each event to the latest dimension state at event time).
  *
  * Implementation is the scalable union+window form: tag both sides, union,
  * one shuffle on the join key, and a running `last(_, ignoreNulls)` over
  * (time, side-priority) picks the most recent left-side payload at or
  * before each right row's timestamp. A range join would re-scan per row;
  * this is a single sort-based window pass and survives arbitrary fact-side
  * cardinality.
  */
object AsOf {

  /** For every `right` row, attach `payloadCol` of the latest `left` row
    * with the same `key` and `leftTime <= rightTime`. (key, leftTime) must
    * be unique on the left for deterministic results — pre-aggregate ties
    * upstream.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCol: String): DataFrame = {
    val rightExtras = right.columns.filterNot(_ == key).toSeq
    val payloadType = left.schema(payloadCol).dataType
    // a null left timestamp would sort to the partition head (asc = nulls
    // first) and masquerade as "earliest state" — it can never satisfy
    // leftTime <= rightTime, so drop it
    val l = left.filter(col(leftTime).isNotNull).select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__is_left"),
        col(payloadCol).as("__payload")) ++
        rightExtras.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__is_left"),
        lit(null).cast(payloadType).as("__payload")) ++
        rightExtras.map(col): _*)
    // left rows sort before right rows at equal timestamps so an event at
    // exactly the left row's time sees it (inclusive as-of)
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__is_left").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 0)
      .drop("__is_left", "__payload", "__t")
  }

  /** Q-J07 — as-of join: each event joined to the customer's latest order
    * at or before the event timestamp. Orders are deduplicated to one row
    * per (custkey, orderdate) — keeping the max orderkey — so the as-of
    * pick is well-defined on both engines (DuckDB's ASOF JOIN breaks
    * timestamp ties arbitrarily otherwise).
    */
  def qJ07(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val events = Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts"))
      .withColumnRenamed("user_id", "o_custkey")
    asofJoin(orders, events, "o_custkey", "o_orderdate", "ts", "o_orderkey")
      .select(col("o_custkey").as("user_id"), col("event_id"),
        col("__asof").as("last_order_key"))
      .orderBy("user_id", "event_id")
  }
}
