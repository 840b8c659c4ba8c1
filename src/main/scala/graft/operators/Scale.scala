package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns for the 100 TB posture (SURVEY §7.4 item 6): explicit
  * skew-salting for when AQE's runtime skew-join split isn't available
  * (e.g. a skewed key joined against a non-shuffle-join), and approximate
  * twins of exact aggregates whose shuffled state would be unbounded.
  */
object Scale {

  /** Salted equi-join for a skewed key: the large side gets a pseudo-random
    * salt in [0, buckets), the small side is replicated across every salt
    * bucket, and the join key becomes (key, salt) — one hot key fans out
    * over `buckets` reducers instead of one. Produces exactly the rows of
    * `large.join(small, key)`: every large row lands in precisely one
    * bucket and every small row is present in all of them.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    // salt from row CONTENT (not monotonically_increasing_id): ids are
    // assigned by in-partition position, which is not stable when a lost
    // post-shuffle task is recomputed — a row could change buckets between
    // the original and replayed attempt, dropping/duplicating join rows
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Q-A06 — approximate distinct counts (HyperLogLog++): the 100 TB twin
    * of Q-A03's exact COUNT(DISTINCT). Sketches merge associatively, so
    * the shuffle carries fixed-size state per group instead of every
    * distinct value. rsd 0.02 ⇒ ~2% relative error; tighter rsd grows the
    * register file quadratically and Spark flattens it into one aggregate-
    * buffer attribute per word (rsd 0.01 ⇒ 3278 buffer columns, ~2 s of
    * codegen compile alone). Engine-specific sketch values → rows-only
    * check; the exact query remains the oracle-checked one.
    */
  def qA06(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_custkeys"),
        approx_count_distinct(col("o_orderpriority"), 0.02).as("approx_priorities"))

  /** Q-A07 — approximate quantiles over order totals via percentile_approx
    * (mergeable t-digest-style sketch, same bounded-state argument).
    */
  def qA07(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(percentile_approx(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.99)), lit(10000))
        .as("q"))
      // scalar final columns (harness rule: no arrays in query output)
      .select(
        col("q").getItem(0).as("p25"),
        col("q").getItem(1).as("p50"),
        col("q").getItem(2).as("p75"),
        col("q").getItem(3).as("p99"))

  /** Incremental distinct counting via persisted Datasketches HLL: one
    * binary sketch per partition value (e.g. per ingest day), stored as a
    * tiny table; the running distinct-over-everything is `hll_union_agg`
    * over stored sketches — history is never rescanned when a new batch
    * arrives. This is THE pattern for "distinct users ever" over a
    * growing 100 TB corpus: per-batch work is one scan of the batch,
    * union work is O(sketches).
    */
  def sketchPerPartition(df: DataFrame, partitionCol: String,
      valueCol: String, lgConfigK: Int = 12): DataFrame =
    df.groupBy(partitionCol)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Union previously-stored sketches into one distinct estimate. */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_estimate"))

  /** Q-A15 — the incremental-distinct pattern end-to-end: per-day user
    * sketches unioned to the all-time distinct estimate (rows-only:
    * Datasketches binary values are engine-specific; the 5%-of-exact
    * bound is spec-checked in EngineSpec).
    */
  def qA15(s: SparkSession, d: String): DataFrame =
    unionEstimate(sketchPerPartition(
      Tables.events(s, d).withColumn("day", to_date(col("ts"))),
      "day", "user_id"))
}
