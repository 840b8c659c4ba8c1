package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Temporal / event-time operators (SURVEY §2.D Q-T01/Q-T02). These are the
  * batch analogs of the streaming windows in [[graft.streaming.StreamOps]];
  * the semantics (tumbling bucket, 30-minute session gap) are shared so the
  * streaming path can be validated against these oracle-checked versions.
  */
object Temporal {

  /** Q-T01 — tumbling window as a batch query: events per (hour, type).
    * date_trunc keeps the bucket computation inside codegen; the aggregate
    * is an ordinary partial+final hash agg, so it scales linearly.
    */
  def qT01(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("users"))
      .orderBy("hr", "event_type")

  /** Q-T03 — sliding window as a batch query: 1-hour windows advancing
    * every 15 minutes (each event lands in 4 windows). Spark's batch
    * `window()` explodes the covered windows before the hash agg — the
    * same operator Structured Streaming uses, so batch and stream share
    * bucket semantics exactly.
    */
  def qT03(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))
      .orderBy("w_start", "event_type")

  /** Q-T02 — batch sessionization: a session breaks when the per-user gap
    * exceeds 30 minutes. All arithmetic on epoch microseconds (exact
    * integers), so the result is engine-independent. The single shuffle is
    * the window partition by user_id; session counting is then a hash agg
    * on the same key, which Catalyst schedules without a second shuffle.
    */
  def qT02(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1).otherwise(0))
      .groupBy("user_id")
      .agg((sum(col("new_session")) + 1).cast("long").as("sessions"),
        count(lit(1)).as("events"))
      .orderBy("user_id")
  }

  /** Q-T05 — batch `session_window`: the same native operator Structured
    * Streaming uses for session aggregation, run as a batch query
    * (sessions merge while event times are within the 30-minute gap;
    * window end = last event + gap, end-exclusive, so a gap of exactly
    * 30 min starts a new session — mirrored by `>=` in the oracle). All
    * outputs are epoch microseconds: exact integers on both engines.
    */
  def qT05(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("s_start"),
        unix_micros(col("w.end")).as("s_end"),
        col("cnt"))
      .orderBy("user_id", "s_start")

  /** Q-T04 — gap-fill: the dense hour spine is generated with
    * `sequence` + explode from the observed min/max (a 2-row broadcast),
    * then left-joined to the hourly counts so silent gaps become explicit
    * zeros. At scale the spine is tiny (hours, not events) — the join
    * broadcasts the counts' dimension, never re-shuffling the fact scan's
    * aggregate output by anything new.
    */
  def qT04(s: SparkSession, d: String): DataFrame = {
    val hours = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("h"))
    val counts = hours.groupBy("h").agg(count(lit(1)).as("cnt"))
    val spine = counts.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
    spine.join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("h")
  }

  /** Q-T06 — ordered conversion funnel: how many users have a view, a
    * click strictly after their first view, and a purchase strictly after
    * that first qualifying click. The event-sequence analysis every
    * product pipeline runs, and a different shape from sessionization:
    * each stage's anchor timestamp CONDITIONS the next stage's filter.
    *
    * Shape: three stacked window aggregates over the SAME partitioning
    * (user_id, whole-partition frame) — each `min(when(...))` may
    * reference the previous stage's column, and identical partitioning
    * means Catalyst plans them over one exchange: ONE scan, ONE shuffle,
    * no self-joins of the event log (the naive formulation joins events
    * to events per stage — quadratic in events per user at 100 TB). The
    * final funnel row is a tiny distinct-user aggregate.
    */
  def qT06(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("first_click",
        min(when(col("event_type") === "click" &&
          col("ts") > col("first_view"), col("ts"))).over(w))
      .withColumn("first_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("first_click"), col("ts"))).over(w))
      // reduce to one row per user FIRST (the window columns are
      // per-user constants, and the groupBy rides the window's existing
      // user_id distribution — no new exchange), then count flags: a
      // triple countDistinct over the raw events would plan an Expand
      // that pushes the event stream through the aggregate three times
      .groupBy("user_id")
      .agg(max(col("first_view")).as("fv"), max(col("first_click")).as("fc"),
        max(col("first_purchase")).as("fp"))
      .agg(
        sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("viewed"),
        sum(when(col("fc").isNotNull, 1L).otherwise(0L)).as("clicked"),
        sum(when(col("fp").isNotNull, 1L).otherwise(0L)).as("purchased"))
  }

  /** Q-T07 — cohort retention: users bucketed by first-activity week
    * (their cohort), counted per week-offset of later activity — the
    * retention triangle every product pipeline derives from an event log.
    *
    * Shape: the cohort week is a whole-partition window min over the
    * user_id exchange (no self-join of the event log against its own
    * minima), then one distinct-count aggregate per (cohort, offset).
    * Week arithmetic stays integral: both engines truncate to ISO Monday
    * and the day difference of two week-truncated stamps is divisible by
    * 7, so `div 7` is exact.
    */
  def qT07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .withColumn("cohort", min(col("wk")).over(w))
      .groupBy(col("cohort"), expr("datediff(wk, cohort) div 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort", "week_offset")
  }

  /** Q-W07 — event-time trailing window: at every event, the user's
    * 7-day trailing spend and event count. A RANGE frame over exact
    * epoch MICROseconds (integers — qT02's trick, so frame membership
    * can't drift on float time math) with an exact-decimal sum. One
    * shuffle on user_id; each user's timeline sorts independently, so
    * the plan scales with users, not with any global ordering. Unlike
    * qT03's fixed sliding buckets, the window here is anchored to each
    * ROW — per-event features (fraud scores, rate limits) rather than
    * per-bucket dashboards.
    */
  def qW07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, Window.currentRow)
    Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("trail_sum",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn("trail_cnt", count(lit(1)).over(w))
      .select("user_id", "event_id", "trail_sum", "trail_cnt")
      .orderBy("user_id", "event_id")
  }

  /** Q-T08 — session path extraction: per (user, 30-minute session) the
    * ORDERED event-type path string ("view>click>purchase") plus start
    * and length — the behavioral-sequence construction step that turns an
    * event log into sequence-model training examples (and the input to
    * path/funnel mining). Sessions use qT02's lag-gap derivation on exact
    * epoch micros; the path is collect_list of (ts, event_id, type)
    * structs sorted IN the aggregate (array_sort on the struct is a total
    * order because event_id is unique — deterministic across partition
    * orders, where a bare collect_list concatenation order is not).
    * Scale: one user_id exchange serves the lag window, the session-id
    * running sum, AND the per-session aggregate (subset-key
    * partitioning); per-group state is one session's events — the output
    * row itself, not a skew concentration.
    */
  def qT08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) >= 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(wCum))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_us")).as("s_start"),
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts_us"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
      .select("user_id", "s_start", "n_events", "path")
      .orderBy("user_id", "s_start")
  }

  /** Q-T09 — time-weighted value per user (the TWAP shape): each event's
    * value is weighted by how long it REMAINED current (lead(ts) − ts),
    * the standard correction for irregularly-sampled series where a plain
    * AVG over-counts bursts. Deliberately emits the exact integer pair
    * (Σ value·dt, Σ dt) rather than their quotient: values go through
    * `floor(·100 + 0.5)` cents and DECIMAL(18,0)×µs products summed in
    * DECIMAL(38,0) — bit-identical across engines where a double
    * division would not be. The Σ value·dt sum exceeds 2^53, the point
    * past which a float64-canonicalizing hasher silently diverges even
    * when values are exact, so it is emitted as two sub-2^53 BIGINTs
    * (DIV / MOD 10^6; the sum is non-negative, so truncating and
    * flooring division agree). ONE user_id exchange serves both the
    * window and the aggregate (the qT08 partitioning-reuse pattern).
    */
  def qT09(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("dt",
        unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .where(col("dt").isNotNull)
      .select(col("user_id"), col("dt"),
        floor(col("value") * 100 + 0.5).cast("decimal(18,0)").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("total_dt_us"),
        sum(col("cents") * col("dt").cast("decimal(18,0)"))
          .cast("decimal(38,0)").as("vt"))
      .select(col("user_id"), col("n_intervals"), col("total_dt_us"),
        expr("CAST(vt DIV 1000000 AS BIGINT)").as("value_time_hi"),
        expr("CAST(vt % 1000000 AS BIGINT)").as("value_time_lo"))
      .orderBy("user_id")
  }
}
