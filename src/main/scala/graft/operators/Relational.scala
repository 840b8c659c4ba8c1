package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import Determinism._

/** The relational query surface (SURVEY §2.B / §2.D, Q-P/A/J/Q/W/S/U/F).
  *
  * Each query is declared with the DataFrame API so Catalyst gets a fully
  * declarative plan: parquet column pruning + predicate pushdown, partial
  * aggregation, broadcast-join selection for the small dimension tables and
  * AQE re-planning all come for free. Every query ends in a total ORDER BY
  * and floating aggregates go through Determinism.dsum (decimal-exact,
  * partition-order-independent) so results hash-match the DuckDB oracle.
  *
  * Reference semantics being re-expressed (all from /root/reference/
  * Program.cs): projection/filter (B1/B2, e.g. Program.cs:128,457-459),
  * inner/left joins (B3/B4, Program.cs:127,176-182), GROUP BY + aggregates
  * (B5/B6, Program.cs:378,41), ordered string agg (B7, Program.cs:255-292),
  * correlated subqueries (B8, Program.cs:263-264), DISTINCT (B9,
  * Program.cs:125), ORDER BY (B10, Program.cs:184), CASE (B11,
  * Program.cs:253-294), COALESCE (B12, Program.cs:168), string/metadata fns
  * (B13/B14), EXISTS guards → semi/anti joins (B16, Program.cs:134 et al.).
  */
object Relational {

  /** Q-P01 — scan + project + filter; predicate mirrors Program.cs:457-459
    * style. Both predicates reach the parquet scan as PushedFilters.
    */
  def qP01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp")
        && col("l_discount") > 0.02)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q-A01 — TPC-H Q1-shaped hash aggregate (partial+final via Catalyst). */
  def qA01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))
          * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q-A02 — conditional aggregation (CASE inside SUM, cf. B11). */
  def qA02(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_totalprice") > 100000, 1).otherwise(0)).as("big_orders"),
        count(lit(1)).as("total_orders"))
      .orderBy("o_orderpriority")

  /** Q-A03 — distinct aggregates (B9). At 100 TB the approximate twin is
    * LLMOps.approxDistinct; this exact form is the oracle-checked one.
    */
  def qA03(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        countDistinct(col("o_custkey")).as("distinct_custkeys"),
        countDistinct(col("o_orderpriority")).as("distinct_priorities"))

  /** Q-A04 — ROLLUP grouping sets. */
  def qA04(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .rollup(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("n_regionkey"), asc_nulls_first("n_nationkey"))

  /** Q-A08 — CUBE grouping sets (all four group-by combinations). */
  def qA08(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .cube(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("n_regionkey"), asc_nulls_first("n_nationkey"))

  /** Q-A09 — argmin/argmax aggregates: per priority, the order key holding
    * the extreme total price (ties broken by max price being unique-ish;
    * min_by/max_by on (price, key) struct makes the pick deterministic).
    */
  def qA09(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("max_order"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"))
      .orderBy("o_orderpriority")

  /** Q-A11 — grouping_id over ROLLUP: distinguishes the aggregation level
    * of each grouping-sets row (the bitmask both engines define
    * identically).
    */
  def qA11(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .rollup(col("n_regionkey"), col("n_nationkey"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("n_regionkey"), asc_nulls_first("n_nationkey"))

  /** Q-A10 — pivot: order counts per priority × year, years widened to
    * columns. Explicit pivot values keep the plan a single pass (no
    * distinct-values pre-query) — the form that scales.
    */
  def qA10(s: SparkSession, d: String): DataFrame = {
    val years = Seq(1995, 1996, 1997, 1998, 1999, 2000, 2001)
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy("o_orderpriority")
      .pivot("yr", years)
      .agg(count(lit(1)))
      .select(col("o_orderpriority") +: years.map(y =>
        coalesce(col(y.toString), lit(0L)).as(s"y$y")): _*)
      .orderBy("o_orderpriority")
  }

  /** Q-A05 — ordered string aggregation: the reference's signature idiom
    * (STUFF(... FOR XML PATH('')) at Program.cs:255-292), Spark-first as
    * collect_list → array_sort → array_join (order-independent because the
    * sort happens after collection). Scale note: string-agg state is
    * inherently O(group size) — at 100 TB cap the group first (e.g.
    * slice(array_sort(collect_list(...)), 1, K)) or the aggregate state
    * itself becomes the bottleneck; the unbounded form here is the
    * reference's contract.
    */
  def qA05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(array_join(array_sort(collect_list(col("c_name"))), ", ").as("customers"))
      .orderBy("n_name")
  }

  /** Q-J01 — inner equi-join. customer GROWS with the scale factor, so no
    * broadcast hint: AQE broadcasts it while it fits and shuffle-joins
    * beyond (a forced hint would OOM the driver at large SF).
    */
  def qJ01(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_totalprice", "c_name")
      .orderBy("o_orderkey")
  }

  /** Q-J02 — 4-way join (cf. the triggers query, Program.cs:553-556):
    * region ⋈ nation ⋈ customer ⋈ orders, revenue per region. The three
    * fixed-size dimensions (nation, region) broadcast; customer scales
    * with SF so its join is left to AQE (broadcast while small,
    * shuffle-join at scale).
    */
  def qJ02(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("order_cnt"))
      .orderBy("r_name")
  }

  /** Q-J08 — TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with date
    * predicates on both fact sides, revenue per order, top-10. The two
    * filters reach their parquet scans as PushedFilters; the final top-k
    * is TakeOrderedAndProject (per-partition heaps, no total sort).
    */
  def qJ08(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    val c = Tables.customer(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey").as("o_orderkey"), col("o_orderdate"))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Q-J03 — left outer join + COALESCE (B4 + B12, Program.cs:176-182,168). */
  def qJ03(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"),
        count(col("o_orderkey")).as("order_cnt"))
      .orderBy("c_custkey")
  }

  /** Q-J04 — left semi join (EXISTS guard pattern, B16, Program.cs:134). */
  def qJ04(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q-J05 — left anti join (NOT EXISTS): customers with no 1998 order.
    * (Every customer has *some* order in the corpus, so the unfiltered
    * anti join would be a vacuous 0-row check.)
    */
  def qJ05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1998)
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q-J06 — range/theta join: equi key plus a non-equi BETWEEN residual.
    * Catalyst plans the equality as the hash-join key and evaluates the
    * range predicate as a post-join filter — no BNLJ blowup.
    */
  def qJ06(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val l = Tables.lineitem(s, d)
    p.join(l, p("p_partkey") === l("l_partkey")
        && l("l_extendedprice").between(p("p_retailprice") * 0.5, p("p_retailprice") * 2.0))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("p_brand")
  }

  /** Q-Q01 — correlated scalar subquery (B8, Program.cs:263-264), expressed
    * decorrelated (pre-aggregate + join) as Catalyst itself would rewrite it.
    */
  def qQ01(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val avgs = c.groupBy("c_nationkey").agg(avg(col("c_acctbal")).as("nation_avg"))
    c.join(broadcast(avgs), Seq("c_nationkey"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Q-Q02 — the correlated scalar subquery written literally in SQL over
    * registered views: exercises the SQL parser and Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelation (SURVEY B8) — the same
    * semantics qQ01 expresses with the pre-aggregate+join DataFrame form.
    */
  def qQ02(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c_custkey, c_acctbal FROM customer_v c
      WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_v c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey""")
  }

  /** Q-W01 — ranking window (ROW_NUMBER/RANK); deterministic because the
    * window order ends in the unique o_orderkey.
    */
  def qW01(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn", "rnk")
      .orderBy("o_custkey", "rn")
  }

  /** Q-W02 — running aggregate with an explicit ROWS frame; decimal-exact
    * so the running sum is identical regardless of engine.
    */
  def qW02(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q-W04 — RANGE frame: running sum over all orders of the customer
    * whose total price is within 10000 below the current row's (a value
    * window, not a row window — rows with equal order keys share frames).
    */
  def qW04(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("near_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn("near_cnt", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "near_total", "near_cnt")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q-W05 — distribution windows: percent_rank / cume_dist / ntile. */
  def qW05(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Q-W06 — first_value / last_value / nth_value over the full partition
    * frame (first, latest and second order per customer).
    */
  def qW06(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q-W03 — LAG over event time (per-user delta). */
  def qW03(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
      .select("user_id", "event_id", "value", "delta")
      .orderBy("user_id", "event_id")
  }

  /** Q-S01 — top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject (a
    * per-partition heap + driver merge — no total sort even at 100 TB).
    */
  def qS01(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q-U01 — UNION (set semantics: union + distinct). */
  def qU01(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
    o.union(c).distinct().orderBy("custkey")
  }

  /** Q-U04 — UNION ALL (bag semantics): per-key multiplicity preserved. */
  def qU04(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
    o.unionAll(c).groupBy("custkey").agg(count(lit(1)).as("appearances"))
      .orderBy("custkey")
  }

  /** Q-U02 — INTERSECT. */
  def qU02(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
    c.intersect(o).orderBy("custkey")
  }

  /** Q-U03 — EXCEPT: customer keys minus keys with a 1998 order (the
    * unrestricted difference is empty in this corpus).
    */
  def qU03(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1998)
      .select(col("o_custkey").as("custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
    c.except(o).orderBy("custkey")
  }

  /** Q-F01 — string function suite (B13, Program.cs:242-254 concat/quote
    * handling re-expressed with codegen'd built-ins).
    */
  def qF01(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        length(col("c_name")).cast("long").as("name_len"),
        // literal replacement → the literal `replace` built-in: cheaper than
        // regexp_replace and immune to regex metacharacters in the pattern
        replace(col("c_name"), lit("Customer"), lit("Cust")).as("short_name"),
        trim(col("c_name")).as("trimmed"),
        col("c_name").like("Customer%").as("is_customer"))
      .orderBy("c_custkey")

  /** Q-F02 — date function suite (B13/write-path formatting,
    * Program.cs:763-767).
    */
  def qF02(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("yr", "mo")

  /** Q-F03 — math function suite. ROUND is only applied at scale 0 (binary-
    * exact halves), never at fractional scale on raw doubles — see SURVEY
    * §7.4 determinism note.
    */
  def qF03(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice"), 0).as("price_rounded"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q-F04 — JSON extraction over events.props (declared in §2.C map/JSON
    * row; props is a JSON object string like {"k": 87}).
    */
  def qF04(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").as("k_val"))
      .groupBy("k_val")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("k_val"))

  /** Q-F14 — the VARIANT path through the same JSON column qF04 reads as
    * text: `parse_json` shreds `props` into Spark 4's binary variant
    * encoding once, `variant_get` extracts typed fields without
    * re-parsing. At 100 TB this is the semi-structured answer to reading
    * JSON strings per-query — parse once at ingest, store variant, every
    * downstream extraction is a typed offset walk instead of a string
    * scan (and unlike a rigid from_json schema, unknown keys survive).
    * The oracle reads the same field with DuckDB's JSON extraction — the
    * values must agree exactly whichever representation served them.
    */
  def qF14(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
      .orderBy(asc_nulls_first("k_mod"))

  /** Q-F15 — XML codec surface (Spark 4 ships the former spark-xml
    * datasource plus from_xml/to_xml in core): each supplier row is
    * rendered to an XML fragment with `to_xml` and parsed straight back
    * with an explicit schema, then aggregated per nation. The oracle
    * computes the same aggregate over the parquet rows directly, so any
    * fidelity loss in either codec direction (numeric formatting,
    * escaping, whitespace) breaks the hash. Scale shape: the codec is a
    * per-row projection inside the scan stage — the only shuffle is the
    * final small-key aggregate, identical to the plain query's.
    */
  def qF15(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField, LongType, IntegerType, DoubleType}
    val sch = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    Tables.supplier(s, d)
      .select(to_xml(struct(col("s_suppkey"), col("s_nationkey"),
        col("s_acctbal"))).as("x"))
      .select(from_xml(col("x"), sch).as("r"))
      .select(col("r.s_suppkey").as("s_suppkey"),
        col("r.s_nationkey").as("s_nationkey"),
        col("r.s_acctbal").as("s_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("s_suppkey")).as("key_sum"),
        dsum(col("s_acctbal")).as("bal_sum"))
      .orderBy("s_nationkey")
  }

  /** Q-F06 — conditional scalar functions: NULLIF / LEAST / GREATEST and a
    * two-branch IF, all codegen'd.
    */
  def qF06(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio_or_null"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored"),
        when(col("o_totalprice") > 150000, "big").otherwise("small").as("bucket"))
      .orderBy("o_orderkey")

  /** Q-F08 — date arithmetic: day offsets, day diffs, month adds. */
  def qF08(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_1999"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"))
      .orderBy("o_orderkey")

  /** Q-F10 — map functions: parse events.props into a MapType, explode
    * entries, aggregate per key (map_keys/map_values surface; generic over
    * whatever keys the JSON carries).
    */
  def qF10(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    Tables.events(s, d)
      .select(explode(from_json(col("props"), MapType(StringType, LongType))))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .orderBy("key")
  }

  /** Q-F05 — full outer join aggregated per nation key. */
  def qF05(s: SparkSession, d: String): DataFrame = {
    val su = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    su.join(c, su("s_nationkey") === c("c_nationkey"), "full")
      .select(coalesce(su("s_nationkey"), c("c_nationkey")).as("nationkey"),
        su("s_suppkey"), c("c_custkey"))
      .groupBy("nationkey")
      .agg(count(col("s_suppkey")).as("supp_rows"), count(col("c_custkey")).as("cust_rows"))
      .orderBy(asc_nulls_first("nationkey"))
  }

  /** Q-V02 — deeper array functions over embeddings: slice, reverse,
    * element sorting and distinct counting, with decimal-rounded values so
    * the float comparisons are engine-stable.
    */
  def qV02(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(slice(col("embedding"), 1, 8)).cast("long").as("slice_len"),
        round(element_at(reverse(col("embedding")), 1).cast("double"), 4).as("last_elem"),
        round(element_at(array_sort(col("embedding")), 1).cast("double"), 4).as("min_elem"),
        size(array_distinct(transform(col("embedding"),
          x => round(x.cast("double") * 10, 0)))).cast("long").as("coarse_distinct"))
      .orderBy("vec_id")

  /** Q-F09 — regexp functions: extract the numeric id from c_name
    * ('Customer#000000042') and count digit runs.
    */
  def qF09(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_id"),
        regexp_count(col("c_name"), lit("[0-9]+")).cast("long").as("digit_runs"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
      .orderBy("c_custkey")

  /** Q-V01 — array ops over the embeddings fixture (§2.C array row). */
  def qV01(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("label"),
        size(col("embedding")).cast("long").as("dim"),
        when(element_at(col("embedding"), 1) >= 0f, 1).otherwise(0).as("first_nonneg"))
      .groupBy("label", "dim")
      .agg(sum(col("first_nonneg")).as("nonneg_first"), count(lit(1)).as("cnt"))
      .orderBy("label", "dim")

  /** Q-A12 — correlation / stddev via exact decimal moment sums: the five
    * sums (Σx, Σy, Σxy, Σx², Σy²) accumulate in DECIMAL (associative,
    * partition-order-independent, one pass), and the statistics are then
    * derived in double from identical expressions on both engines — unlike
    * the built-in corr/stddev whose streaming-update floating point is
    * engine- and order-specific. This is also the 100 TB formulation: a
    * single partial+final aggregate, no second pass.
    */
  def qA12(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val x = col("l_quantity").cast(dec)
    val y = col("l_extendedprice").cast(dec)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(
        col("l_returnflag"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_qty_price"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
          (col("n") - 1)), 6).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Q-A17 — exact higher moments (population skewness / excess
    * kurtosis) per return flag, the profiler-grade distribution-shape
    * stats beyond q_a12's corr/stddev. l_quantity is integral (1..50),
    * so the four power sums are EXACT BIGINT arithmetic (q⁴ ≤ 6.25e6,
    * totals ≪ 2^53 — the long→double casts are exact too); the moment
    * formulas then run on bit-identical doubles in both engines. pow()
    * never appears — like ln() it is last-ulp non-portable — so m2^1.5
    * is spelled sqrt(m2)*m2 (sqrt is IEEE correctly-rounded, portable),
    * and the formula text is SHARED verbatim with the oracle SQL.
    */
  def qA17(s: SparkSession, d: String): DataFrame = {
    val q = col("l_quantity").cast("long")
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(q).cast("double").as("s1"),
        sum(q * q).cast("double").as("s2"),
        sum(q * q * q).cast("double").as("s3"),
        sum(q * q * q * q).cast("double").as("s4"))
      .select(col("l_returnflag"),
        expr(MomentFormulas.skewness).as("skew_qty"),
        expr(MomentFormulas.kurtosis).as("kurt_qty"))
      .orderBy("l_returnflag")
  }

  /** The q_a17 moment formulas — one string, used by BOTH the Spark
    * `expr` and the DuckDB oracle, so parenthesization (and therefore
    * every IEEE rounding step) cannot diverge between the engines.
    */
  object MomentFormulas {
    val skewness: String =
      "round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) / " +
        "(sqrt(s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))), 6)"
    val kurtosis: String =
      "round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - " +
        "3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / " +
        "((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6)"
  }

  /** Q-A13 — exact interpolated percentiles (median / p90): both engines
    * use the same p·(n−1) linear-interpolation definition, so exact
    * percentile is portable where streaming variance is not. The scale
    * twin is Q-A07's mergeable sketch; this is the oracle-checked form.
    */
  def qA13(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      // one array-percentile buffer per group, not one full-column buffer
      // per requested percentile (the q_a07 lesson)
      .agg(expr("percentile(o_totalprice, array(0.5D, 0.9D))").as("e"))
      .select(col("o_orderpriority"),
        round(col("e").getItem(0), 2).as("median_price"),
        round(col("e").getItem(1), 2).as("p90_price"))
      .orderBy("o_orderpriority")

  /** Q-J09 — TPC-H Q5 shape: 6-way join (3 broadcast dims), revenue of
    * lineitems sold by a supplier in the customer's nation, one region,
    * one order-date year. Date predicate reaches the orders scan pushed
    * down; nation/region/supplier broadcast.
    */
  def qJ09(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q-J10 — TPC-H Q10 shape: revenue lost to returned items per customer
    * in one quarter, top-20. Returnflag predicate pushed to the lineitem
    * scan; the final top-k is TakeOrderedAndProject.
    */
  def qJ10(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q-F11 — bitwise aggregates over the line numbers of each order. */
  def qF11(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(
        expr("bit_and(l_linenumber)").as("ln_and"),
        expr("bit_or(l_linenumber)").as("ln_or"),
        expr("bit_xor(l_linenumber)").as("ln_xor"))
      .orderBy("l_orderkey")

  /** Q-Q03 — correlated LATERAL subquery with per-row ORDER BY + LIMIT:
    * top-2 customers by balance per nation. Catalyst decorrelates the
    * lateral into a ranked window under the hood — the declarative SQL
    * spelling of the GroupTopK operator's semantics.
    */
  def qQ03(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, c_name""".stripMargin)
  }

  /** Q-Q04 — recursive CTE (Spark 4 WITH RECURSIVE): a month ladder over
    * the order-date domain, left-joined to per-month counts so empty
    * months surface as zeros. The recursion generates the 80-row spine on
    * the driver side of the plan — data-size-independent.
    */
  def qQ04(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT TIMESTAMP '1995-01-01 00:00:00'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < TIMESTAMP '2001-08-01 00:00:00'),
        |c AS (SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS cnt
        |      FROM orders GROUP BY date_trunc('month', o_orderdate))
        |SELECT months.m, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS cnt
        |FROM months LEFT JOIN c ON months.m = c.m
        |ORDER BY months.m""".stripMargin)
  }

  /** Q-A14 — UNPIVOT/melt: wide part metrics to long (column, value)
    * form — the inverse of Q-A10's pivot, via the native unpivot operator
    * (an Expand node: no shuffle, rows × metrics emitted inline).
    */
  def qA14(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), "metric", "value")
      .orderBy("p_partkey", "metric")

  /** Q-J11 — TPC-H Q7 shape: shipping volume between every
    * (supplier-nation, customer-nation) pair per year. Five-way join:
    * supplier and both nation lookups broadcast (the nations under
    * distinct aliases); the fact-side join (lineitem ⋈ orders ⋈
    * customer) shuffles on its keys once.
    */
  def qJ11(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).cast("long").as("l_year"))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .filter(col("l_year") === 1996)
      .orderBy("supp_nation", "cust_nation")
  }

  /** Q-J12 — TPC-H Q8 shape: one supplier nation's market share of PROMO
    * parts among one region's customers, per year. share = conditional
    * decimal sum / total decimal sum, one aggregate pass.
    */
  def qJ12(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val vol = col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec))
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("s_nationkey") === 7, vol).otherwise(lit(0).cast(dec)))
          .cast("double") /
        sum(vol).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q-A16 — TPC-H Q6 shape (corpus columns): single-scan forecasting
    * aggregate where EVERY predicate pushes to the parquet scan — the
    * canonical full-pushdown plan (no join, no shuffle beyond the 1-row
    * partial/final agg).
    */
  def qA16(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
        .cast("double").as("revenue"))
  }

  /** Q-Q06 — TPC-H Q4 shape (corpus columns): quarter's orders that have
    * at least one returned line — EXISTS planned as a left-semi join,
    * then the priority histogram.
    */
  def qQ06(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val returned = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q-Q05 — null-aware NOT IN subquery: customers with negative balance
    * form the exclusion set; Spark plans this as a null-aware anti join
    * (broadcast, since a single null in the subquery empties the result
    * by three-valued logic — semantics both engines share).
    */
  def qQ05(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Q-V03 — array set algebra over embedding-derived int lists
    * (floor on a double promotion: engine-identical, unlike float
    * round tie-breaking). Final columns are comma-joined STRINGS, not
    * arrays: the driver's oracle harness sorts result frames with
    * pandas, which cannot hash numpy arrays — every query's final
    * output must be scalar columns only.
    */
  def qV03(s: SparkSession, d: String): DataFrame = {
    def sig(start: Int) =
      expr(s"transform(slice(embedding, $start, 8), x -> CAST(floor(CAST(x AS DOUBLE) * 10) AS INT))")
    Tables.embeddings(s, d)
      .select(col("vec_id"), sig(1).as("sig"), sig(3).as("sig2"))
      .select(
        col("vec_id"),
        array_join(array_sort(array_union(col("sig"), col("sig2"))), ",").as("u"),
        array_join(array_sort(array_intersect(col("sig"), col("sig2"))), ",").as("i"),
        array_join(array_sort(array_except(col("sig"), col("sig2"))), ",").as("x"))
      .orderBy("vec_id")
  }

  /** Q-F13 — string shaping functions (pad/repeat/reverse/translate). */
  def qF13(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(
        col("n_nationkey"),
        lpad(col("n_name"), 20, ".").as("padded_l"),
        rpad(col("n_name"), 20, ".").as("padded_r"),
        reverse(col("n_name")).as("reversed"),
        translate(col("n_name"), "AEIOU", "aeiou").as("translated"),
        repeat(substring(col("n_name"), 1, 2), 3).as("repeated"))
      .orderBy("n_nationkey")

  /** Q-F12 — cryptographic hash functions (portable hex renderings). */
  def qF12(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("h_md5"),
        sha2(col("c_name").cast("binary"), 256).as("h_sha256"))
      .orderBy("c_custkey")

  /** Q-J15 — TPC-H Q14 shape (promo revenue share): one month of
    * lineitem broadcast-joined to part, a conditional/total decimal-sum
    * ratio in a single-row aggregate. The date range reaches the lineitem
    * scan as pushed filters; part broadcasts, so the only exchange is the
    * 1-row partial/final agg — the plan survives any fact-table scale.
    */
  def qJ15(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val vol = col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast(dec)))
          .cast("double") /
        sum(vol).cast("double"), 6).as("promo_revenue"))
  }

  /** Q-Q07 — TPC-H Q22 shape (dormant high-balance customers): the
    * global positive-balance average is a 1-row exact-decimal aggregate
    * (broadcast), "no recent orders" is a left-anti join against the
    * date-pruned orders scan, then a per-nation rollup. No correlated
    * re-scan of orders per customer — the anti join is one shuffle.
    */
  def qQ07(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val thr = c.filter(col("c_acctbal") > 0).agg(davg(col("c_acctbal")).as("thr"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Q-A19 — TPC-H Q13 shape (customer order-count distribution): left
    * join keeps order-less customers (their c_count is 0 — the bucket the
    * inner-join formulation silently drops), then a second aggregate over
    * the per-customer counts. Both shuffles key on grouping columns with
    * full map-side combine; the distribution output is bounded by the max
    * order count, not the customer count.
    */
  def qA19(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q-Q08 — TPC-H Q18 shape (large-volume orders): the HAVING subquery
    * is a pre-aggregated semi-side (order keys whose quantity sum clears
    * the threshold), joined back to orders+customer. The heavy aggregate
    * runs ONCE over lineitem with map-side combine; no correlated
    * re-scan per order.
    */
  def qQ08(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200.0)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q-Q09 — TPC-H Q2 shape: the min-cost supplier per part across a
    * 4-way dimension join (part ⋈ offers ⋈ supplier ⋈ nation ⋈ region,
    * region-restricted), with the classic correlated subquery `cost =
    * (SELECT MIN(cost) ... WHERE partkey = outer.partkey)`. The corpus
    * has no partsupp table, so lineitem stands in as the (part, supplier)
    * offer table with cost = the pair's minimum extended price.
    *
    * Scale-right decorrelation: the part filter and the region's
    * suppliers broadcast-prune the ONE lineitem scan, then a single
    * exchange on p_partkey feeds BOTH windows — the per-(part,supplier)
    * offer cost and the per-part best cost — because hash(p_partkey)
    * satisfies both partitionings (the qJ18 single-exchange discipline);
    * the DISTINCT down to offer rows reuses it too. The naive plan scans
    * and shuffles lineitem twice (offers + correlated min); this one
    * reads it once, and no per-part group ever materializes outside the
    * sorted window frames.
    */
  def qQ09(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_type") === "PROMO" && col("p_size") <= 15)
      .select("p_partkey", "p_name")
    val eligSupp = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val wOffer = Window.partitionBy("p_partkey", "s_suppkey")
    val wPart = Window.partitionBy("p_partkey")
    Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eligSupp), col("l_suppkey") === col("s_suppkey"))
      .select("p_partkey", "p_name", "s_suppkey", "s_acctbal", "s_name",
        "n_name", "l_extendedprice")
      .repartition(col("p_partkey"))
      .withColumn("cost", min(col("l_extendedprice")).over(wOffer))
      .withColumn("best", min(col("l_extendedprice")).over(wPart))
      .filter(col("cost") === col("best"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q-J16 — TPC-H Q17 shape (small-quantity revenue, one brand): the
    * correlated `avg quantity per part` subquery becomes a window over
    * the brand-pruned join result — ONE scan of the fact table (the
    * two-aggregate decorrelation scans it twice: the brand predicate
    * lives on part, so nothing prunes the lineitem scans themselves),
    * and the only exchange is the post-join subset (one brand ≈ 1/25 of
    * rows) hashed by part key.
    */
  def qJ16(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
      .select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .withColumn("aq",
        sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** Q-J17 — TPC-H Q15 shape (top supplier by quarterly revenue): the
    * revenue table aggregates once; its 1-row max broadcasts back as the
    * selection predicate (exact-decimal revenue makes the equality safe);
    * supplier attaches by broadcast. Returns every tied winner.
    */
  def qJ17(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q-J18 — TPC-H Q21 shape (waiting suppliers, Q21's multi-existential
    * join pattern on this corpus's columns: "late" = a returned line,
    * l_returnflag = 'R', since the synthetic lineitem has no
    * receipt/commit dates): the two correlated existentials (EXISTS
    * another supplier on the order / NOT EXISTS another LATE supplier)
    * become per-order supplier counts over ONE scan of the fact table.
    * lineitem reduces to one row per (order, supplier) with its
    * late-line count — map-side combined — then a window over
    * l_orderkey derives n_supp (distinct suppliers on the order) and
    * n_late_supp (distinct LATE suppliers); a qualifying row is a late
    * supplier on a multi-supplier order where it is the only late one.
    * The naive decorrelation scans lineitem three times (l1/l2/l3 — no
    * predicate prunes any of them); this plan scans once and every
    * later exchange moves only the ~4×-smaller per-(order, supplier)
    * table. Orders (status filter) joins on the same orderkey hash;
    * supplier⋈nation broadcasts.
    */
  def qJ18(s: SparkSession, d: String): DataFrame = {
    val perSupp = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_returnflag") === "R").cast("int").as("late"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(col("late")).as("late_lines"))
    val w = Window.partitionBy("l_orderkey")
    val flagged = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum((col("late_lines") > 0).cast("int")).over(w))
      .filter(col("late_lines") > 0 && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
    val sn = Tables.supplier(s, d)
      .join(Tables.nation(s, d).filter(col("n_name") === "NATION_5"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    flagged
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q-J19 — TPC-H Q9 shape (product-type profit by nation and year):
    * lineitem filtered to a part-name pattern, joined to part, supplier,
    * orders, and nation, revenue rolled up per (nation, order year). The
    * corpus has no partsupp/ps_supplycost, so profit reduces to the
    * discounted-revenue term — the join topology and rollup are Q9's.
    * Scale: the pattern-filtered part side broadcasts (it prunes the fact
    * scan via the join), supplier⋈nation broadcasts; orders is the only
    * fact-sized join, shuffled on the orderkey both sides already carry.
    * Revenue is the exact-decimal dsumProd fold (order-independent).
    */
  def qJ19(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_name").like("%anvil%"))
      .select("p_partkey")
    val sn = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** Q-J20 — TPC-H Q19 shape (disjunctive-predicate revenue): an OR of
    * three (brand, size range, quantity range) conjunctions across the
    * lineitem⋈part join. The per-table halves of the disjunction
    * (quantity bounds on lineitem, brand/size on part) are pushed below
    * the join by Catalyst as an OR-filter on each side — the scans read
    * only candidate rows — and the full triple predicate re-applies on
    * the joined row; part broadcasts. One scan each side, no shuffle.
    */
  def qJ20(s: SparkSession, d: String): DataFrame = {
    def triple(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity") >= qLo && col("l_quantity") <= qHi
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(triple("Brand#12", 5, 1, 11) ||
        triple("Brand#23", 10, 10, 20) ||
        triple("Brand#34", 15, 20, 30))
      .agg(dsumProd(col("l_extendedprice"), lit(1) - col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q-J21 — TPC-H Q12 shape (shipping-delay priority buckets): lines
    * shipped more than 60 days after their order date, counted per line
    * status with the CASE-bucketed urgent/non-urgent split Q12 applies to
    * ship modes (the corpus has no shipmode/commit/receipt columns; the
    * late predicate uses shipdate − orderdate and the rollup keys on
    * l_linestatus). One fact-sized orderkey shuffle joins the two tables;
    * the CASE aggregates are a plain partial+final hash agg.
    */
  def qJ21(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 days"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")

  /** Q-Q10 — TPC-H Q20 shape (excess-volume suppliers of a part family,
    * region-scoped): the nested IN subquery — suppliers whose shipped
    * quantity of 'blue%' parts exceeds a threshold — pre-aggregates ONCE
    * over the part-pruned fact scan (the Q20 discipline every engine
    * wants: never re-derive the per-supplier volume per outer row) and
    * attaches to the nation-filtered supplier dim as a LEFT SEMI join.
    * The volume compare runs on the exact DECIMAL sum, so the threshold
    * set is bit-deterministic across engines and partition orders.
    */
  def qQ10(s: SparkSession, d: String): DataFrame = {
    val blueParts = Tables.part(s, d)
      .filter(col("p_name").like("blue%")).select("p_partkey")
    val bigShippers = Tables.lineitem(s, d)
      .join(broadcast(blueParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
      .filter(col("qty") > 300)
      .select("l_suppkey")
    Tables.supplier(s, d)
      .join(Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_5", "NATION_8", "NATION_13")),
        col("s_nationkey") === col("n_nationkey"))
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** Q-Q11 — TPC-H Q11 shape (important stock: per-part value vs a
    * global-share threshold from a scalar subquery): part values within
    * one region's suppliers aggregate ONCE (exact DECIMAL sums), the
    * corpus-total value reduces to a 1-row broadcast, and the HAVING
    * `value > total × fraction` runs as `value × 1000 > total` — an
    * EXACT decimal comparison with no fractional literal, so the
    * membership set is bit-deterministic in both engines (the qJ17
    * scalar-broadcast discipline). lineitem extended price stands in for
    * partsupp supplycost×availqty; the aggregate-vs-global-share shape
    * is Q11's.
    */
  def qQ11(s: SparkSession, d: String): DataFrame = {
    val regionSupp = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val v = Tables.lineitem(s, d)
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("value"))
    val total = v.agg(sum(col("value")).as("total"))
    v.crossJoin(broadcast(total))
      .filter(col("value") * 1000 > col("total"))
      .select(col("partkey"), col("value").cast("double").as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  /** Q-A21 — TPC-H Q16 shape (supplier-count rollup with an exclusion
    * list): distinct suppliers per (brand, type, size) over the filtered
    * part attributes, excluding a NOT IN supplier set. lineitem's
    * (partkey, suppkey) pairs stand in for partsupp. The exclusion list
    * is a broadcast LEFT ANTI join (s_suppkey is non-null, so the
    * null-aware NOT IN machinery — q_q05's trap — isn't needed); the
    * attribute-filtered part side broadcasts and prunes the fact scan;
    * the distinct count is the standard two-level aggregate (dedup on
    * the full key, then count) — both levels map-side combined on one
    * exchange.
    */
  def qA21(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#45" &&
        !col("p_type").like("PROMO%") &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 1000).select("s_suppkey")
    Tables.lineitem(s, d)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q-A18 — per-group z-score outliers, two-pass: pass 1 reduces orders
    * to a per-priority (Σx, Σx², n) triple via exact DECIMAL sums (order-
    * independent, so μ/σ are bit-deterministic across partition orders and
    * engines — stddev_samp over raw doubles would not be), pass 2
    * broadcast-joins the 5-row stats table back and filters |z| > 1.5
    * (the corpus totalprice is near-uniform, so max |z| ≈ √3 — a 2σ+
    * threshold would select nothing at any scale factor).
    * The stats side never grows with the fact table, so both passes are
    * single fact-scan + tiny exchange at any scale.
    */
  def qA18(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val o = Tables.orders(s, d)
    val stats = o.groupBy("o_orderpriority")
      .agg(
        sum(col("o_totalprice").cast(dec)).as("sx"),
        sum(col("o_totalprice").cast(dec) * col("o_totalprice").cast(dec)).as("sxx"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        (col("sx").cast("double") / col("n")).as("mu"),
        sqrt((col("sxx").cast("double") - col("sx").cast("double") *
          col("sx").cast("double") / col("n")) / (col("n") - 1)).as("sigma"))
    o.join(broadcast(stats), "o_orderpriority")
      .withColumn("z", (col("o_totalprice") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > 1.5)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        round(col("z"), 4).as("z"))
      .orderBy("o_orderkey")
  }
}
