package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data profiling: the reference introspects only schemas
  * (/root/reference/Program.cs:160-186); a migration/pipeline tool at scale
  * also needs per-column data statistics (for partition-bound discovery —
  * cf. the identity-range partitioned reads in io.Readers — validation
  * after a clone, and skew diagnosis before a join). One pass over the
  * table computes every column's profile in a single aggregate row, then
  * unpivots to one row per column — no per-column scans.
  *
  * The distinct-count sketch lives in a SEPARATE pass: each
  * approx_count_distinct carries an HLL register buffer (dozens of
  * aggregation-buffer words per column), and folding all of them into the
  * same aggregate as the cheap min/max/mean stats multiplies the combined
  * buffer width by the column count — generated-code size and per-row
  * buffer cost both blow up. Splitting keeps the deterministic pass's
  * buffer to ~4 words per column. Within the deterministic pass, string
  * columns aggregate in their own arm (min/max over STRING needs
  * var-length buffer slots the UnsafeRow hash-agg buffer can't hold, and
  * one such slot demotes the whole aggregate to SortAggregate) so the
  * numeric/timestamp arm stays a codegen HashAggregate — see
  * profileDeterministic.
  */
object Profiler {

  /** Rendering used for min/max so the result is engine-portable:
    * numerics via DECIMAL(38,2) (exact, no double-formatting drift; full
    * precision so bigint surrogate keys or >1e16 doubles don't overflow to
    * null — 2-decimal rendering is the profile's contract, so sub-0.01
    * magnitudes round to 0.00 by design), everything else via a plain
    * string cast.
    */
  private def asPortableString(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DecimalType(38, 2)).cast("string")
    case _ => c.cast("string")
  }

  /** Deterministic per-column stats: nulls, min/max (portable strings),
    * mean. Mean is an exact decimal sum divided once in double — identical
    * across engines regardless of row order (no float-sum reassociation).
    */
  def profileDeterministic(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    // typed min/max in the aggregate, portable rendering in the projection
    def aggsOf(fs: Seq[StructField], withCount: Boolean) = {
      val per = fs.flatMap { f =>
        val c = col(f.name)
        val isNum = f.dataType.isInstanceOf[NumericType]
        Seq(
          count(c).cast("long").as(s"${f.name}__nonnull"),
          min(c).as(s"${f.name}__minv"),
          max(c).as(s"${f.name}__maxv"),
          (if (isNum)
             sum(c.cast(DecimalType(38, 2))).cast("double") / count(c)
           else lit(null).cast("double")).as(s"${f.name}__mean"))
      }
      if (withCount) count(lit(1)).cast("long").as("__rows") +: per else per
    }
    // Split the single aggregate by buffer width: ONE var-length (string)
    // buffer slot forces the whole aggregate into SortAggregate, dragging
    // every decimal sum out of the codegen hash path. Fixed-width columns
    // (numerics, timestamps, dates, booleans) aggregate in a codegen
    // HashAggregate arm; string columns in a small SortAggregate arm; the
    // two 1-row results cross-join in the same job, and each parquet scan
    // arm prunes to its own column set, so total I/O equals one full scan
    // (measured: 2.5 s -> 1.9 s on the 11-column lineitem profile).
    val (varLen, fixed) = cols.partition(_.dataType == StringType)
    val row =
      if (varLen.isEmpty || fixed.isEmpty) {
        val a = aggsOf(cols, withCount = true)
        df.agg(a.head, a.tail: _*)
      } else {
        val fa = aggsOf(fixed, withCount = true)
        val va = aggsOf(varLen, withCount = false)
        df.agg(fa.head, fa.tail: _*)
          .crossJoin(df.agg(va.head, va.tail: _*))
      }
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.catalogString).as("data_type"),
        (col("__rows") - col(s"${f.name}__nonnull")).as("null_count"),
        asPortableString(col(s"${f.name}__minv"), f.dataType).as("min_value"),
        asPortableString(col(s"${f.name}__maxv"), f.dataType).as("max_value"),
        col(s"${f.name}__mean").as("mean"))
    }
    row.select(col("__rows").as("row_count"), explode(array(entries: _*)).as("p"))
      .select(col("row_count"), col("p.*"))
      .orderBy("column")
  }

  /** Full profile including the approx-distinct sketch (`rsd` relative
    * error; 0.1 keeps HLL buffers small — tighten only when needed).
    */
  def profile(df: DataFrame, rsd: Double = 0.1): DataFrame = {
    val det = profileDeterministic(df)
    val cols = df.schema.fields.toSeq
    val aggs = cols.map(f =>
      approx_count_distinct(col(f.name), rsd).cast("long").as(f.name))
    val sketchRow = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { f =>
      struct(lit(f.name).as("column"), col(f.name).as("approx_distinct"))
    }
    val sketch = sketchRow
      .select(explode(array(entries: _*)).as("p")).select(col("p.*"))
    det.join(broadcast(sketch), Seq("column"))
      .orderBy("column")
  }

  /** Per-column sketch-accuracy check: Datasketches HLL estimate within
    * `tol` of a near-exact distinct count, all columns in ONE scan.
    *
    * Shape: stack the N columns to (column_id, xxhash64(value)) pairs —
    * int ids and 8-byte hashes keep the generate and the hash-agg key
    * narrow (string-casting values instead measured 2.2× slower) — dedupe
    * the pairs with a plain codegen hash aggregate (map-side partial
    * dedupes before the shuffle), THEN count and sketch the deduped
    * hashes grouped by column id. The reference count is 64-bit-hash
    * distinct, not literally exact: expected collisions for n distinct
    * values are n²/2^65 (≈3 rows at n=10^10), orders of magnitude inside
    * `tol` at any scale this runs at. NULLs map to NULL (not
    * xxhash64's seed) so they stay excluded, matching countDistinct.
    * The sketch runs over the deduped hash set (HLL re-hashes its input,
    * so estimating on hashes is the same estimator) and its
    * ObjectHashAggregate sees N groups — putting hll_sketch_agg in the
    * same aggregate as a countDistinct would plant it at the pair level
    * and allocate a sketch per pair (measured 3× slower than even the
    * per-column union this replaces).
    *
    * Why not the previous shape (per-column pruned scans unioned)? On
    * columnar storage its total I/O is the same as one full scan, but it
    * pays N aggregate subplans of Janino compile (~3 s here) and N stage
    * groups of scheduling; this shape is one scan, one narrow shuffle of
    * per-partition-unique pairs, one codegen unit — and 100 TB-safe: the
    * shuffle carries Σ per-column distincts, not rows.
    */
  def distinctBounds(df: DataFrame, lgK: Int = 12, tol: Double = 0.15): DataFrame = {
    val cols = df.schema.fields.toSeq
    // generic-input hardening: the stack() expression splices identifiers
    // into SQL text, so embedded backticks must be doubled or a hostile
    // column name breaks the parse; the cid→name mapping is built with the
    // Column API (no string splicing, no quote escaping to get wrong)
    val stackArgs = cols.zipWithIndex
      .map { case (f, i) =>
        val id = "`" + f.name.replace("`", "``") + "`"
        s"$i, IF($id IS NULL, NULL, xxhash64($id))"
      }
      .mkString(", ")
    val colName = cols.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (f, i)) => when(col("cid") === i, lit(f.name)).otherwise(acc)
    }
    df.selectExpr(s"stack(${cols.length}, $stackArgs) AS (cid, h)")
      .groupBy("cid", "h").agg(lit(1).as("__one"))
      .groupBy("cid")
      .agg(
        count(col("h")).as("exact_distinct"),
        coalesce(hll_sketch_estimate(hll_sketch_agg(col("h"), lit(lgK))), lit(0L))
          .as("approx"))
      .select(colName.as("column"),
        (abs(col("approx") - col("exact_distinct")) <=
          col("exact_distinct") * tol).as("within_bound"))
      .orderBy("column")
  }

  /** Q-M02 — deterministic profile of the lineitem table (DuckDB-oracle
    * hash-matched: every stat is engine-portable by construction).
    */
  def qM02(s: SparkSession, d: String): DataFrame =
    profileDeterministic(Tables.lineitem(s, d))

  /** Q-M03 — HLL distinct-count sketch accuracy vs exact, per column. */
  def qM03(s: SparkSession, d: String): DataFrame =
    distinctBounds(Tables.lineitem(s, d))

  /** Q-M06 — equi-width histogram of a numeric column: the distribution
    * profile q_m02's min/max/mean can't show. Two passes — a 2-value
    * min/max broadcast, then bucket counts (`least` pins x = max into
    * the last bucket). Every bucket index is floor of the SAME double
    * expression in both engines (shared parenthesization, no
    * transcendental fns), so the histogram is exact, not approximate.
    */
  def qM06(s: SparkSession, d: String, buckets: Int = 20): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
    val mm = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    li.crossJoin(broadcast(mm))
      .select(expr(s"least(CAST(floor((x - mn) * $buckets / (mx - mn)) AS BIGINT), ${buckets - 1})")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** The corpus's foreign-key relationships, as (child table, fk column,
    * parent table, parent key).
    */
  val corpusFks: Seq[(String, String, String, String)] = Seq(
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"))

  /** Q-M05 — referential-integrity audit: orphan counts per FK edge, the
    * post-load validation a cloner runs before enabling constraints (the
    * reference applies FK DDL blind and lets the ALTER fail;
    * /root/reference/Program.cs:443-471 renders them WITH NOCHECK).
    *
    * Shape: per FK edge, ONE column-pruned pass — a left join of child
    * keys against the (unique, PK-backed) parent keys counts total and
    * unmatched rows in the same aggregate (a NULL fk never equals
    * anything so it counts as an orphan — matching NOT EXISTS semantics
    * in the oracle). Each edge is an independent job arm of one union;
    * the parent side broadcasts when dimension-sized.
    */
  def qM05(s: SparkSession, d: String): DataFrame = {
    val arms = corpusFks.map { case (ct, ck, pt, pk) =>
      val child = Tables.table(s, d, ct).select(col(ck))
      // parent keys are the PK side, so the left join cannot fan out and
      // count(*) post-join still equals the child row count
      val parent = Tables.table(s, d, pt).select(col(pk))
      child.join(parent, col(ck) === col(pk), "left")
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col(pk).isNull, 1L).otherwise(0L)).as("orphan_rows"))
        .select(lit(ct).as("child_table"), lit(ck).as("fk_col"),
          col("child_rows"), col("orphan_rows"))
    }
    arms.reduce(_ unionByName _).orderBy("child_table", "fk_col")
  }

  // ------------------------------------------------- clone reconciliation

  /** Column spec per checksummed table: (name, isNumeric). Numerics are
    * canonicalized through DECIMAL(38,2) strings (the [[asPortableString]]
    * discipline — double→string rendering is NOT engine-portable, decimal
    * strings are); the q_m07/q_m08 oracle SQL is GENERATED from this same
    * list, so the two sides cannot drift.
    */
  val checksumTables: Seq[(String, Seq[(String, Boolean)])] = Seq(
    "region" -> Seq("r_regionkey" -> true, "r_name" -> false),
    "nation" -> Seq("n_nationkey" -> true, "n_name" -> false,
      "n_regionkey" -> true),
    "supplier" -> Seq("s_suppkey" -> true, "s_name" -> false,
      "s_nationkey" -> true, "s_acctbal" -> true),
    "customer" -> Seq("c_custkey" -> true, "c_name" -> false,
      "c_nationkey" -> true, "c_acctbal" -> true, "c_mktsegment" -> false),
    "part" -> Seq("p_partkey" -> true, "p_name" -> false, "p_brand" -> false,
      "p_type" -> false, "p_size" -> true, "p_retailprice" -> true),
    "orders" -> Seq("o_orderkey" -> true, "o_custkey" -> true,
      "o_orderstatus" -> false, "o_totalprice" -> true,
      "o_orderdate" -> false, "o_orderpriority" -> false))

  /** Canonical '|'-joined row rendering, engine-portable (see
    * [[checksumTables]]); the row fingerprint is the portable poly hash of
    * this string.
    */
  def canonicalRow(cols: Seq[(String, Boolean)]): Column =
    concat_ws("|", cols.map { case (c, num) =>
      if (num) col(c).cast(DecimalType(38, 2)).cast("string")
      else col(c).cast("string")
    }: _*)

  /** Order-independent table content checksum: SUM of per-row portable
    * poly-hash fingerprints (each < 10⁹, so the BIGINT sum is exact to
    * ~9·10⁹ rows) plus the row count. The clone-fidelity primitive the
    * reference lacks entirely: source and target compute one narrow
    * aggregate each — no row shipping, no sort — and equal (row_cnt,
    * checksum) pairs certify the copy. Per-table arms are independent
    * jobs of one union, exactly like qM05's FK audit.
    */
  def qM08(s: SparkSession, d: String): DataFrame =
    checksumTables.map { case (t, cols) =>
      Tables.table(s, d, t)
        .select(graft.functions.PolyHash(canonicalRow(cols)).as("h"))
        .agg(count(lit(1)).as("row_cnt"), sum(col("h")).as("checksum"))
        .select(lit(t).as("table_name"), col("row_cnt"), col("checksum"))
    }.reduce(_ unionByName _).orderBy("table_name")

  /** Q-M09 — CDC chunk-store round trip, the write side q_l42/q_l43 only
    * measure: build the unique-chunk store + per-doc manifest
    * ([[graft.io.ChunkStore]]), re-materialize every document from it,
    * and emit (row_cnt, checksum) of the REBUILT corpus plus the store's
    * distinct-(h, len) chunk count. The oracle computes the same checksum
    * from the ORIGINAL documents and the same chunk count from its own
    * CDC derivation — so a single lost, duplicated, reordered or
    * corrupted chunk anywhere in write→store→join→reassemble shows up as
    * a checksum mismatch. Same certification shape as qM08, pointed at
    * the chunk store instead of the cloned tables.
    */
  def qM09(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkstore").toString
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
    graft.io.ChunkStore.write(docs, dir)
    val rebuilt = graft.io.ChunkStore.materialize(s, dir)
    val canon = concat(col("doc_id").cast("string"), lit("|"), col("text"))
    // (h, len)-keyed count for oracle parity — the store itself is keyed
    // (h, len, x) but x (xxhash64) is not engine-portable
    val stats = graft.io.ChunkStore.manifest(s, dir)
      .agg(countDistinct(col("h"), col("len")).as("store_chunks"))
    rebuilt.select(graft.functions.PolyHash(canon).as("ph"))
      .agg(count(lit(1)).as("row_cnt"), sum(col("ph")).as("checksum"))
      .crossJoin(stats)
      .select("row_cnt", "checksum", "store_chunks")
  }

  /** Distributed table diff: key + row-fingerprint projections of both
    * sides, one full-outer join on the key, and a four-way classification
    * aggregate (only-source / only-target / changed / identical). Rows
    * never ship — only (key, 8-byte fingerprint) pairs cross the shuffle,
    * so the diff costs one narrow exchange per side at any table width.
    * This is the incremental-sync planning primitive: only_source drives
    * deletes, only_target inserts, changed updates.
    */
  def tableDiff(src: DataFrame, tgt: DataFrame, key: String,
      cols: Seq[(String, Boolean)]): DataFrame = {
    def fp(df: DataFrame, as: String) =
      df.select(col(key).as("k"),
        graft.functions.PolyHash(canonicalRow(cols)).as(as))
    fp(src, "fp_s").join(fp(tgt, "fp_t"), Seq("k"), "full_outer")
      .agg(
        sum(when(col("fp_t").isNull, 1L).otherwise(0L)).as("only_source"),
        sum(when(col("fp_s").isNull, 1L).otherwise(0L)).as("only_target"),
        sum(when(col("fp_s").isNotNull && col("fp_t").isNotNull &&
          col("fp_s") =!= col("fp_t"), 1L).otherwise(0L)).as("changed"),
        sum(when(col("fp_s") === col("fp_t"), 1L).otherwise(0L))
          .as("identical"))
  }

  /** Q-A20 — bucketed two-sample Kolmogorov–Smirnov drift statistic
    * between two order-priority totalprice distributions (the
    * train/serve-skew detector a production pipeline runs between
    * yesterday's and today's feature distributions). One pass buckets
    * both samples over the combined min/max (qM06's shared-bucket
    * discipline, so both engines bucket identically); the CDF compare
    * then runs on `buckets` rows — a window over 20 rows, nowhere near
    * the fact table. All arithmetic is integer counts divided once in
    * double, so the statistic is bit-deterministic.
    */
  def qA20(s: SparkSession, d: String, buckets: Int = 20): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("p"), col("o_totalprice").as("x"))
    val mm = o.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val counts = o.crossJoin(broadcast(mm))
      .select(col("p"),
        expr(s"least(CAST(floor((x - mn) * $buckets / (mx - mn)) AS BIGINT), ${buckets - 1})")
          .as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("p") === "1-URGENT", 1L).otherwise(0L)).as("ca"),
        sum(when(col("p") === "5-LOW", 1L).otherwise(0L)).as("cb"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // totals come from a full-frame window over the SAME 20 bucket rows —
    // re-aggregating the counts subtree for them would scan and shuffle
    // the fact table a second time
    counts
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("cum_a").cast("double") / col("na") -
          col("cum_b").cast("double") / col("nb"))).as("ks_stat"))
  }

  /** Q-M07 — diff of two deterministic views of `orders` simulating clone
    * drift: the source drops every 101st key, the target drops every 97th
    * and perturbs totalprice on every 89th — both sides of the oracle
    * derive the same views, so the classification counts are exact.
    */
  def qM07(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cols = checksumTables.toMap.apply("orders")
    val src = o.filter(col("o_orderkey") % 101 =!= 0)
    val tgt = o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    tableDiff(src, tgt, "o_orderkey", cols)
  }
}
