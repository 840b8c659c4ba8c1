package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-schema drift guard (VERDICT r9 item #3). The driver regenerates
  * `/root/testdata` between rounds and has already shipped `events.ts` as
  * parquet TIMESTAMP(NANOS) (rounds ≤8) and TIMESTAMP_MICROS(
  * isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ (round 9, which broke six
  * queries at analysis time). This spec pins all three known physical
  * shapes through ONE helper — `Tables.normalizeEventsTs` — and asserts
  * identical query output, so the next drift breaks one helper with a loud
  * message instead of six queries and CI.
  *
  * The NANOS variant is represented as a raw INT64 parquet column: Spark
  * cannot WRITE ns parquet, but a real TIMESTAMP(NANOS) file read under
  * `spark.sql.legacy.parquet.nanosAsLong` surfaces exactly the same way —
  * a LongType column of epoch-nanos — so the normalization path exercised
  * here is byte-identical to the legacy corpus path.
  */
class TablesDriftSpec extends AnyFunSuite with SparkFixture {

  /** Reference slice of the live corpus, already normalized. */
  private lazy val reference = Tables.events(spark, sfDir)
    .orderBy("event_id").limit(300).cache()

  /** A downstream shape representative of the six queries the r9 drift
    * broke: unix_micros + hourly bucketing + aggregation.
    */
  private def probe(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
    df.withColumn("ts_us", unix_micros(col("ts")))
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("ts_us").as("sum_us"))
      .select(unix_micros(col("hr")), col("event_type"), col("cnt"), col("sum_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

  private def roundTrip(df: org.apache.spark.sql.DataFrame, tag: String): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-drift-$tag")
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    Tables.normalizeEventsTs(spark.read.parquet(dir.toString))
  }

  test("the three known events.ts physical variants normalize to identical output") {
    val expected = probe(reference)
    assert(expected.nonEmpty)

    // variant 1: µs UTC instant (TIMESTAMP_MICROS, isAdjustedToUTC=true)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val utc = roundTrip(reference, "utc")
    assert(utc.schema("ts").dataType == TimestampType)
    assert(probe(utc) == expected)

    // variant 2: µs naive (TIMESTAMP_MICROS, isAdjustedToUTC=false → NTZ),
    // the round-9 corpus shape that broke unix_micros call sites
    val ntz = roundTrip(
      reference.withColumn("ts", col("ts").cast(TimestampNTZType)), "ntz")
    assert(ntz.schema("ts").dataType == TimestampType,
      "NTZ must be normalized to TimestampType (UTC session ⇒ value-preserving)")
    assert(probe(ntz) == expected)

    // variant 3: legacy ns corpus as surfaced under nanosAsLong (LongType
    // epoch-nanos; see class doc for why we don't need a real ns file)
    val ns = roundTrip(
      reference.withColumn("ts", unix_micros(col("ts")) * lit(1000L)), "ns")
    assert(ns.schema("ts").dataType == TimestampType)
    assert(probe(ns) == expected)
  }

  test("an unknown ts type fails loudly in the one shared helper") {
    val bad = reference.withColumn("ts", col("ts").cast(StringType))
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(bad))
    assert(e.getMessage.contains("events.ts drifted"))
  }

  test("every corpus table loads with its contracted columns present") {
    // cheap per-table guard: FIXTURES.md column names must all resolve —
    // a renamed/dropped column fails here with the table named, not in
    // whichever of the 149 queries happens to touch it first
    val contract = Map(
      "region"     -> Seq("r_regionkey", "r_name"),
      "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
      "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey"),
      "part"       -> Seq("p_partkey", "p_name", "p_type"),
      "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
      "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_quantity", "l_shipdate"),
      "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value"),
      "documents"  -> Seq("doc_id", "text", "lang", "source"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val missing = contract.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val have = Tables.table(spark, sfDir, name).columns.toSet
      cols.filterNot(have).map(c => s"$name.$c")
    }
    assert(missing.isEmpty, s"corpus drift — missing columns: ${missing.mkString(", ")}")
    // and events.ts must be a µs TimestampType after normalization
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }
}
