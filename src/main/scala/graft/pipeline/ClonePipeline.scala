package graft.pipeline

import graft.Tables
import graft.ddl.DdlRenderer
import graft.io.Writers
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Clone orchestration — the reference's `CloneDatabase`
  * (/root/reference/Program.cs:56-112) re-architected for Spark.
  *
  * The reference runs nine sequential phases single-threaded, fully
  * materializing each table in driver memory. Here:
  *   - DDL is rendered from schema metadata (pure, driver-side, tiny);
  *   - data movement is N independent distributed jobs, submitted
  *     concurrently (the per-table loop at Program.cs:76-79 is
  *     embarrassingly parallel — each table is its own Spark job, and the
  *     scheduler interleaves their tasks across the cluster);
  *   - load-then-constrain ordering is preserved: constraint/index scripts
  *     are returned for application *after* the data phase, matching
  *     Program.cs:74-110.
  *
  * The target here is a directory of parquet tables (the corpus-native
  * sink); a JDBC target plugs in through graft.io.Writers.jdbc +
  * graft.io.ScriptExecutor for the DDL.
  */
object ClonePipeline {

  final case class CloneReport(
      tables: Seq[String],
      rowCounts: Map[String, Long],
      ddl: Map[String, String])

  /** Render the full pre-data DDL script for the corpus (A8+A9 phases). */
  def renderDdl(spark: SparkSession, srcDir: String,
      tables: Seq[String] = Tables.names, schema: String = "dbo"): Map[String, String] =
    tables.map { t =>
      t -> DdlRenderer.createTableFromStruct(schema, t,
        Tables.table(spark, srcDir, t).schema)
    }.toMap

  /** Clone every table from srcDir to tgtDir, tables in parallel
    * (excludeSchemas mirrors the reference's dead schema filter,
    * Program.cs:155-157, as a real config).
    */
  def clone(spark: SparkSession, srcDir: String, tgtDir: String,
      tables: Seq[String] = Tables.names,
      excludeTables: Set[String] = Set.empty,
      parallelism: Int = 4): CloneReport = {
    val work = tables.filterNot(excludeTables)
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = work.map { t =>
        Future {
          val df = Tables.table(spark, srcDir, t)
          // empty-table short circuit (Program.cs:612-616) is a no-op for
          // parquet writes, so we just write; count is read from the
          // written files' footers (no second scan of the source).
          Writers.parquet(df, s"$tgtDir/$t.parquet")
          t -> spark.read.parquet(s"$tgtDir/$t.parquet").count()
        }
      }
      val counts = Await.result(Future.sequence(futures), Duration.Inf).toMap
      CloneReport(work, counts, renderDdl(spark, srcDir, work))
    } finally pool.shutdown()
  }

  /** Q-M01 — the clone-surface metadata query: corpus schemas rendered as
    * idempotent DDL, one row per (table, ddl). Verified structurally
    * (rows-only) — DDL text has no DuckDB oracle.
    */
  def qM01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    renderDdl(spark, dir).toSeq.toDF("table_name", "ddl").orderBy("table_name")
  }
}
