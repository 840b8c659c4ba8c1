package graft.io

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** File-level data skipping from parquet footer statistics — the read-side
  * payoff of the clustered layouts ([[Writers.rangeClustered]],
  * [[Writers.zOrdered]]) and the lakehouse primitive the reference's
  * clustered-index DDL (Program.cs:611-668) maps to on object storage:
  * a table's per-file (min, max, rows) manifest, built WITHOUT scanning
  * data pages, that a planner consults to hand Spark only the files a
  * range predicate can touch.
  *
  * Spark's own parquet reader already skips ROW GROUPS inside each file
  * it opens (pushed filters vs row-group stats), but it still lists,
  * opens and footer-reads every file of the table per query. At 100 TB /
  * ~800k files that is the dominant planning cost on S3 — the reason
  * Delta/Iceberg keep exactly this manifest next to the data. Build once
  * per write (footer reads only, distributed — one task per file batch),
  * persist it wherever tables live, prune file lists manifest-side.
  *
  * Columns are restricted to integral types (parquet INT32/INT64 — keys,
  * epoch timestamps, z-values): min/max comparison semantics for
  * truncated binary stats are subtle (PARQUET-1685) and not needed for
  * the clustering keys this serves.
  */
object StatsManifest {

  private def manifestSchema(cols: Seq[String]): StructType =
    StructType(
      StructField("file", StringType, nullable = false) +:
      StructField("rows", LongType, nullable = false) +:
      cols.flatMap(c => Seq(
        StructField(s"min_$c", LongType, nullable = true),
        StructField(s"max_$c", LongType, nullable = true))))

  /** Per-file (min, max) of each of `cols` plus row count, from parquet
    * FOOTERS only — no data pages are read. Footer reads are distributed
    * (one Spark task per slice of the file list); only the file PATHS and
    * the finished manifest rows (one per file) ever sit on the driver.
    * A column chunk with no usable statistics yields NULL min/max — the
    * pruner then keeps the file (skipping is an optimization, never a
    * correctness bet).
    */
  def build(s: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    buildForFiles(s, listParquet(s, dir), cols)

  /** The parquet files under `dir` (recursive), via the path's own
    * `FileSystem` — listing only, no footers touched.
    */
  def listParquet(s: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, /* recursive = */ true)
    val paths = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) paths += f.getPath.toString
    }
    paths.result()
  }

  private def buildForFiles(s: SparkSession, paths: Seq[String],
      cols: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    // Configuration is not serializable; ship its entries and rebuild per
    // executor so scheme-specific settings (S3 endpoints/credential
    // providers) survive the trip
    val confEntries = s.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toVector
    val colsLocal = cols
    val rows = s.sparkContext.parallelize(paths, 32).mapPartitions { files =>
      val c = new org.apache.hadoop.conf.Configuration(false)
      confEntries.foreach { case (k, v) => c.set(k, v) }
      files.map { file =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(file), c)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          val stats: Seq[Any] = colsLocal.flatMap { col =>
            val perBlock = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == col)
              .map(_.getStatistics).orNull)
            // a non-integral column (binary stats — outside this
            // manifest's declared scope) degrades to NULL = keep-the-file,
            // same as missing stats, rather than a task-killing cast
            if (perBlock.isEmpty ||
                perBlock.exists(st => st == null || !st.hasNonNullValue ||
                  !st.genericGetMin.isInstanceOf[Number]))
              Seq(null, null)
            else {
              val mins = perBlock.map(_.genericGetMin.asInstanceOf[Number].longValue)
              val maxs = perBlock.map(_.genericGetMax.asInstanceOf[Number].longValue)
              Seq(mins.min, maxs.max)
            }
          }
          Row.fromSeq(file +: nRows +: stats)
        } finally reader.close()
      }
    }
    // a manifest is a SNAPSHOT of the directory, not a recipe to re-list
    // it: materialize eagerly so later evaluations (after files are
    // compacted/vacuumed away) never re-run the footer reads — the
    // in-session stand-in for the manifest table a production pipeline
    // persists next to the data
    s.createDataFrame(rows, manifestSchema(cols)).localCheckpoint(eager = true)
  }

  /** Incremental manifest maintenance: footer-read ONLY files not yet in
    * `existing` and union them in (dropped files fall out). An ingest job
    * appending a few files to a million-file table pays a few footer
    * reads, not a full relisting of stats — same incremental-at-the-
    * corpus-boundary contract as the delta-dedup snapshot (q_l40).
    */
  def append(s: SparkSession, dir: String, existing: DataFrame,
      cols: Seq[String]): DataFrame = {
    val current = s.createDataFrame(
      s.sparkContext.parallelize(listParquet(s, dir).map(Row(_)), 8),
      StructType(Seq(StructField("file", StringType, nullable = false))))
    val newFiles = current.join(existing.select("file"), Seq("file"), "left_anti")
      .collect().map(_.getString(0)).toSeq
    val fresh =
      if (newFiles.isEmpty) existing.limit(0)
      else buildForFiles(s, newFiles, cols)
    existing.join(current, Seq("file"), "left_semi").unionByName(fresh)
      .localCheckpoint(eager = true) // same snapshot semantics as build()
  }

  /** The conjunctive range-intersection predicate: a file can hold a row
    * satisfying `lo <= col <= hi` for ALL bounds only if every bound's
    * [min, max] overlaps it. NULL stats keep the file (null-safe trues).
    */
  private def survives(bounds: Seq[(String, Long, Long)]): Column =
    bounds.map { case (c, lo, hi) =>
      col(s"min_$c").isNull || col(s"max_$c").isNull ||
        (col(s"max_$c") >= lo && col(s"min_$c") <= hi)
    }.reduce(_ && _)

  /** Files the bounds cannot rule out. Driver-sized output: one string
    * per SURVIVING file — the same order of magnitude as the file listing
    * Spark's own planner materializes for any read.
    */
  def pruneFiles(manifest: DataFrame,
      bounds: Seq[(String, Long, Long)]): Seq[String] =
    manifest.where(survives(bounds)).select("file")
      .collect().map(_.getString(0)).toSeq

  /** Manifest-pruned read: hand Spark ONLY the surviving files, then
    * re-apply the full predicate — the manifest decides what to OPEN,
    * the engine still decides what to RETURN, so a stale or lossy
    * manifest can cost speed, never rows (callers rebuild manifests on
    * write, as with any table-format stats).
    */
  def readPruned(s: SparkSession, dir: String, manifest: DataFrame,
      bounds: Seq[(String, Long, Long)]): DataFrame = {
    val keep = pruneFiles(manifest, bounds)
    val pred = bounds.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduce(_ && _)
    if (keep.isEmpty) Readers.parquet(s, dir).where(lit(false))
    else s.read.parquet(keep: _*).where(pred)
  }
}
