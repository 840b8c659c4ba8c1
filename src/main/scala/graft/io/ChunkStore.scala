package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The WRITE side of the CDC chunk economy: q_l42/q_l43 MEASURE what a
  * content-addressed chunk store would reclaim; this object actually
  * builds one — a unique-chunk store plus a per-document manifest — and
  * re-materializes documents from it, the storage-dedup primitive
  * (rsync/LBFS/backup dedup) applied corpus-wide. Reference analog: the
  * clone pipeline's extract→reload round trip (Program.cs:560-720), here
  * at sub-document granularity with content-defined boundaries.
  *
  * Layout under `dir`:
  *   - `chunks/`   — one row per UNIQUE chunk: (h, len, x, chunk_text).
  *     Identity is (rolling-hash h, len, xxhash64 x): h alone is mod
  *     1e9+7 and WOULD birthday-collide on large corpora (~5 expected
  *     collisions per 10^5 distinct chunks); the 64-bit x pushes
  *     corruption odds below 2^-40 at 100 TB scale while staying
  *     engine-reproducible. Reference counts are NOT stored — they are
  *     derivable from the manifest ([[referenceCounts]]) and storing them
  *     would force [[append]] to rewrite history on every batch.
  *   - `manifest/` — one row per document chunk slot: (doc_id, idx, h,
  *     len, x). Re-materialization is manifest ⋈ chunks, re-assembled in
  *     idx order.
  *
  * Scale shape: chunking is the one corpus-sized computation and runs
  * TWICE (once per output) rather than being cached — a localCheckpoint
  * here would materialize the whole corpus to executor disk, strictly
  * worse than re-running a shuffle-free codegen pass. The store write
  * shuffles one (h, len, x)-keyed exchange whose payload is each unique
  * chunk's text once; the manifest write carries only ids and hashes.
  * [[append]] makes growth incremental at the corpus boundary: a new
  * batch is chunked, anti-joined against the (store-sized, text-free)
  * existing key set, and only never-seen chunk text lands — history is
  * never re-read, never rewritten, exactly the q_l40 delta-dedup /
  * ingestWithManifest contract.
  */
object ChunkStore {

  /** Per-document chunk spans: (doc_id, idx, h, len, chunk_text). Offsets
    * are recovered from the packed (hash, len) array the codegen chunker
    * emits — lengths arrive in document order, so offset = running sum —
    * keeping the boundary logic in exactly one place
    * ([[graft.functions.ContentChunks]]). Documents longer than the
    * packed-length cap (2^20-1 codepoints per chunk) are out of contract.
    */
  private[graft] def chunked(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("idx")
    docs
      .select(col("doc_id"), col("text"),
        posexplode(graft.functions.ContentChunks(col("text"))).as(Seq("idx", "p")))
      .select(col("doc_id"), col("text"), col("idx"),
        expr("p DIV 1048576").as("h"), (col("p") % 1048576L).as("len"))
      .withColumn("off", sum(col("len")).over(w) - col("len"))
      .select(col("doc_id"), col("idx"), col("h"), col("len"),
        expr("substring(text, CAST(off + 1 AS INT), CAST(len AS INT))")
          .as("chunk_text"))
  }

  private def keyed(docs: DataFrame): DataFrame =
    chunked(docs.select("doc_id", "text").where(col("text").isNotNull))
      .withColumn("x", xxhash64(col("chunk_text")))

  /** Build the store from scratch: unique chunks + the per-doc manifest.
    * Null-text documents are excluded by contract (they have no chunks to
    * store); callers that must round-trip them keep them in a side table.
    */
  def write(docs: DataFrame, dir: String): Unit = {
    val c = keyed(docs)
    c.groupBy("h", "len", "x")
      .agg(first(col("chunk_text")).as("chunk_text"))
      .write.mode("overwrite").parquet(s"$dir/chunks")
    c.select("doc_id", "idx", "h", "len", "x")
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** Incrementally ingest a batch of NEW documents (doc_ids not already
    * in the manifest — re-appending an existing doc_id is out of
    * contract): only chunks the store has never seen are written, found
    * by a left-anti join against the existing KEY projection — the store
    * side of that join carries no chunk text, so the exchange is
    * key-sized, and history parquet is neither re-read for content nor
    * rewritten. Cross-batch repeats therefore cost one manifest row, not
    * a second copy of the span.
    */
  def append(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    val c = keyed(docs)
    val existing = s.read.parquet(s"$dir/chunks").select("h", "len", "x")
    c.select("h", "len", "x", "chunk_text")
      .dropDuplicates("h", "len", "x")
      .join(existing, Seq("h", "len", "x"), "left_anti")
      .write.mode("append").parquet(s"$dir/chunks")
    c.select("doc_id", "idx", "h", "len", "x")
      .write.mode("append").parquet(s"$dir/manifest")
  }

  /** Reference counts, derived from the manifest at read time (stored
    * counts would go stale on every append): the reclaim-audit view —
    * refs == manifest slots per chunk, by construction.
    */
  def referenceCounts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/manifest")
      .groupBy("h", "len", "x").agg(count(lit(1)).as("refs"))

  /** Re-materialize (doc_id, text) from the store: manifest ⋈ chunks on
    * the full identity triple, chunks re-assembled in slot order. One
    * manifest-sized shuffle for the join (the store side is
    * unique-chunks-sized) and one doc_id-keyed aggregation.
    */
  def materialize(s: SparkSession, dir: String): DataFrame = {
    val chunks = s.read.parquet(s"$dir/chunks")
      .select("h", "len", "x", "chunk_text")
    s.read.parquet(s"$dir/manifest")
      .join(chunks, Seq("h", "len", "x"))
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("chunk_text")))),
          e => e("chunk_text")),
        "").as("text"))
  }

  /** Vacuum report: manifest slots dropped, unique chunks reclaimed, chunk
    * files rewritten vs left untouched.
    */
  final case class VacuumStats(droppedSlots: Long, reclaimedChunks: Long,
      rewrittenFiles: Int, untouchedFiles: Int)

  /** Reclaim storage after document deletion: drop the manifest rows of
    * docs absent from `liveDocs` (a `doc_id` frame — the retention set),
    * then delete every chunk whose derived reference count hits zero —
    * q_l43's reclaim WORKLIST made actionable. The write side touches
    * ONLY chunk files that actually hold a dead chunk: clean files are
    * never read, never rewritten, so vacuum cost scales with the dirty
    * file set, not the store size (the Delta/Iceberg rewrite-dirty-files
    * discipline). Dirty files' surviving rows are staged to a temp dir,
    * the dirty files are replaced file-by-file via rename, and the
    * manifest swaps through the same stage-then-rename.
    *
    * Concurrency contract: vacuum is a MAINTENANCE operation — run it
    * without concurrent readers/appenders (same as any file-level rewrite
    * without a table format's snapshot isolation). A crash mid-swap
    * leaves the displaced originals under `<dir>/.vacuum-trash/` for
    * manual recovery; a completed vacuum removes it.
    */
  def vacuum(s: SparkSession, dir: String, liveDocs: DataFrame): VacuumStats = {
    import org.apache.hadoop.fs.Path
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)

    val manifest = s.read.parquet(s"$dir/manifest").localCheckpoint()
    val live = liveDocs.select("doc_id").distinct()
    val liveManifest = manifest.join(live, Seq("doc_id"), "left_semi")
      .localCheckpoint() // severs lineage from the files about to swap
    val droppedSlots = manifest.count() - liveManifest.count()

    // chunks still referenced by at least one surviving slot. The dead
    // pass reads keys only (columnar projection); the per-file attribution
    // normalizes input_file_name URIs to listing-style Path strings, the
    // same discipline as StatsManifest's bloom build.
    val liveKeys = liveManifest.select("h", "len", "x").distinct()
    val chunks = s.read.parquet(s"$dir/chunks")
      .withColumn("f", StatsManifest.normalizedInputFile())
    val dead = chunks.join(liveKeys, Seq("h", "len", "x"), "left_anti")
    // ONE key-column pass yields both the dead total and the dirty file
    // list (a separate count() + distinct-collect would scan the store's
    // key columns twice before any rewrite)
    val deadPerFile = dead.groupBy("f").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val reclaimed = deadPerFile.values.sum

    val stats =
      if (reclaimed == 0 && droppedSlots == 0)
        VacuumStats(0L, 0L, 0, StatsManifest.listParquet(s, s"$dir/chunks").size)
      else {
        // only files holding >= 1 dead chunk get rewritten
        val dirtyFiles = deadPerFile.keySet
        val allFiles = StatsManifest.listParquet(s, s"$dir/chunks")
        val untouched = allFiles.filterNot(dirtyFiles)
        val trash = new Path(s"$dir/.vacuum-trash")
        fs.mkdirs(trash)
        // unique per-vacuum token: staged survivor files from THIS run can
        // never collide with (and silently fail to rename over) leftovers
        // of an earlier vacuum's names
        val token = java.util.UUID.randomUUID().toString.take(8)
        def renameOrDie(from: Path, to: Path): Unit =
          require(fs.rename(from, to), s"vacuum: rename $from -> $to failed")
        if (dirtyFiles.nonEmpty) {
          val staged = s"$dir/.vacuum-staged"
          // the staging scan opens ONLY the dirty files — filtering the
          // full-store frame on the input_file_name-derived column would
          // read every clean file's pages too (UDF filters don't push
          // down), defeating the rewrite-dirty-files design
          s.read.parquet(dirtyFiles.toSeq: _*)
            .join(liveKeys, Seq("h", "len", "x"), "left_semi")
            .write.mode("overwrite").parquet(staged)
          // swap: displace dirty originals (recoverable), then move the
          // staged survivors in under fresh names
          dirtyFiles.foreach { f =>
            val p = new Path(f)
            renameOrDie(p, new Path(trash, p.getName))
          }
          StatsManifest.listParquet(s, staged).zipWithIndex.foreach {
            case (f, i) =>
              val p = new Path(f)
              renameOrDie(p, new Path(s"$dir/chunks/vacuum-$token-$i-${p.getName}"))
          }
          fs.delete(new Path(staged), true)
        }
        // manifest swap through the same stage-then-rename
        val stagedM = s"$dir/.vacuum-manifest"
        liveManifest.write.mode("overwrite").parquet(stagedM)
        renameOrDie(new Path(s"$dir/manifest"), new Path(trash, "manifest"))
        renameOrDie(new Path(stagedM), new Path(s"$dir/manifest"))
        fs.delete(trash, true)
        VacuumStats(droppedSlots, reclaimed, dirtyFiles.size, untouched.size)
      }
    stats
  }

}
