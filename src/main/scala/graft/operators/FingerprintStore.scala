package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained catalog of media FINGERPRINTS —
  * the decontam-postings / StatsManifest append discipline applied to
  * the multimodal family. Media decode is the most expensive per-row
  * kernel in this engine (the video near-dup row is decode-dominated:
  * demux + per-frame PNG decode ~2× the join's own cost), and without a
  * store every near-dup analysis re-decodes the corpus per RUN — a
  * localCheckpoint only pins decode within one query. With the store,
  * decode happens ONCE per media item for the life of the corpus:
  * [[bootstrap]] decodes everything, [[append]] decodes ONLY the batch's
  * never-seen items, and every serving join reads 8-byte digests off
  * parquet — blobs never shuffle, and at 100 TB the steady-state cost of
  * the whole perceptual-dedup family is O(new media per day), not
  * O(corpus) per analysis.
  *
  * Layout under `dir` (all parquet, append-only between vacuums):
  *   - `ledger/` — one row per INGESTED media item: (doc_id, format,
  *     decoded). Every batch row lands here — including items whose
  *     bytes failed their format's decoder (decoded = false), so a
  *     corrupt item is quarantined ONCE and never re-attempted on later
  *     appends (re-ingesting a FIXED payload needs a new doc_id, which a
  *     content-derived id gives for free). The ledger is the append
  *     anti-join's store side: ids only, never blobs.
  *   - `image/` — (doc_id, dhash): 64-bit perceptual dHash of png/bmp
  *     rows ([[Multimodal.imageDHash]]).
  *   - `audio/` — (doc_id, afp): `audioBits`-bit energy-gradient
  *     fingerprint of wav rows ([[Multimodal.audioFingerprint]]). The
  *     width is fixed at bootstrap and recorded in a root
  *     `_audiobits-<b>` marker (the Ivf `_watermark-` idiom): fingerprints
  *     of different widths don't compare, so append and serving both
  *     read the marker instead of trusting a caller-supplied width.
  *   - `video/` — (doc_id, frame, dhash): per-frame dHash postings of
  *     mp4 rows ([[Multimodal.videoFrameDHash]]) — the video identity is
  *     its frame-hash set, kept at frame granularity so frame-level
  *     analyses (splice detection, boilerplate-frame audits) read the
  *     same catalog the pair join does.
  *
  * Concurrency contract: single maintainer (bootstrap/append/vacuum),
  * any number of readers — the ChunkStore/StatsManifest posture. Append
  * idempotence is the caller's batch discipline (re-appending a batch
  * whose rows all hit the ledger is a no-op by construction).
  *
  * Scale shape of [[append]]: the new-id set is computed ids-only
  * (doc_id anti-join against the ledger — key-sized exchange), then the
  * batch's blob rows are filtered to new ids via a BROADCAST semi-join
  * when the new-id set is driver-safe, so the blob column never crosses
  * an exchange; above the broadcast bound it degrades to one BATCH-sized
  * blob shuffle (never store-sized), same as ChunkStore.append's
  * batch-text exchange. History parquet is read ids-only and never
  * rewritten.
  */
object FingerprintStore {

  /** New-id sets up to this many rows ride a broadcast semi-join (ids
    * are 8 B each — 4M ids ≈ 32 MB, inside a sane driver); bigger
    * batches fall back to the shuffle semi-join.
    */
  private val BroadcastIdCap = 4000000L

  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The store's fingerprint width for audio, from the root marker. */
  def audioBitsOf(s: SparkSession, dir: String): Int = {
    val hits = fsOf(s, dir).globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/_audiobits-*"))
    require(hits != null && hits.nonEmpty,
      s"fingerprint store at $dir has no _audiobits marker — not bootstrapped?")
    hits.map(_.getPath.getName.stripPrefix("_audiobits-").toInt).max
  }

  /** Decode one media frame into the three per-kind digest catalogs.
    * The decodes are the Multimodal partition-parallel mapPartitions
    * kernels — pure per-row maps, zero shuffle; the outputs are digests
    * (≤ 3 longs per row / per frame). The three extractors filter
    * DISJOINT format slices, so each blob decodes exactly once across
    * the three even without pinning.
    */
  private def fingerprints(s: SparkSession, media: DataFrame,
      audioBits: Int): (DataFrame, DataFrame, DataFrame) =
    (Multimodal.imageDHash(s, media),
      Multimodal.audioFingerprint(s, media, audioBits),
      Multimodal.videoFrameDHash(s, media))

  /** Build the store from scratch over `media` ((doc_id, blob, meta) —
    * the [[graft.io.Readers.binaryMedia]] / [[Multimodal.withMedia]]
    * shape). Decodes every row once.
    */
  def bootstrap(s: SparkSession, media: DataFrame, dir: String,
      audioBits: Int = 32): Unit = {
    require(audioBits % 8 == 0 && audioBits >= 16 && audioBits <= 64,
      s"audioBits $audioBits: the banded serving join needs a multiple " +
        "of 8 in [16,64]")
    val (img, aud, vid) = fingerprints(s, media, audioBits)
    // the ledger join consumes the catalogs' doc_ids, and the catalogs
    // are ALSO written — pin the digest rows so the blobs decode once,
    // not once per consumer (the hammingNearDupPairs rationale; digests
    // are ≤ 3 longs/row, never pixels)
    val (imgP, audP, vidP) =
      (img.localCheckpoint(), aud.localCheckpoint(), vid.localCheckpoint())
    imgP.write.mode("overwrite").parquet(s"$dir/image")
    audP.write.mode("overwrite").parquet(s"$dir/audio")
    vidP.write.mode("overwrite").parquet(s"$dir/video")
    val ids = media.select(col("doc_id"), col("meta.format").as("format"))
    ledgerOf(ids, imgP, audP, vidP)
      .write.mode("overwrite").parquet(s"$dir/ledger")
    fsOf(s, dir).create(new org.apache.hadoop.fs.Path(
      s"$dir/_audiobits-$audioBits"), true).close()
  }

  /** The ledger frame for a batch given its PINNED catalogs. A doc_id
    * that produced no catalog row failed its format's decoder —
    * decoded = false is the quarantine: ledgered (never re-tried on
    * later appends), fingerprint-less. Deriving decoded-ness this way
    * re-reads pinned digests, never blobs, and every join side is
    * ids-only.
    */
  private def ledgerOf(ids: DataFrame, img: DataFrame, aud: DataFrame,
      vid: DataFrame): DataFrame = {
    val okIds = img.select("doc_id")
      .unionByName(aud.select("doc_id"))
      .unionByName(vid.select("doc_id")).distinct()
    ids.join(okIds.withColumn("decoded", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("format"),
        coalesce(col("decoded"), lit(false)).as("decoded"))
  }

  /** Incrementally ingest a batch: decode ONLY media whose doc_id the
    * ledger has never seen, append their digests and ledger rows.
    * History is read ids-only (the ledger's doc_id column) and never
    * rewritten; a batch overlapping already-ingested ids costs one
    * key-sized anti-join, zero decodes for the overlap.
    */
  def append(s: SparkSession, media: DataFrame, dir: String): Unit = {
    val audioBits = audioBitsOf(s, dir)
    val seen = s.read.parquet(s"$dir/ledger").select("doc_id")
    // ids-only anti-join first (key-sized exchange), so the blob column
    // stays out of every store-sized plan edge
    val newIds = media.select("doc_id").distinct()
      .join(seen, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // materialized once: sized below AND reused
    val n = newIds.count()
    if (n == 0L) return
    val fresh =
      if (n <= BroadcastIdCap)
        media.join(broadcast(newIds), Seq("doc_id"), "left_semi")
      else media.join(newIds, Seq("doc_id"), "left_semi")
    val (img, aud, vid) = fingerprints(s, fresh, audioBits)
    val (imgP, audP, vidP) =
      (img.localCheckpoint(), aud.localCheckpoint(), vid.localCheckpoint())
    imgP.write.mode("append").parquet(s"$dir/image")
    audP.write.mode("append").parquet(s"$dir/audio")
    vidP.write.mode("append").parquet(s"$dir/video")
    val ids = fresh.select(col("doc_id"), col("meta.format").as("format"))
    ledgerOf(ids, imgP, audP, vidP)
      .write.mode("append").parquet(s"$dir/ledger")
  }

  def imageHashes(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/image")
  def audioFingerprints(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/audio")
  def videoPostings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/video")
  def ledger(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/ledger")

  /** The near-dup joins, SERVED FROM THE STORE — hash-identical to their
    * decode-path twins ([[Multimodal.imageNearDupPairs]] /
    * [[Multimodal.audioNearDupPairs]] / [[Multimodal.videoNearDupPairs]],
    * parity spec-pinned) with zero decode work: the joins read persisted
    * digests, so their cost is the banding/Jaccard exchange alone.
    * pinCatalog = false throughout — the catalogs' lineage is a parquet
    * scan, not a decode.
    */
  def imageNearDupPairs(s: SparkSession, dir: String,
      maxHamming: Int = 6): DataFrame =
    Multimodal.hammingNearDupPairs(imageHashes(s, dir), "dhash", 64,
      maxHamming, pinCatalog = false)

  def audioNearDupPairs(s: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    Multimodal.hammingNearDupPairs(audioFingerprints(s, dir), "afp",
      audioBitsOf(s, dir), maxHamming, pinCatalog = false)

  def videoNearDupPairs(s: SparkSession, dir: String,
      minJaccard: Double = 0.8, maxVideosPerFrame: Int = 0): DataFrame =
    Multimodal.videoJaccardPairs(videoPostings(s, dir), minJaccard,
      maxVideosPerFrame, pinPostings = false)

  /** Vacuum report: rows dropped across the four catalogs, files
    * rewritten vs left untouched (summed across catalogs).
    */
  final case class VacuumStats(droppedRows: Long, rewrittenFiles: Int,
      untouchedFiles: Int)

  /** Reclaim the store after media deletion — the right-to-be-forgotten
    * path a 100 TB media catalog cannot skip, and the `maintain` phase
    * that completes the store's lifecycle (build/append/serve/maintain,
    * the ChunkStore discipline): drop every catalog and ledger row whose
    * doc_id is absent from `liveDocs` (the retention set). A vacuumed id
    * is fully forgotten — a later [[append]] of the same id re-ingests
    * it fresh (the ledger row is gone), which is exactly right for a
    * deletion followed by a legitimate re-upload.
    *
    * Cost shape (the rewrite-dirty-files discipline, shared with
    * [[graft.io.ChunkStore.vacuum]]): the dead pass reads the doc_id
    * column only (columnar projection); only files holding ≥ 1 dead row
    * are re-read full-width and rewritten — clean files are never read,
    * never moved — so vacuum cost rides the DIRTY file set, not store
    * size. Swap is stage-then-rename with displaced originals parked in
    * `<dir>/.vacuum-trash/` until the vacuum completes (crash recovery:
    * restore them by hand; a completed vacuum removes the dir).
    *
    * Concurrency contract: a MAINTENANCE operation — run without
    * concurrent readers/appenders, same as every file-level rewrite
    * without a table format's snapshot isolation.
    */
  def vacuum(s: SparkSession, dir: String,
      liveDocs: DataFrame): VacuumStats = {
    import org.apache.hadoop.fs.Path
    import graft.io.StatsManifest
    val fs = fsOf(s, dir)
    val live = liveDocs.select("doc_id").distinct().localCheckpoint(true)
    val trash = new Path(s"$dir/.vacuum-trash")
    val token = java.util.UUID.randomUUID().toString.take(8)
    def renameOrDie(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"vacuum: rename $from -> $to failed")
    var dropped = 0L
    var rewritten = 0
    var untouched = 0
    Seq("image", "audio", "video", "ledger").foreach { cat =>
      val catDir = s"$dir/$cat"
      val allFiles = StatsManifest.listParquet(s, catDir)
      if (allFiles.nonEmpty) {
        // ONE ids-only pass yields the dead total and the dirty file
        // list together (the ChunkStore.vacuum shape)
        val deadPerFile = s.read.parquet(catDir)
          .withColumn("f", StatsManifest.normalizedInputFile())
          .select("doc_id", "f")
          .join(live, Seq("doc_id"), "left_anti")
          .groupBy("f").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val dirty = deadPerFile.keySet
        dropped += deadPerFile.values.sum
        untouched += allFiles.count(f => !dirty(f))
        if (dirty.nonEmpty) {
          fs.mkdirs(trash)
          val staged = s"$dir/.vacuum-staged-$cat"
          // the staging scan opens ONLY the dirty files — a filter on
          // the input_file_name-derived column over the full-store frame
          // would read every clean file's pages too (UDF filters don't
          // push down)
          s.read.parquet(dirty.toSeq: _*)
            .join(live, Seq("doc_id"), "left_semi")
            .write.mode("overwrite").parquet(staged)
          dirty.foreach { f =>
            val p = new Path(f)
            renameOrDie(p, new Path(trash, s"$cat-${p.getName}"))
          }
          StatsManifest.listParquet(s, staged).zipWithIndex.foreach {
            case (f, i) =>
              val p = new Path(f)
              renameOrDie(p,
                new Path(catDir, s"vacuum-$token-$i-${p.getName}"))
          }
          fs.delete(new Path(staged), true)
          rewritten += dirty.size
        }
      }
    }
    if (fs.exists(trash)) fs.delete(trash, true)
    VacuumStats(dropped, rewritten, untouched)
  }
}
