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
  * idempotence is the STORE's, not the caller's (the Ivf
  * `ingest_batch`/`_batch-<id>` discipline, r16): every append runs
  * under a batch id, lands its rows as `batch<id>-*`-prefixed files in
  * each catalog, and commits a root `_batch-<id>` flag LAST. A replay
  * of a flagged batch is a no-op; a replay of an unflagged (crashed)
  * batch first deletes that id's file remnants from all four catalogs —
  * restoring the exactly-before-this-batch state — and redoes the whole
  * append, so the crash window the plain mode("append") writes left
  * open (catalogs landed, ledger didn't → replay re-decodes and
  * DUPLICATES the digest rows) is closed: replay rewrites, never
  * duplicates, and the one-row-per-item ledger invariant holds across
  * any number of retries.
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
    // a re-bootstrap over a store with a torn vacuum/compact must not
    // leave the stale marker + trash behind: a later recover() would
    // "restore" pre-bootstrap files into the fresh catalogs
    val fs0 = fsOf(s, dir)
    val stale = fs0.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/_vacuum-inprogress-*"))
    if (stale != null) stale.foreach(m => fs0.delete(m.getPath, false))
    fs0.delete(new org.apache.hadoop.fs.Path(s"$dir/.vacuum-trash"), true)
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

  private val Catalogs = Seq("image", "audio", "video", "ledger")

  /** The next unused batch id: one past the highest committed `_batch-*`
    * flag (0 for a store that has only bootstrapped). Only safe under
    * the single-maintainer contract — a crashed batch has no flag, so
    * the retry re-allocates the SAME id and its remnant-delete pass
    * restores the before state.
    */
  private def nextBatchId(s: SparkSession, dir: String): Long = {
    val hits = fsOf(s, dir).globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/_batch-*"))
    if (hits == null || hits.isEmpty) 0L
    else hits.map(_.getPath.getName.stripPrefix("_batch-").toLong).max + 1L
  }

  /** Land `df`'s rows in `$dir/$cat` as `batch<id>-*`-named files: write
    * to a staging dir, rename each data file in with the batch prefix,
    * drop the stage. The prefix is what makes a crashed batch's remnants
    * identifiable (and deletable) on replay — a bare mode("append")
    * write scatters anonymous part files that no retry could take back.
    */
  private def landBatchFiles(s: SparkSession, df: DataFrame, dir: String,
      cat: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val stage = s"$dir/.append-staged-$cat"
    df.write.mode("overwrite").parquet(stage)
    fs.mkdirs(new Path(s"$dir/$cat"))
    graft.io.StatsManifest.listParquet(s, stage).zipWithIndex.foreach {
      case (f, i) =>
        val p = new Path(f)
        require(fs.rename(p,
          new Path(s"$dir/$cat", s"batch$batchId-$i-${p.getName}")),
          s"append: rename $f into $dir/$cat failed")
    }
    fs.delete(new Path(stage), true)
  }

  /** Incrementally ingest a batch: decode ONLY media whose doc_id the
    * ledger has never seen, append their digests and ledger rows.
    * History is read ids-only (the ledger's doc_id column) and never
    * rewritten; a batch overlapping already-ingested ids costs one
    * key-sized anti-join, zero decodes for the overlap.
    *
    * Idempotence (r16): the batch lands as `batch<id>-*` files per
    * catalog with a root `_batch-<id>` flag committed LAST. Callers
    * with their own batch ids (a streaming sink's foreachBatch — see
    * [[graft.streaming.StreamOps.ingestMedia]]) pass `batchId` ≥ 0;
    * the default −1 self-allocates the next id from the committed
    * flags, which under the single-maintainer contract makes a plain
    * retried `append` land on its crashed predecessor's id and REWRITE
    * it. Either way: flagged id → no-op; unflagged id → remnants of
    * that id are deleted from every catalog before the batch runs, so
    * a replay after any crash point produces the exact
    * append-equals-rebuild catalogs (spec-pinned in EngineSpec).
    */
  def append(s: SparkSession, media: DataFrame, dir: String,
      batchId: Long = -1L): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val id = if (batchId >= 0L) batchId else nextBatchId(s, dir)
    val flag = new Path(s"$dir/_batch-$id")
    if (fs.exists(flag)) return // committed batch replayed: no-op
    // a torn vacuum/compact (surviving _vacuum-inprogress marker) left
    // some catalog rows parked in trash — appending against that view
    // would anti-join on an incomplete ledger and re-ingest parked ids;
    // roll the maintenance back first (cheap glob when clean)
    recover(s, dir)
    // a crashed attempt at this id left identifiable remnants — take
    // them back first, restoring the exactly-before-this-batch state
    // (in particular the ledger's view of "seen"), so the re-run below
    // neither duplicates digests nor skips re-decoding its own rows
    Catalogs.foreach { cat =>
      val hits = fs.globStatus(new Path(s"$dir/$cat/batch$id-*"))
      if (hits != null) hits.foreach(h => fs.delete(h.getPath, false))
    }
    val audioBits = audioBitsOf(s, dir)
    val seen = s.read.parquet(s"$dir/ledger").select("doc_id")
    // ids-only anti-join first (key-sized exchange), so the blob column
    // stays out of every store-sized plan edge
    val newIds = media.select("doc_id").distinct()
      .join(seen, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // materialized once: sized below AND reused
    val n = newIds.count()
    if (n > 0L) {
      val fresh =
        if (n <= BroadcastIdCap)
          media.join(broadcast(newIds), Seq("doc_id"), "left_semi")
        else media.join(newIds, Seq("doc_id"), "left_semi")
      val (img, aud, vid) = fingerprints(s, fresh, audioBits)
      val (imgP, audP, vidP) =
        (img.localCheckpoint(), aud.localCheckpoint(), vid.localCheckpoint())
      landBatchFiles(s, imgP, dir, "image", id)
      landBatchFiles(s, audP, dir, "audio", id)
      landBatchFiles(s, vidP, dir, "video", id)
      val ids = fresh.select(col("doc_id"), col("meta.format").as("format"))
      landBatchFiles(s, ledgerOf(ids, imgP, audP, vidP), dir, "ledger", id)
    }
    fs.create(flag, true).close() // the commit point — everything landed
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

  /** Fold the per-batch file sprawl back to one write's worth of files
    * per catalog — the maintenance move a LIVE ingest loop needs: every
    * append lands ~shuffle-partitions files per catalog, so a crawl
    * delivering thousands of micro-batches grows each catalog to
    * hundreds of thousands of tiny files (the classic small-files
    * problem: listing cost, footer reads, and scan-task scheduling all
    * ride file COUNT at 100 TB, not bytes). One corpus-sized rewrite
    * per catalog, swapped with the vacuum discipline (stage, trash,
    * rename-in, drop trash) under the same `_vacuum-inprogress-`
    * recovery marker — [[recover]] rolls back a torn compact exactly
    * like a torn vacuum.
    *
    * The `_batch-*` flags are KEPT: they are the replay contract, not
    * file metadata — a batch replayed after its files were folded away
    * still finds its flag and no-ops, and [[append]]'s remnant-delete
    * glob (`batch<id>-*`) cannot match the folded `compact-` names, so
    * idempotence survives compaction. Same single-maintainer contract
    * as vacuum.
    */
  def compact(s: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.io.StatsManifest
    val fs = fsOf(s, dir)
    val trash = new Path(s"$dir/.vacuum-trash")
    val token = java.util.UUID.randomUUID().toString.take(8)
    val inProgress = new Path(s"$dir/_vacuum-inprogress-$token")
    fs.create(inProgress, true).close()
    def renameOrDie(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"compact: rename $from -> $to failed")
    Catalogs.foreach { cat =>
      val catDir = s"$dir/$cat"
      val files = StatsManifest.listParquet(s, catDir)
      // fold to a BYTES-derived file count (~128 MB each), not the scan's
      // partitioning: Spark splits a small-file read into
      // defaultParallelism partitions, so a bare rewrite would reproduce
      // the sprawl it is meant to fold
      val bytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
      val target = math.max(1, (bytes / (128L << 20)).toInt)
      if (files.length > target) {
        val staged = s"$dir/.compact-staged-$cat"
        s.read.parquet(catDir).coalesce(target)
          .write.mode("overwrite").parquet(staged)
        fs.mkdirs(trash)
        files.foreach { f =>
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
      }
    }
    if (fs.exists(trash)) fs.delete(trash, true)
    fs.delete(inProgress, false)
  }

  /** Count of data files per catalog — the [[compact]] trigger a live
    * ingest loop polls (cheap: one recursive listing, no reads).
    */
  def dataFileCount(s: SparkSession, dir: String): Int =
    Catalogs.map(cat =>
      graft.io.StatsManifest.listParquet(s, s"$dir/$cat").length).sum

  /** Roll back a vacuum/compact that crashed mid-swap — the CODE form
    * of the scaladoc'd CRASH RECOVERY order, so an operator (or the
    * ingest loop itself, on startup) never performs it by hand: for
    * each surviving `_vacuum-inprogress-<token>` marker, (1) delete
    * that token's `vacuum-<token>-*` replacement files from every
    * catalog (they duplicate rows still present in trash), (2) move
    * `.vacuum-trash/<cat>-<name>` originals back into their catalogs,
    * (3) drop the marker, trash and stage dirs. The store lands on its
    * exact pre-vacuum state; re-running the vacuum/compact then
    * completes the maintenance. A clean store (no marker) is a no-op.
    * Returns true when a rollback was performed.
    */
  def recover(s: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val markers = fs.globStatus(new Path(s"$dir/_vacuum-inprogress-*"))
    if (markers == null || markers.isEmpty) return false
    def renameOrDie(from: Path, to: Path): Unit =
      require(fs.rename(from, to), s"recover: rename $from -> $to failed")
    markers.foreach { m =>
      val token = m.getPath.getName.stripPrefix("_vacuum-inprogress-")
      Catalogs.foreach { cat =>
        val hits = fs.globStatus(new Path(s"$dir/$cat/vacuum-$token-*"))
        if (hits != null) hits.foreach(h => fs.delete(h.getPath, false))
      }
    }
    val trash = new Path(s"$dir/.vacuum-trash")
    val parked = fs.globStatus(new Path(s"$dir/.vacuum-trash/*"))
    if (parked != null) parked.foreach { f =>
      val name = f.getPath.getName
      Catalogs.find(c => name.startsWith(s"$c-")).foreach { cat =>
        renameOrDie(f.getPath,
          new Path(s"$dir/$cat", name.stripPrefix(s"$cat-")))
      }
    }
    if (fs.exists(trash)) fs.delete(trash, true)
    Catalogs.foreach { cat =>
      Seq(s"$dir/.vacuum-staged-$cat", s"$dir/.compact-staged-$cat")
        .foreach(p => fs.delete(new Path(p), true))
    }
    markers.foreach(m => fs.delete(m.getPath, false))
    true
  }

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
    * `<dir>/.vacuum-trash/` until the vacuum completes (a completed
    * vacuum removes both the trash dir and the `_vacuum-inprogress-*`
    * marker it staked first).
    *
    * CRASH RECOVERY — order matters: a crash mid-swap can leave some
    * `vacuum-<token>-*` replacement files already renamed into a
    * catalog while their displaced originals sit in trash, so restoring
    * trash alone would DUPLICATE those files' live rows. Recover a store
    * whose `_vacuum-inprogress-<token>` marker survives by (1) deleting
    * every `vacuum-<token>-*` file from all four catalogs for that
    * token, (2) moving `.vacuum-trash/<cat>-<name>` files back to their
    * catalogs, (3) removing the marker and trash dir — i.e. roll the
    * vacuum BACK, then re-run it.
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
    // staked before any file moves; survives a crash as the recovery
    // signal (and names the token whose files must be rolled back first
    // — see the scaladoc's CRASH RECOVERY order)
    val inProgress = new Path(s"$dir/_vacuum-inprogress-$token")
    fs.create(inProgress, true).close()
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
    fs.delete(inProgress, false)
    VacuumStats(dropped, rewritten, untouched)
  }
}
