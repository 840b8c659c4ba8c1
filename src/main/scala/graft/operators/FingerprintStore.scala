package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.BatchStore

/** Persisted, incrementally-maintained catalog of media FINGERPRINTS —
  * the [[graft.io.BatchStore]] commit discipline applied to the
  * multimodal family. Media decode is the most expensive per-row kernel
  * in this engine (the video near-dup row is decode-dominated: demux +
  * per-frame PNG decode ~2× the join's own cost), and without a store
  * every near-dup analysis re-decodes the corpus per RUN — a
  * localCheckpoint only pins decode within one query. With the store,
  * decode happens ONCE per media item for the life of the corpus:
  * [[bootstrap]] decodes everything, [[append]] decodes ONLY the batch's
  * never-seen items, and every serving join reads 8-byte digests off
  * parquet — blobs never shuffle, and at 100 TB the steady-state cost of
  * the whole perceptual-dedup family is O(new media per day), not
  * O(corpus) per analysis.
  *
  * Layout under `dir` (all parquet, flat per catalog):
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
  * Concurrency, append idempotence (namespaced `_batch-<tag>` flags +
  * the compact-maintained watermark), reader snapshot isolation
  * (`fold-<token>-*` replacements + `_snap-<k>` metadata-pointer
  * commits, retired originals reaped one maintenance round later) and
  * crash recovery are ALL the [[graft.io.BatchStore]] contract — see its
  * class doc; the spec legs for every crash window live in EngineSpec
  * and StreamBatchParitySpec against THIS store.
  *
  * Scale shape of [[append]]: the new-id set is computed ids-only
  * (doc_id anti-join against the ledger — key-sized exchange), then the
  * batch's blob rows are filtered to new ids via a BROADCAST semi-join
  * when the new-id set is driver-safe, so the blob column never crosses
  * an exchange; above the broadcast bound it degrades to one BATCH-sized
  * blob shuffle (never store-sized). History parquet is read ids-only
  * and never rewritten.
  */
object FingerprintStore {

  /** New-id sets up to this many rows ride a broadcast semi-join (ids
    * are 8 B each — 4M ids ≈ 32 MB, inside a sane driver); bigger
    * batches fall back to the shuffle semi-join.
    */
  private val BroadcastIdCap = 4000000L

  private val Catalogs = Seq("image", "audio", "video", "ledger")

  private def store(dir: String) = BatchStore(dir, Catalogs)

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

  /** Is this caller-supplied (stream-namespace) batch id committed —
    * flag-or-watermark ([[graft.io.BatchStore.batchCommitted]])?
    */
  def batchCommitted(s: SparkSession, dir: String, batchId: Long): Boolean =
    store(dir).batchCommitted(s, batchId)

  /** Commit a stream-namespace batch flag directly (the bootstrap leg of
    * [[graft.streaming.StreamOps.ingestMediaBatch]], where the catalog
    * write is mode-overwrite-idempotent and [[append]] never runs).
    */
  def commitBatchFlag(s: SparkSession, dir: String, batchId: Long): Unit =
    store(dir).commitFlag(s, batchId.toString)

  /** Decode one media frame into ALL THREE digest kinds in a single
    * partition-parallel pass: (doc_id, kind, frame, digest) rows, kind
    * 0 = image dHash, 1 = audio fingerprint, 2 = per-frame video dHash
    * (frame = −1 for the single-digest kinds). The per-format kernels
    * and quarantine policy are exactly the Multimodal catalog builders'
    * ([[Multimodal.dHashOf]] / [[Multimodal.audioFingerprintOf]] /
    * [[Multimodal.videoFrameDHashes]] over the same disjoint format
    * slices — parity spec-pinned); fusing them means ingest reads the
    * media bytes ONCE instead of once per kind (the three separate
    * catalog scans each re-read the whole file tree, since the format
    * filter is a path expression no source can push down; at 100 TB
    * that is 3× the ingest I/O for identical decode work — r20, §6).
    */
  private[operators] def fusedDigests(s: SparkSession, media: DataFrame,
      audioBits: Int): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("meta.format").as("format"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(rows => rows.flatMap { case (id, fmt, blob) =>
        fmt match {
          case "png" | "bmp" =>
            Multimodal.dHashOf(blob).iterator.map(h => (id, 0, -1, h))
          case "wav" =>
            Multimodal.audioFingerprintOf(blob, audioBits).iterator
              .map(h => (id, 1, -1, h))
          case "mp4" =>
            Multimodal.videoFrameDHashes(blob).iterator.flatMap(hs =>
              hs.iterator.zipWithIndex.map { case (h, f) => (id, 2, f, h) })
          case _ => Iterator.empty
        }
      })
      .toDF("doc_id", "kind", "frame", "digest")
  }

  /** The three per-kind catalog frames off a PINNED fused digest frame —
    * column names/types identical to the Multimodal catalog builders'
    * output (the store parquet schema readers depend on).
    */
  private def splitDigests(all: DataFrame)
      : (DataFrame, DataFrame, DataFrame) =
    (all.filter(col("kind") === 0)
        .select(col("doc_id"), col("digest").as("dhash")),
      all.filter(col("kind") === 1)
        .select(col("doc_id"), col("digest").as("afp")),
      all.filter(col("kind") === 2)
        .select(col("doc_id"), col("frame"), col("digest").as("dhash")))

  /** Build the store from scratch over `media` ((doc_id, blob, meta) —
    * the [[graft.io.Readers.binaryMedia]] / [[Multimodal.withMedia]]
    * shape). Decodes every row once. Commits by publishing snapshot 0
    * and (LAST) the `_audiobits` marker — a crash anywhere before the
    * marker re-runs bootstrap idempotently (all catalog writes are
    * mode-overwrite).
    */
  def bootstrap(s: SparkSession, media: DataFrame, dir: String,
      audioBits: Int = 32): Unit = {
    require(audioBits % 8 == 0 && audioBits >= 16 && audioBits <= 64,
      s"audioBits $audioBits: the banded serving join needs a multiple " +
        "of 8 in [16,64]")
    val st = store(dir)
    st.cleanRootMetadata(s)
    // ONE media scan decodes every kind; the pinned rows are digests
    // (≤ 3 longs/row, never pixels), consumed by the three catalog
    // writes AND the ledger join (the hammingNearDupPairs rationale)
    val (all, allIds) = pinTracked(s,
      fusedDigests(s, media, audioBits))
    try {
      val (imgP, audP, vidP) = splitDigests(all)
      // REBALANCE before every catalog write (guide §6): the pinned
      // digest frame inherits the media scan's partitioning (one
      // partition per ~file-listing split), so a bare write lands one
      // near-empty parquet file per scan task — at bench SF that is
      // ~50 files per catalog and the write jobs dominate bootstrap
      // (measured 3.9 s of its 6.1 s); at 100 TB it is the small-files
      // problem verbatim. The AQE rebalance exchange sizes output
      // partitions by bytes (advisoryPartitionSizeInBytes), so file
      // count follows data volume at any scale with no tuned constant.
      def land(df: DataFrame, cat: String): Unit =
        df.hint("rebalance").write.mode("overwrite").parquet(s"$dir/$cat")
      val ids = media.select(col("doc_id"), col("meta.format").as("format"))
      // the four catalog writes are INDEPENDENT jobs over the same
      // pinned digest frame — submit them concurrently so the write
      // commits overlap instead of serializing four small jobs (guide
      // §2.6; measured ~1 s per write job at bench SF). Concurrent
      // actions on one SparkSession are supported; failures propagate
      // through Await.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(
          java.util.concurrent.Executors.newFixedThreadPool(4))
      val writes = Seq(
        Future(land(imgP, "image")), Future(land(audP, "audio")),
        Future(land(vidP, "video")),
        Future(land(ledgerOf(ids, imgP, audP, vidP), "ledger")))
      try writes.foreach(Await.result(_, Duration.Inf))
      finally ec.asInstanceOf[
        scala.concurrent.ExecutionContextExecutorService].shutdown()
    } finally unpinTracked(s, allIds) // catalogs landed; drop the pin —
    // a repeated in-process bootstrap (the bench re-runs q_mm10 per
    // pass) must not accumulate digest blocks in executor storage
    st.publishBootstrap(s)
    fsOf(s, dir).create(new org.apache.hadoop.fs.Path(
      s"$dir/_audiobits-$audioBits"), true).close()
  }

  /** localCheckpoint + the persistent-RDD registry diff that identifies
    * its blocks, so a bounded-lifetime pin can be dropped when its
    * consumers are done (the connectedComponents hygiene pattern —
    * `Dataset.unpersist` can't reach a LogicalRDD's blocks).
    */
  private def pinTracked(s: SparkSession,
      df: DataFrame): (DataFrame, Set[Int]) = {
    val before = s.sparkContext.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    (out, s.sparkContext.getPersistentRDDs.keySet.toSet -- before)
  }

  private def unpinTracked(s: SparkSession, ids: Set[Int]): Unit = {
    val live = s.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
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
    *
    * Idempotence is the [[graft.io.BatchStore]] contract: callers with
    * their own batch ids (a streaming sink's foreachBatch — see
    * [[graft.streaming.StreamOps.ingestMedia]]) pass `batchId` ≥ 0 and
    * get the bare numeric tag; the default −1 self-allocates the next
    * MANUAL-namespace tag (`m<N>`), disjoint from stream ids by
    * construction. Committed tag → no-op; uncommitted tag → remnants
    * deleted, whole batch redone — replay at any crash point equals the
    * rebuild (spec-pinned in EngineSpec).
    */
  def append(s: SparkSession, media: DataFrame, dir: String,
      batchId: Long = -1L): Unit = {
    val st = store(dir)
    val flags = st.loadFlags(s)
    val tag = st.resolveTag(flags, batchId)
    if (flags.committed(tag)) return // committed batch replayed: no-op
    // a torn vacuum/compact left invisible junk and a marker — clean it
    // so this batch's work can't interleave with a half-done swap
    // (cheap glob when clean)
    st.recover(s)
    // a crashed attempt at this tag left identifiable remnants — take
    // them back first, restoring the exactly-before-this-batch state
    // (in particular the ledger's view of "seen"), so the re-run below
    // neither duplicates digests nor skips re-decoding its own rows
    st.removeRemnants(s, tag)
    val audioBits = audioBitsOf(s, dir)
    val seen = st.readCat(s, "ledger").select("doc_id")
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
      // one batch scan decodes every kind (the bootstrap discipline)
      val (all, allIds) = pinTracked(s, fusedDigests(s, fresh, audioBits))
      try {
        val (imgP, audP, vidP) = splitDigests(all)
        st.landBatchFiles(s, imgP, "image", tag)
        st.landBatchFiles(s, audP, "audio", tag)
        st.landBatchFiles(s, vidP, "video", tag)
        val ids = fresh.select(col("doc_id"), col("meta.format").as("format"))
        st.landBatchFiles(s, ledgerOf(ids, imgP, audP, vidP), "ledger", tag)
      } finally unpinTracked(s, allIds)
    }
    st.commitFlag(s, tag) // the commit point — everything landed
  }

  def imageHashes(s: SparkSession, dir: String): DataFrame =
    store(dir).readCat(s, "image")
  def audioFingerprints(s: SparkSession, dir: String): DataFrame =
    store(dir).readCat(s, "audio")
  def videoPostings(s: SparkSession, dir: String): DataFrame =
    store(dir).readCat(s, "video")
  def ledger(s: SparkSession, dir: String): DataFrame =
    store(dir).readCat(s, "ledger")

  /** The near-dup joins, SERVED FROM THE STORE — hash-identical to their
    * decode-path twins ([[Multimodal.imageNearDupPairs]] /
    * [[Multimodal.audioNearDupPairs]] / [[Multimodal.videoNearDupPairs]],
    * parity spec-pinned) with zero decode work: the joins read persisted
    * digests, so their cost is the banding/Jaccard exchange alone.
    * pinCatalog = false throughout — the catalogs' lineage is a parquet
    * scan, not a decode.
    */
  def imageNearDupPairs(s: SparkSession, dir: String,
      maxHamming: Int = 6, ordered: Boolean = true): DataFrame =
    Multimodal.hammingNearDupPairs(imageHashes(s, dir), "dhash", 64,
      maxHamming, pinCatalog = false, ordered = ordered)

  def audioNearDupPairs(s: SparkSession, dir: String,
      maxHamming: Int = 3, ordered: Boolean = true): DataFrame =
    Multimodal.hammingNearDupPairs(audioFingerprints(s, dir), "afp",
      audioBitsOf(s, dir), maxHamming, pinCatalog = false,
      ordered = ordered)

  def videoNearDupPairs(s: SparkSession, dir: String,
      minJaccard: Double = 0.8, maxVideosPerFrame: Int = 0,
      ordered: Boolean = true): DataFrame =
    Multimodal.videoJaccardPairs(videoPostings(s, dir), minJaccard,
      maxVideosPerFrame, pinPostings = false, ordered = ordered)

  /** Fold the per-batch file sprawl — [[graft.io.BatchStore.compact]]. */
  def compact(s: SparkSession, dir: String): Unit = store(dir).compact(s)

  /** Count of live data files per catalog — the [[compact]] trigger a
    * live ingest loop polls.
    */
  def dataFileCount(s: SparkSession, dir: String): Int =
    store(dir).dataFileCount(s)

  /** Roll back (or forward) a torn vacuum/compact —
    * [[graft.io.BatchStore.recover]].
    */
  def recover(s: SparkSession, dir: String): Boolean = store(dir).recover(s)

  type VacuumStats = BatchStore.VacuumStats

  /** Reclaim the store after media deletion — the right-to-be-forgotten
    * path a 100 TB media catalog cannot skip: drop every catalog and
    * ledger row whose doc_id is absent from `liveDocs` (the retention
    * set). A vacuumed id is fully forgotten — a later [[append]] of the
    * same id re-ingests it fresh (the ledger row is gone), which is
    * exactly right for a deletion followed by a legitimate re-upload.
    * Mechanics (dirty-file cost shape, snapshot-pointer swap, grace +
    * reap): [[graft.io.BatchStore.vacuumByDocId]].
    */
  def vacuum(s: SparkSession, dir: String,
      liveDocs: DataFrame): VacuumStats =
    store(dir).vacuumByDocId(s, liveDocs)

  /** Eagerly reap retired files — [[graft.io.BatchStore.reapRetired]]. */
  def reapRetired(s: SparkSession, dir: String): Int =
    store(dir).reapRetired(s)
}
