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
  * == Concurrency contract: single maintainer, snapshot-isolated readers ==
  *
  * One maintainer (bootstrap/append/compact/vacuum) at a time; any
  * number of readers, concurrent with ANY maintenance move. Reader
  * isolation is the Iceberg/Delta idiom in miniature — metadata-pointer
  * commits over immutable data files:
  *
  *   - Committed files are NEVER renamed or deleted by a completing
  *     maintenance move. [[vacuum]]/[[compact]] land their rewritten
  *     files under `fold-<token>-*` names ALONGSIDE the originals, then
  *     commit by publishing a new root snapshot (`_snapfiles-<k>` file
  *     list + `_snap-<k>` flag, max flag wins — the Ivf `_ready-N`
  *     idiom). The single flag-create is the atomic commit point.
  *   - Readers ([[imageHashes]] …) resolve the max `_snap-<k>` at plan
  *     time and scan exactly that snapshot's files, plus any
  *     `batch<tag>-*` files appended after it (appends are additive and
  *     never rewritten by the batch discipline, so including them is
  *     always consistent). A DataFrame planned BEFORE a vacuum/compact
  *     holds pre-swap file paths — all still on disk — and materializes
  *     the pre-maintenance snapshot correctly AFTER the swap.
  *   - Displaced originals are RETIRED, not deleted: recorded in the new
  *     snapshot's retired list and reaped (physically deleted) at the
  *     START of the NEXT maintenance move. The grace window is therefore
  *     one full maintenance cycle: a reader must not span two
  *     vacuum/compact rounds (the same bounded-staleness contract as
  *     Iceberg snapshot expiry / Delta VACUUM retention).
  *
  * Crash recovery is rollback-trivial under this scheme because
  * originals never move: a torn vacuum/compact leaves only INVISIBLE
  * junk (`fold-<token>-*` files no snapshot references, stage dirs, the
  * `_maint-inprogress-<token>` marker). [[recover]] deletes the junk and
  * drops the marker — no restore step exists to get wrong. If the crash
  * happened AFTER the snapshot flag committed, recover detects the
  * token in the current snapshot and rolls FORWARD (cleanup only).
  *
  * == Append idempotence: namespaced batch flags ==
  *
  * Every append runs under a batch TAG, lands its rows as
  * `batch<tag>-*`-prefixed files in each catalog, and commits a root
  * `_batch-<tag>` flag LAST. A replay of a flagged batch is a no-op; a
  * replay of an unflagged (crashed) batch first deletes that tag's file
  * remnants from all four catalogs — restoring the exactly-before-this-
  * batch state — and redoes the whole append, so replay rewrites, never
  * duplicates, and the one-row-per-item ledger invariant holds across
  * any number of retries.
  *
  * Tags live in two DISJOINT namespaces so a checkpointed stream and an
  * ad-hoc manual append can share a store without colliding:
  * caller-supplied ids (a streaming sink's foreachBatch —
  * [[graft.streaming.StreamOps.ingestMedia]]) use the bare numeric tag
  * (`_batch-<N>`); the self-allocating `batchId = -1` path draws from
  * the MANUAL namespace (`_batch-m<N>`). Without the namespace split, a
  * manual append between two stream batches could pre-commit the flag
  * the stream's next (real) batch id would present, silently no-opping
  * that micro-batch's ingestion.
  *
  * [[compact]] additionally rolls committed flags up into a per-
  * namespace WATERMARK (`_batchmark-<ns><N>` = "all ids 0..N in <ns>
  * are committed"), so a long-lived crawl doesn't accrue one root flag
  * file per micro-batch forever — the root listing stays O(exceptions),
  * not O(batches ever ingested).
  *
  * == Scale shape of [[append]] ==
  *
  * The new-id set is computed ids-only (doc_id anti-join against the
  * ledger — key-sized exchange), then the batch's blob rows are filtered
  * to new ids via a BROADCAST semi-join when the new-id set is
  * driver-safe, so the blob column never crosses an exchange; above the
  * broadcast bound it degrades to one BATCH-sized blob shuffle (never
  * store-sized). History parquet is read ids-only and never rewritten.
  */
object FingerprintStore {

  /** New-id sets up to this many rows ride a broadcast semi-join (ids
    * are 8 B each — 4M ids ≈ 32 MB, inside a sane driver); bigger
    * batches fall back to the shuffle semi-join.
    */
  private val BroadcastIdCap = 4000000L

  private val Catalogs = Seq("image", "audio", "video", "ledger")

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

  // ------------------------------------------------------------------
  // Batch flags: two namespaces + the compact-maintained watermark
  // ------------------------------------------------------------------

  /** The committed-batch view: explicit flags plus the per-namespace
    * watermarks compact folds old flags into. Loaded once per
    * operation (one root glob).
    */
  private final case class Flags(explicit: Set[String],
      streamMark: Long, manualMark: Long) {
    def committed(tag: String): Boolean =
      explicit(tag) || {
        val (ns, id) = splitTag(tag)
        id >= 0 && id <= (if (ns == "m") manualMark else streamMark)
      }
    def nextManualId: Long = {
      val flagged = explicit.iterator.filter(_.startsWith("m"))
        .flatMap(t => t.stripPrefix("m").toLongOption)
      (flagged ++ Iterator.single(manualMark)).max + 1L
    }
  }

  /** `"m12"` → ("m", 12); `"7"` → ("", 7); anything unparseable → id −1
    * (never watermark-covered, so only an explicit flag commits it).
    */
  private def splitTag(tag: String): (String, Long) =
    if (tag.startsWith("m"))
      ("m", tag.stripPrefix("m").toLongOption.getOrElse(-1L))
    else ("", tag.toLongOption.getOrElse(-1L))

  private def loadFlags(s: SparkSession, dir: String): Flags = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val flags = fs.globStatus(new Path(s"$dir/_batch-*"))
    val marks = fs.globStatus(new Path(s"$dir/_batchmark-*"))
    val explicit =
      if (flags == null) Set.empty[String]
      else flags.map(_.getPath.getName.stripPrefix("_batch-")).toSet
    val (sm, mm) =
      if (marks == null || marks.isEmpty) (-1L, -1L)
      else {
        val parsed = marks.toSeq
          .map(_.getPath.getName.stripPrefix("_batchmark-"))
          .map(splitTag)
        (parsed.collect { case ("", n) => n }.foldLeft(-1L)(math.max),
          parsed.collect { case ("m", n) => n }.foldLeft(-1L)(math.max))
      }
    Flags(explicit, sm, mm)
  }

  /** Is this caller-supplied (stream-namespace) batch id committed —
    * either its `_batch-<id>` flag survives, or compact rolled it into
    * the stream watermark? The check a foreachBatch sink runs before
    * deciding whether a replayed micro-batch has work to do.
    */
  def batchCommitted(s: SparkSession, dir: String, batchId: Long): Boolean =
    loadFlags(s, dir).committed(batchId.toString)

  /** Commit a stream-namespace batch flag directly (the bootstrap leg of
    * [[graft.streaming.StreamOps.ingestMediaBatch]], where the catalog
    * write is mode-overwrite-idempotent and [[append]] never runs).
    */
  def commitBatchFlag(s: SparkSession, dir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_batch-$batchId")
    val fs = fsOf(s, dir)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  // ------------------------------------------------------------------
  // Snapshots: the metadata-pointer commit readers resolve
  // ------------------------------------------------------------------

  /** One committed snapshot: per catalog, the live file NAMES the
    * snapshot references and the retired names awaiting reap. `token`
    * is the maintenance token that published it (how [[recover]] tells
    * a committed maintenance from a torn one).
    */
  private final case class Snapshot(k: Long, token: String,
      live: Map[String, Set[String]], retired: Map[String, Set[String]])

  private def currentSnapshot(s: SparkSession, dir: String)
      : Option[Snapshot] = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val flags = fs.globStatus(new Path(s"$dir/_snap-*"))
    if (flags == null || flags.isEmpty) return None
    val k = flags.map(_.getPath.getName.stripPrefix("_snap-").toLong).max
    val in = fs.open(new Path(s"$dir/_snapfiles-$k"))
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    var token = ""
    val live = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    val retired = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      line.split('\t') match {
        case Array("token", t) => token = t
        case Array(cat, "L", name) => live(cat) = live(cat) + name
        case Array(cat, "R", name) => retired(cat) = retired(cat) + name
        case other => sys.error(
          s"corrupt snapshot line in $dir/_snapfiles-$k: ${other.mkString("\t")}")
      }
    }
    Some(Snapshot(k, token, live.toMap.withDefaultValue(Set.empty),
      retired.toMap.withDefaultValue(Set.empty)))
  }

  /** Publish snapshot `k`: write the file list, then create the
    * `_snap-<k>` flag — the single atomic commit point. Older snapshot
    * metadata is dropped AFTER the flag (a crash between leaves extra
    * `_snap-*` files; max-wins makes that harmless and the next
    * maintenance cleans up).
    */
  private def publishSnapshot(s: SparkSession, dir: String, snap: Snapshot)
      : Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val sb = new StringBuilder
    sb.append("token\t").append(snap.token).append('\n')
    for (cat <- Catalogs) {
      snap.live(cat).toSeq.sorted
        .foreach(n => sb.append(cat).append("\tL\t").append(n).append('\n'))
      snap.retired(cat).toSeq.sorted
        .foreach(n => sb.append(cat).append("\tR\t").append(n).append('\n'))
    }
    val out = fs.create(new Path(s"$dir/_snapfiles-${snap.k}"), true)
    try out.write(sb.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.create(new Path(s"$dir/_snap-${snap.k}"), true).close()
    Seq("_snap-", "_snapfiles-").foreach { pre =>
      val old = fs.globStatus(new Path(s"$dir/$pre*"))
      if (old != null) old
        .filter(_.getPath.getName.stripPrefix(pre).toLong < snap.k)
        .foreach(f => fs.delete(f.getPath, false))
    }
  }

  /** The files a fresh read of `cat` scans: the current snapshot's live
    * list, plus `batch<tag>-*` files appended after it (present in the
    * listing, referenced by no snapshot). Pre-snapshot stores (bootstrap
    * crashed before its snapshot) fall back to the raw listing.
    */
  private def liveFiles(s: SparkSession, dir: String, cat: String)
      : Seq[String] = {
    val catDir = s"$dir/$cat"
    if (!fsOf(s, dir).exists(new org.apache.hadoop.fs.Path(catDir)))
      return Nil
    val listing = graft.io.StatsManifest.listParquet(s, catDir)
    currentSnapshot(s, dir) match {
      case None => listing
      case Some(snap) =>
        val (live, retired) = (snap.live(cat), snap.retired(cat))
        listing.filter { f =>
          val n = new org.apache.hadoop.fs.Path(f).getName
          live(n) || (n.startsWith("batch") && !retired(n) && !live(n))
        }
    }
  }

  /** Snapshot-resolved catalog read — every public accessor and the
    * append anti-join go through here, so retired-but-retained files
    * are invisible the instant the new snapshot commits.
    */
  private def readCat(s: SparkSession, dir: String, cat: String): DataFrame = {
    val files = liveFiles(s, dir, cat)
    if (files.isEmpty) s.read.parquet(s"$dir/$cat") // pre-snapshot/legacy
    else s.read.parquet(files: _*)
  }

  // ------------------------------------------------------------------
  // Decode + bootstrap + append
  // ------------------------------------------------------------------

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
    * shape). Decodes every row once. Commits by publishing snapshot 0
    * and (LAST) the `_audiobits` marker — a crash anywhere before the
    * marker re-runs bootstrap idempotently (all catalog writes are
    * mode-overwrite).
    */
  def bootstrap(s: SparkSession, media: DataFrame, dir: String,
      audioBits: Int = 32): Unit = {
    import org.apache.hadoop.fs.Path
    require(audioBits % 8 == 0 && audioBits >= 16 && audioBits <= 64,
      s"audioBits $audioBits: the banded serving join needs a multiple " +
        "of 8 in [16,64]")
    // a re-bootstrap must not leave a prior life's maintenance metadata
    // behind: a surviving marker/snapshot would make recover() or a
    // reader resurrect pre-bootstrap state over the fresh catalogs.
    // (_batch-* flags are KEPT — they are committed-batch history a
    // replaying stream checkpoint may still consult.)
    val fs0 = fsOf(s, dir)
    Seq("_maint-inprogress-*", "_snap-*", "_snapfiles-*", "_batchmark-*")
      .foreach { g =>
        val hits = fs0.globStatus(new Path(s"$dir/$g"))
        if (hits != null) hits.foreach(h => fs0.delete(h.getPath, false))
      }
    Catalogs.foreach(cat =>
      fs0.delete(new Path(s"$dir/.append-staged-$cat"), true))
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
    val live = Catalogs.map(cat => cat ->
      graft.io.StatsManifest.listParquet(s, s"$dir/$cat")
        .map(f => new Path(f).getName).toSet).toMap
    publishSnapshot(s, dir, Snapshot(0L, "bootstrap", live,
      Catalogs.map(_ -> Set.empty[String]).toMap))
    fs0.create(new Path(s"$dir/_audiobits-$audioBits"), true).close()
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

  /** Land `df`'s rows in `$dir/$cat` as `batch<tag>-*`-named files: write
    * to a staging dir, rename each data file in with the batch prefix,
    * drop the stage. The prefix is what makes a crashed batch's remnants
    * identifiable (and deletable) on replay — a bare mode("append")
    * write scatters anonymous part files that no retry could take back.
    */
  private def landBatchFiles(s: SparkSession, df: DataFrame, dir: String,
      cat: String, tag: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val stage = s"$dir/.append-staged-$cat"
    df.write.mode("overwrite").parquet(stage)
    fs.mkdirs(new Path(s"$dir/$cat"))
    graft.io.StatsManifest.listParquet(s, stage).zipWithIndex.foreach {
      case (f, i) =>
        val p = new Path(f)
        require(fs.rename(p,
          new Path(s"$dir/$cat", s"batch$tag-$i-${p.getName}")),
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
    * Idempotence: the batch lands as `batch<tag>-*` files per catalog
    * with a root `_batch-<tag>` flag committed LAST. Callers with their
    * own batch ids (a streaming sink's foreachBatch — see
    * [[graft.streaming.StreamOps.ingestMedia]]) pass `batchId` ≥ 0 and
    * get the bare numeric tag; the default −1 self-allocates the next
    * id in the MANUAL namespace (`m<N>` tags — see the class doc: the
    * namespaces are disjoint, so a manual append can never pre-commit a
    * flag a checkpointed stream's next batch would present). Either
    * way: committed tag → no-op; uncommitted tag → remnants of that tag
    * are deleted from every catalog before the batch runs, so a replay
    * after any crash point produces the exact append-equals-rebuild
    * catalogs (spec-pinned in EngineSpec).
    */
  def append(s: SparkSession, media: DataFrame, dir: String,
      batchId: Long = -1L): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    val flags = loadFlags(s, dir)
    val tag = if (batchId >= 0L) batchId.toString else s"m${flags.nextManualId}"
    if (flags.committed(tag)) return // committed batch replayed: no-op
    // a torn vacuum/compact left invisible junk and a marker — clean it
    // so this batch's work can't interleave with a half-done swap
    // (cheap glob when clean)
    recover(s, dir)
    // a crashed attempt at this tag left identifiable remnants — take
    // them back first, restoring the exactly-before-this-batch state
    // (in particular the ledger's view of "seen"), so the re-run below
    // neither duplicates digests nor skips re-decoding its own rows
    Catalogs.foreach { cat =>
      val hits = fs.globStatus(new Path(s"$dir/$cat/batch$tag-*"))
      if (hits != null) hits.foreach(h => fs.delete(h.getPath, false))
    }
    val audioBits = audioBitsOf(s, dir)
    val seen = readCat(s, dir, "ledger").select("doc_id")
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
      landBatchFiles(s, imgP, dir, "image", tag)
      landBatchFiles(s, audP, dir, "audio", tag)
      landBatchFiles(s, vidP, dir, "video", tag)
      val ids = fresh.select(col("doc_id"), col("meta.format").as("format"))
      landBatchFiles(s, ledgerOf(ids, imgP, audP, vidP), dir, "ledger", tag)
    }
    // the commit point — everything landed
    fs.create(new Path(s"$dir/_batch-$tag"), true).close()
  }

  def imageHashes(s: SparkSession, dir: String): DataFrame =
    readCat(s, dir, "image")
  def audioFingerprints(s: SparkSession, dir: String): DataFrame =
    readCat(s, dir, "audio")
  def videoPostings(s: SparkSession, dir: String): DataFrame =
    readCat(s, dir, "video")
  def ledger(s: SparkSession, dir: String): DataFrame =
    readCat(s, dir, "ledger")

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

  // ------------------------------------------------------------------
  // Maintenance: compact, vacuum, recover — snapshot-pointer commits
  // ------------------------------------------------------------------

  /** Start a maintenance move: stake the marker, roll back any PRIOR
    * torn maintenance, reap retired files whose grace (one maintenance
    * cycle) has expired, and delete remnants of torn appends so an
    * uncommitted batch's rows can never be folded into a snapshot the
    * batch's replay couldn't take back. Returns (token, the snapshot to
    * build on, its live file sets).
    */
  private def beginMaintenance(s: SparkSession, dir: String)
      : (String, Long, Map[String, Seq[String]]) = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    recover(s, dir)
    val token = java.util.UUID.randomUUID().toString
    fs.create(new Path(s"$dir/_maint-inprogress-$token"), true).close()
    // reap: the previous snapshot's retired files have had their one
    // round of grace — physically delete them now
    val prior = currentSnapshot(s, dir)
    prior.foreach { snap =>
      Catalogs.foreach { cat =>
        snap.retired(cat).foreach(n =>
          fs.delete(new Path(s"$dir/$cat/$n"), false))
      }
    }
    // torn-batch pre-clean: batch files whose tag never committed are a
    // crashed append's remnants; restore the before-batch state (the
    // replay will redo the whole batch) rather than folding them in
    val flags = loadFlags(s, dir)
    Catalogs.foreach { cat =>
      val hits = fs.globStatus(new Path(s"$dir/$cat/batch*"))
      if (hits != null) hits.foreach { h =>
        val tag = h.getPath.getName.stripPrefix("batch").takeWhile(_ != '-')
        if (!flags.committed(tag)) fs.delete(h.getPath, false)
      }
    }
    val k = prior.map(_.k).getOrElse(-1L)
    val live = Catalogs.map(cat => cat -> liveFiles(s, dir, cat)).toMap
    (token, k, live)
  }

  /** Finish a maintenance move: publish the new snapshot (IF any
    * catalog changed), roll committed batch flags up into the
    * per-namespace watermarks, and drop the marker. Watermark order is
    * crash-monotone: the new mark is created BEFORE the flags it covers
    * (and any older mark) are deleted, so no crash point ever makes a
    * committed batch look uncommitted.
    */
  private def finishMaintenance(s: SparkSession, dir: String, token: String,
      priorK: Long, newLive: Map[String, Set[String]],
      newRetired: Map[String, Set[String]]): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    if (newRetired.valuesIterator.exists(_.nonEmpty))
      publishSnapshot(s, dir, Snapshot(priorK + 1L, token, newLive, newRetired))
    val flags = loadFlags(s, dir)
    Seq("", "m").foreach { ns =>
      val mark = if (ns == "m") flags.manualMark else flags.streamMark
      val ids = flags.explicit.iterator.map(splitTag)
        .collect { case (`ns`, id) if id >= 0 => id }.toArray.sorted
      var wm = mark
      ids.foreach(id => if (id == wm + 1) wm = id)
      if (wm > mark) {
        fs.create(new Path(s"$dir/_batchmark-$ns$wm"), true).close()
        ids.takeWhile(_ <= wm).foreach(id =>
          fs.delete(new Path(s"$dir/_batch-$ns$id"), false))
        if (mark >= 0)
          fs.delete(new Path(s"$dir/_batchmark-$ns$mark"), false)
      }
    }
    fs.delete(new Path(s"$dir/_maint-inprogress-$token"), false)
  }

  /** Fold the per-batch file sprawl back to one write's worth of files
    * per catalog — the maintenance move a LIVE ingest loop needs: every
    * append lands ~shuffle-partitions files per catalog, so a crawl
    * delivering thousands of micro-batches grows each catalog to
    * hundreds of thousands of tiny files (the classic small-files
    * problem: listing cost, footer reads, and scan-task scheduling all
    * ride file COUNT at 100 TB, not bytes). One corpus-sized rewrite
    * per catalog, committed via the snapshot pointer: folded
    * replacements land as `fold-<token>-*` files alongside the
    * originals, invisible until the new `_snap-<k>` flag publishes —
    * readers planned mid-compact keep materializing the old snapshot.
    *
    * The `_batch-*` flags stay COMMITTED — compact rolls contiguous
    * prefixes of them up into the per-namespace `_batchmark-` watermark
    * (one root file instead of one per micro-batch ever ingested), and
    * the committed check consults flag-or-watermark, so a batch
    * replayed after its files were folded away still no-ops, and
    * [[append]]'s remnant-delete glob (`batch<tag>-*`) cannot match the
    * folded `fold-` names. Same single-maintainer contract as vacuum.
    */
  def compact(s: SparkSession, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.io.StatsManifest
    val fs = fsOf(s, dir)
    val (token, k, live) = beginMaintenance(s, dir)
    val newLive = scala.collection.mutable.Map[String, Set[String]]()
    val newRetired = scala.collection.mutable.Map[String, Set[String]]()
    Catalogs.foreach { cat =>
      val files = live(cat)
      // fold to a BYTES-derived file count (~128 MB each), not the scan's
      // partitioning: Spark splits a small-file read into
      // defaultParallelism partitions, so a bare rewrite would reproduce
      // the sprawl it is meant to fold
      val bytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
      val target = math.max(1, (bytes / (128L << 20)).toInt)
      if (files.length > target) {
        val staged = s"$dir/.compact-staged-$cat"
        s.read.parquet(files: _*).coalesce(target)
          .write.mode("overwrite").parquet(staged)
        val folded = StatsManifest.listParquet(s, staged).zipWithIndex.map {
          case (f, i) =>
            val p = new Path(f)
            val name = s"fold-$token-$i-${p.getName}"
            require(fs.rename(p, new Path(s"$dir/$cat", name)),
              s"compact: rename $f into $dir/$cat failed")
            name
        }
        fs.delete(new Path(staged), true)
        newLive(cat) = folded.toSet
        newRetired(cat) =
          files.map(f => new Path(f).getName).toSet
      } else {
        newLive(cat) = files.map(f => new Path(f).getName).toSet
        newRetired(cat) = Set.empty
      }
    }
    finishMaintenance(s, dir, token, k, newLive.toMap, newRetired.toMap)
  }

  /** Count of data files per catalog — the [[compact]] trigger a live
    * ingest loop polls (cheap: one recursive listing + the snapshot
    * read, no footers). Counts LIVE files only: retired-but-retained
    * files are invisible junk awaiting reap, not scan work.
    */
  def dataFileCount(s: SparkSession, dir: String): Int =
    Catalogs.map(cat => liveFiles(s, dir, cat).length).sum

  /** Roll back (or forward) a vacuum/compact that crashed mid-move —
    * the CODE form of the recovery contract, run automatically at the
    * head of every [[append]] and maintenance move. Because committed
    * files never move under the snapshot scheme, a torn maintenance
    * leaves only INVISIBLE junk; recovery is deletion, never
    * restoration:
    *
    *   - for each surviving `_maint-inprogress-<token>` marker: if the
    *     CURRENT snapshot carries that token, the move actually
    *     committed (crash landed between the snapshot flag and the
    *     marker delete) — roll FORWARD by dropping the marker alone;
    *     otherwise delete the token's `fold-<token>-*` files from every
    *     catalog (no snapshot references them) and drop the marker;
    *   - stage dirs of ALL three kinds (`.append-staged-*`,
    *     `.compact-staged-*`, `.vacuum-staged-*`) are dropped
    *     unconditionally — a crashed append's staging parquet is
    *     transient junk too, not just a crashed maintenance's.
    *
    * A clean store is a no-op. Returns true when a torn maintenance
    * marker was processed.
    */
  def recover(s: SparkSession, dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    Catalogs.foreach { cat =>
      Seq(s"$dir/.append-staged-$cat", s"$dir/.compact-staged-$cat",
        s"$dir/.vacuum-staged-$cat")
        .foreach(p => fs.delete(new Path(p), true))
    }
    val markers = fs.globStatus(new Path(s"$dir/_maint-inprogress-*"))
    if (markers == null || markers.isEmpty) return false
    val committedToken = currentSnapshot(s, dir).map(_.token)
    markers.foreach { m =>
      val token = m.getPath.getName.stripPrefix("_maint-inprogress-")
      if (!committedToken.contains(token)) {
        Catalogs.foreach { cat =>
          val hits = fs.globStatus(new Path(s"$dir/$cat/fold-$token-*"))
          if (hits != null) hits.foreach(h => fs.delete(h.getPath, false))
        }
      }
      fs.delete(m.getPath, false)
    }
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
    * size. The swap is the snapshot-pointer commit (class doc): the
    * dirty files' survivors land as `fold-<token>-*` files, the new
    * snapshot lists them live and the dirty originals retired, and the
    * originals stay on disk until the NEXT maintenance move reaps them —
    * so concurrent readers, including ones planned before the vacuum,
    * are never broken mid-scan. NOTE the privacy consequence of grace:
    * the forgotten rows' bytes leave disk one maintenance move later,
    * not at vacuum return ([[reapRetired]] forces it eagerly when the
    * deletion SLA demands).
    *
    * Concurrency: single maintainer, snapshot-isolated readers (class
    * doc) — readers need not pause; a second maintainer must not run.
    */
  def vacuum(s: SparkSession, dir: String,
      liveDocs: DataFrame): VacuumStats = {
    import org.apache.hadoop.fs.Path
    import graft.io.StatsManifest
    val fs = fsOf(s, dir)
    val live = liveDocs.select("doc_id").distinct().localCheckpoint(true)
    val (token, k, liveF) = beginMaintenance(s, dir)
    var dropped = 0L
    var rewritten = 0
    var untouched = 0
    val newLive = scala.collection.mutable.Map[String, Set[String]]()
    val newRetired = scala.collection.mutable.Map[String, Set[String]]()
    Catalogs.foreach { cat =>
      val allFiles = liveF(cat)
      newLive(cat) = allFiles.map(f => new Path(f).getName).toSet
      newRetired(cat) = Set.empty
      if (allFiles.nonEmpty) {
        // ONE ids-only pass yields the dead total and the dirty file
        // list together (the ChunkStore.vacuum shape)
        val deadPerFile = s.read.parquet(allFiles: _*)
          .withColumn("f", StatsManifest.normalizedInputFile())
          .select("doc_id", "f")
          .join(live, Seq("doc_id"), "left_anti")
          .groupBy("f").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val dirty = deadPerFile.keySet
        dropped += deadPerFile.values.sum
        untouched += allFiles.count(f => !dirty(f))
        if (dirty.nonEmpty) {
          val staged = s"$dir/.vacuum-staged-$cat"
          // the staging scan opens ONLY the dirty files — a filter on
          // the input_file_name-derived column over the full-store frame
          // would read every clean file's pages too (UDF filters don't
          // push down)
          s.read.parquet(dirty.toSeq: _*)
            .join(live, Seq("doc_id"), "left_semi")
            .write.mode("overwrite").parquet(staged)
          val folded = StatsManifest.listParquet(s, staged).zipWithIndex
            .map { case (f, i) =>
              val p = new Path(f)
              val name = s"fold-$token-$i-${p.getName}"
              require(fs.rename(p, new Path(s"$dir/$cat", name)),
                s"vacuum: rename $f into $dir/$cat failed")
              name
            }
          fs.delete(new Path(staged), true)
          val dirtyNames = dirty.map(f => new Path(f).getName)
          newLive(cat) = (newLive(cat) -- dirtyNames) ++ folded
          newRetired(cat) = dirtyNames
          rewritten += dirty.size
        }
      }
    }
    finishMaintenance(s, dir, token, k, newLive.toMap, newRetired.toMap)
    VacuumStats(dropped, rewritten, untouched)
  }

  /** Eagerly reap the CURRENT snapshot's retired files without waiting
    * for the next maintenance move — the hook a hard deletion SLA calls
    * after [[vacuum]] returns, once in-flight readers planned before
    * the vacuum have drained (the caller owns that quiesce; reaping
    * under a still-running pre-vacuum scan is exactly the breakage the
    * grace window exists to prevent). Publishes a successor snapshot
    * with an empty retired set so a later maintenance doesn't re-reap.
    */
  def reapRetired(s: SparkSession, dir: String): Int = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(s, dir)
    currentSnapshot(s, dir) match {
      case None => 0
      case Some(snap) =>
        val n = Catalogs.map { cat =>
          val names = snap.retired(cat)
          names.foreach(nm => fs.delete(new Path(s"$dir/$cat/$nm"), false))
          names.size
        }.sum
        if (n > 0)
          publishSnapshot(s, dir, Snapshot(snap.k + 1L, snap.token,
            snap.live, Catalogs.map(_ -> Set.empty[String]).toMap))
        n
    }
  }
}
