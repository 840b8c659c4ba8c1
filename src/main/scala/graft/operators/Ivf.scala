package graft.operators

import graft.Tables
import graft.functions.VectorCentroid
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-flavored approximate nearest neighbor (driver mandate: "an IVF or
  * LSH-bucketed variant as the scale path" — LSH lives in
  * [[Similarity]]; this is the inverted-file variant).
  *
  * Train: one centroid per cell via the [[VectorCentroid]] typed
  * aggregator (cells seeded from the corpus label — a stand-in coarse
  * quantizer; k-means iterations would reuse exactly this
  * assign→re-centroid loop). Index: each vector assigned to its nearest
  * centroid cell — one narrow (cell, vec) table, broadcast-joined against
  * the tiny centroid set. Search: rank cells by query-to-centroid
  * similarity, scan only the top `nprobe` cells, exact cosine re-rank
  * inside. At 100 TB the index table is partitioned by cell, so a probe
  * touches nprobe partitions instead of the corpus.
  */
object Ivf {

  /** Shared re-centroid step: (cell, embedding) rows → (cell, centroid). */
  private def centroidsOf(s: SparkSession, assigned: DataFrame): DataFrame = {
    import s.implicits._
    assigned.select(col("cell").cast("string"), col("embedding"))
      .as[(String, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorCentroid.toColumn.name("centroid"))
      .toDF("cell", "centroid")
  }

  /** Centroids per cell: (cell, centroid: array<float>). */
  def trainCentroids(s: SparkSession, embeddings: DataFrame,
      cellCol: String = "label"): DataFrame =
    centroidsOf(s, embeddings.select(col(cellCol).as("cell"), col("embedding")))

  /** Lloyd's k-means refinement of the coarse quantizer: `iters` rounds of
    * assign (broadcast centroids, one corpus pass) → re-centroid (the
    * VectorCentroid aggregator). Only the k centroid vectors — O(cells)
    * metadata, not data — ever reach the driver. Initial centroids come
    * from the deterministic per-label means, so every run converges
    * identically.
    */
  def kmeans(s: SparkSession, embeddings: DataFrame, initial: DataFrame,
      iters: Int = 3): DataFrame = {
    var centroids = initial
    (0 until iters).foreach { _ =>
      val assigned = buildIndex(embeddings, centroids)
      val recomputed = centroidsOf(s, assigned)
      // a cell that captured no vectors this round would silently vanish
      // (shrinking k); carry its previous centroid forward instead
      val kept = centroids.join(recomputed, Seq("cell"), "left_anti")
      centroids = recomputed.unionByName(kept)
    }
    centroids
  }

  /** Mean within-cell cosine distance — the k-means objective, used to
    * check refinement actually tightens the cells.
    */
  def distortion(embeddings: DataFrame, centroids: DataFrame): Double =
    buildIndex(embeddings, centroids)
      .join(broadcast(centroids), Seq("cell"))
      .select(avg(lit(1.0) - Similarity.cosineSafe(col("embedding"), col("centroid"))))
      .first().getDouble(0)

  /** Assign every vector to its nearest centroid (broadcast the centroids,
    * one pass over the corpus).
    */
  def buildIndex(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(centroids))
      .withColumn("sim", Similarity.cosineSafe(col("embedding"), col("centroid")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cell"), col("vec_id"), col("embedding"))
  }

  /** Incremental index maintenance: assign ONLY the arriving batch
    * against the FROZEN serving centroids and union it in — the index
    * twin of the corpus-boundary contract every incremental operator
    * here honors (delta-dedup, manifest append, chunk-store append):
    * history is never re-assigned, the per-batch cost is one
    * batch-sized pass against O(cells) broadcast metadata. Because
    * assignment is a deterministic argmax over fixed centroids, the
    * appended index equals a full rebuild with the same centroids —
    * pinned in EngineSpec — so serving correctness never depends on
    * WHEN a vector arrived.
    */
  def appendIndex(index: DataFrame, newVecs: DataFrame,
      centroids: DataFrame): DataFrame =
    index.unionByName(buildIndex(newVecs, centroids))

  /** Per-cell centroid DRIFT after appends: cosine distance between each
    * frozen serving centroid and the true mean of the cell's CURRENT
    * members — the retrain trigger an IVF maintenance loop watches.
    * Frozen centroids keep assignment stable and cheap; once the data
    * distribution moves (new domains, new languages), cells stretch and
    * recall decays silently. This readout makes that visible: re-run
    * [[kmeans]] when max drift crosses the operating threshold. One
    * aggregate over the index + an O(cells) join — no corpus re-scan
    * beyond the per-cell mean.
    */
  def centroidDrift(s: SparkSession, index: DataFrame,
      frozen: DataFrame): DataFrame =
    // LEFT join FROM the frozen set: a cell whose members all drained
    // away must show up (n_members = 0, drift NULL), not silently vanish
    // from the very readout that exists to catch dead cells
    broadcast(frozen)
      .join(centroidsOf(s, index).withColumnRenamed("centroid", "current"),
        Seq("cell"), "left_outer")
      .join(index.groupBy("cell").agg(count(lit(1)).as("n")),
        Seq("cell"), "left_outer")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n_members"),
        when(col("current").isNull, lit(null).cast("double"))
          .otherwise(lit(1.0)
            - Similarity.cosineSafe(col("current"), col("centroid")))
          .as("drift"))
      .orderBy("cell")

  /** ANN query: probe the `nprobe` cells nearest the query vector. The
    * query embedding comes from the raw table (one pushed-filter scan, not
    * the index lineage) and the centroid set — O(cells) — is cached so the
    * index and probe branches don't recompute the training aggregation.
    */
  def annIvf(s: SparkSession, d: String, queryVecId: Long = 0,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, d)
    // the centroid set is O(cells) metadata — localize it once instead of
    // caching the training lineage, so repeated ANN queries in a long-lived
    // session hold no executor cache (and the index + probe branches still
    // share one materialization)
    val trained = trainCentroids(s, e)
    val centroids = s.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val index = buildIndex(e, centroids)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    val probeCells = centroids.crossJoin(broadcast(q))
      .withColumn("c_sim", Similarity.cosineSafe(col("centroid"), col("q_emb")))
      .orderBy(col("c_sim").desc).limit(nprobe)
      .select("cell")
    index.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probeCells), Seq("cell"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), Similarity.cosineSafe(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Q-L14 — IVF ANN top-10, oracle-checked against the exact brute-force
    * answer. nprobe is pinned to the cell count (exhaustive probe): the
    * synthetic corpus is isotropic (max pairwise cosine ~0.51, no cluster
    * structure), so neighbors scatter uniformly over cells and ANY partial
    * probe drops some of the true top-10 — measured: even kmeans-refined
    * centroids at nprobe=8/10 miss. The full machinery still runs (rank
    * cells by query→centroid similarity, scan selected cells, exact
    * re-rank); on production corpora, which cluster, nprobe≪cells is the
    * operating point and the recall/nprobe trade is covered by
    * EngineSpec's distortion/kmeans properties.
    */
  def qL14(s: SparkSession, d: String): DataFrame = annIvf(s, d, nprobe = 10)

  // ---- persisted index store with automated drift-triggered retrain ----

  /** One maintenance round's report: the serving version AFTER the round,
    * the max per-cell drift observed against the serving centroids, and
    * whether that drift crossed the threshold and triggered a retrain.
    */
  final case class IvfMaintenance(version: Long, maxDrift: Double,
      retrained: Boolean)

  /** Version publication via APPEND-ONLY ready flags: version N serves
    * once `_ready-N` exists, and the current version is the max flagged
    * N. No flag is ever deleted or renamed, so there is no window where
    * a reader finds NO marker (the delete-then-rename flip this replaced
    * had one) and no torn content to read — the flag's existence IS the
    * signal, and a version directory is fully written BEFORE its flag.
    */
  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  private def readVersion(s: SparkSession, dir: String): Long = {
    val fs = fsOf(s, dir)
    val versions = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_ready-*"))
    require(versions != null && versions.nonEmpty,
      s"no IVF store at $dir — bootstrapStore first")
    versions.map(_.getPath.getName.stripPrefix("_ready-").toLong).max
  }

  private def publishVersion(s: SparkSession, dir: String, v: Long): Unit =
    fsOf(s, dir).create(
      new org.apache.hadoop.fs.Path(s"$dir/_ready-$v"), true).close()

  /** Every write into `v<N>/index` — bootstrap, retrain, append — lands in
    * its own `ingest_batch=<id>` partition (bootstrap/retrain use the
    * reserved id -1), sub-partitioned BY CELL. A UNIFORM layout is
    * load-bearing, not cosmetic: Spark's partition discovery over a
    * layout that mixes root-level files with `key=value` subdirectories
    * silently returns ONLY the subdirectory rows, so a flat bootstrap
    * index would vanish from every read the moment the first append
    * created a partition dir. The cell level is the SERVING layout: an
    * ANN probe filters `cell IN (<nprobe cells>)` and partition pruning
    * drops every other cell's files at planning time — the "a probe
    * touches nprobe partitions instead of the corpus" contract, real
    * instead of asserted (pinned on the executed plan in EngineSpec).
    */
  private val BootstrapBatch = -1L

  private def writeIndex(index: DataFrame, path: String): Unit =
    index.write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Per-cell (n, mean) statistics of an index slice — the O(cells)
    * summary that makes drift maintenance incremental (see
    * [[maintainIndex]]): the mean is the [[VectorCentroid]] aggregate,
    * the count a second batch-sized pass (two passes over a BATCH are
    * nothing; the corpus scan they replace is everything).
    */
  private def cellStatsOf(s: SparkSession, index: DataFrame): DataFrame =
    centroidsOf(s, index).withColumnRenamed("centroid", "mean")
      .join(index.groupBy(col("cell").cast("string").as("cell"))
        .agg(count(lit(1)).as("n")), Seq("cell"))

  private def writeCellStats(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(path)

  /** Drift without a corpus scan: merge the per-batch cell stats —
    * O(cells × batches) metadata rows, reset to O(cells) by every
    * retrain/compaction — into each cell's CURRENT mean
    * (Σ nᵢ·meanᵢ / Σ nᵢ per coordinate) and compare against the frozen
    * serving centroids. Exactly [[centroidDrift]]'s answer on an
    * append-only history (pinned within fp tolerance in EngineSpec);
    * after a [[deleteVectors]] the stats still count the tombstoned
    * vectors, so drift is STALE by at most the deleted mass until the
    * next corpus rewrite recomputes them — the documented trade for
    * appends that never rescan history.
    */
  private[graft] def incrementalMaxDrift(s: SparkSession, dir: String,
      v: Long): Double = {
    val stats = s.read.parquet(s"$dir/v$v/cellstats")
      .select(col("cell").cast("string").as("cell"), col("n"), col("mean"))
    val current = stats
      .select(col("cell"), col("n"), posexplode(col("mean")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      // explicit double: float × bigint coerces to FLOAT and the sums
      // would accumulate at float precision
      .agg(sum(col("x").cast("double") * col("n")).as("wx"),
        sum(col("n")).as("wn"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("wx") / col("wn")).cast("float").as("x")))),
        e => e("x")).as("current"))
    val frozen = s.read.parquet(s"$dir/v$v/centroids")
    broadcast(frozen).join(current, Seq("cell"), "left_outer")
      .select(when(col("current").isNull, lit(null).cast("double"))
        .otherwise(lit(1.0)
          - Similarity.cosineSafe(col("current"), col("centroid"))).as("drift"))
      .agg(max("drift")).head() match {
        case r if r.isNullAt(0) => 0.0
        case r                  => r.getDouble(0)
      }
  }

  /** Normalize an index read back to the [[buildIndex]] schema: `cell`
    * returns as an inferred-int PARTITION column and must come back as
    * the string the centroid tables carry, and the `ingest_batch`
    * bookkeeping column drops out.
    */
  private def readIndex(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .select(col("cell").cast("string").as("cell"),
        col("vec_id"), col("embedding"))

  /** Tombstoned vec_ids of version `v`, if any delete has landed. Delete
    * batches write `del_batch=<id>` partitions (the uniform-layout rule
    * applies to EVERY store directory, not just the index), so the set
    * is the union of all delete batches against this version.
    */
  private def tombstoneIds(s: SparkSession, dir: String,
      v: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/v$v/tombstones")
    if (fsOf(s, dir).exists(p))
      Some(s.read.parquet(p.toString).select("vec_id").distinct())
    else None
  }

  /** The serving view of version `v`: the index minus its tombstones.
    * The anti-join's strategy is left to Catalyst — the tombstone side
    * is bounded between compactions (each compaction/retrain drains it
    * to zero), so file-size stats broadcast it; no forced hint that
    * would pin a 100 TB plan to a driver-sized assumption.
    */
  private def servingView(s: SparkSession, dir: String, v: Long): DataFrame = {
    val idx = readIndex(s, s"$dir/v$v/index")
    tombstoneIds(s, dir, v) match {
      case Some(t) => idx.join(t, Seq("vec_id"), "left_anti")
      case None    => idx
    }
  }

  /** The serving centroid set / index of the CURRENT version. */
  def servingCentroids(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/v${readVersion(s, dir)}/centroids")
  def servingIndex(s: SparkSession, dir: String): DataFrame =
    servingView(s, dir, readVersion(s, dir))

  /** Bootstrap a persisted IVF store at `dir`: train centroids (label-
    * seeded, `kmeansIters` Lloyd refinements), build the index, publish
    * as version 0.
    */
  def bootstrapStore(s: SparkSession, embeddings: DataFrame, dir: String,
      kmeansIters: Int = 2): Unit = {
    val trained = kmeans(s, embeddings, trainCentroids(s, embeddings),
      iters = kmeansIters)
    val local = s.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    local.write.mode("overwrite").parquet(s"$dir/v0/centroids")
    writeIndex(buildIndex(embeddings.select("vec_id", "embedding"), local),
      s"$dir/v0/index/ingest_batch=$BootstrapBatch")
    // stats come from the WRITTEN files (a plain rescan beats re-running
    // the assignment window), seeding the incremental drift path
    writeCellStats(cellStatsOf(s, readIndex(s, s"$dir/v0/index")),
      s"$dir/v0/cellstats/ingest_batch=$BootstrapBatch")
    publishVersion(s, dir, 0L)
  }

  /** ANN against the PERSISTED store — the query-time path a serving
    * deployment runs, where the cell-partitioned layout earns its keep:
    * centroid ranking happens on O(cells) driver-side metadata, and the
    * index scan carries `cell IN (<nprobe>)` so partition pruning reads
    * ONLY the probed cells' files. Exact cosine re-rank inside the
    * probed cells, exactly like [[annIvf]].
    */
  def annFromStore(s: SparkSession, dir: String, qEmb: Array[Float],
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    val cents = servingCentroids(s, dir).collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeCells = cents
      .map(r => (r.getString(0), cos(qEmb, r.getSeq[Float](1).toArray)))
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nprobe).map(_._1).toSeq
    val q = typedLit(qEmb)
    // filter the RAW partition column, not the string-normalized view: a
    // predicate under cast(cell as string) does not reach
    // PartitionFilters, and the whole point of the layout is that the
    // non-probed cells' files never enter the scan. The literals are
    // cast to the column's discovered type so constant folding leaves a
    // plain partition-column IN-list.
    val v = readVersion(s, dir)
    val raw = s.read.parquet(s"$dir/v$v/index")
    val cellType = raw.schema("cell").dataType
    val pruned = raw.filter(probeCells
      .map(c => col("cell") === lit(c).cast(cellType)).reduce(_ || _))
    // tombstones apply AFTER the cell prune: the anti-join sits on top of
    // the partition-pruned scan, so a delete never widens what gets read
    val live = tombstoneIds(s, dir, v) match {
      case Some(t) => pruned.join(t, Seq("vec_id"), "left_anti")
      case None    => pruned
    }
    live
      .select(col("vec_id"),
        Similarity.cosineSafe(col("embedding"), q).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** DELETE vectors from the serving store (the right-to-be-forgotten
    * path a real corpus store cannot skip): the ids land as a tombstone
    * partition `v<N>/tombstones/del_batch=<id>`, and every serving read
    * — [[servingIndex]], [[annFromStore]], the drift readout inside
    * [[maintainIndex]] — anti-joins them out, so a deleted vector is
    * unservable the moment the write completes. PHYSICAL removal happens
    * at the next corpus rewrite: a [[compactStore]] or a drift-triggered
    * retrain builds the new version from the tombstone-filtered view, so
    * `v<N+1>` simply does not contain the rows (and carries no
    * tombstones). Same idempotence discipline as index appends: the
    * batch partition is OVERWRITE and a `_del-<id>` flag makes a replay
    * of a completed delete a no-op.
    */
  def deleteVectors(s: SparkSession, dir: String, ids: DataFrame,
      delBatchId: Long): Unit = {
    require(delBatchId >= 0,
      s"delBatchId $delBatchId: negative ids are reserved")
    val v = readVersion(s, dir)
    val flag = new org.apache.hadoop.fs.Path(s"$dir/_del-$delBatchId")
    val fs = fsOf(s, dir)
    if (fs.exists(flag)) return // completed delete replayed: no-op
    ids.select("vec_id").distinct().write.mode("overwrite")
      .parquet(s"$dir/v$v/tombstones/del_batch=$delBatchId")
    fs.create(flag, true).close()
  }

  /** COMPACT the serving version: rewrite bootstrap ∪ every appended
    * batch, minus tombstones, into a single `ingest_batch=-1` partition
    * of `v<N+1>` under the SAME centroids (compaction changes layout,
    * never assignment — pinned by set-equality in EngineSpec). This is
    * the maintenance move the append discipline requires at scale:
    * without it the index accumulates O(batches × cells) partition
    * directories of batch-sized files forever, and every tombstone stays
    * an anti-join at read time. After compaction the file count is
    * `cells × filesPerCell` and deleted rows are physically gone.
    *
    * `filesPerCell` is the write-parallelism knob: rows are hash-routed
    * to `(cell, vec_id % filesPerCell)` so at most `filesPerCell` tasks
    * write each cell's directory — 1 gives the tightest layout (one file
    * per cell, fine for a bench-sized store), a 100 TB store sets it so
    * `cells × filesPerCell` matches the cluster's write parallelism and
    * each file stays row-group-sized. Publication is the same staged
    * contract as a retrain: `v<N+1>` is complete before its append-only
    * `_ready` flag, so concurrent readers resolve a whole version.
    * Replays of pre-compaction ingest/delete batches stay no-ops — their
    * `_batch-*`/`_del-*` flags persist — so a restarted upstream can
    * never double-apply into the compacted version.
    */
  def compactStore(s: SparkSession, dir: String, filesPerCell: Int = 1): Long = {
    require(filesPerCell >= 1, s"filesPerCell $filesPerCell")
    val v = readVersion(s, dir)
    s.read.parquet(s"$dir/v$v/centroids")
      .write.mode("overwrite").parquet(s"$dir/v${v + 1}/centroids")
    writeIndex(
      servingView(s, dir, v)
        .repartition(col("cell"), pmod(hash(col("vec_id")), lit(filesPerCell))),
      s"$dir/v${v + 1}/index/ingest_batch=$BootstrapBatch")
    // the rewrite also resets the stats sidecar to O(cells) rows — and
    // back to EXACT after any deletes (tombstone-era stats are stale by
    // the deleted mass; see incrementalMaxDrift)
    writeCellStats(cellStatsOf(s, readIndex(s, s"$dir/v${v + 1}/index")),
      s"$dir/v${v + 1}/cellstats/ingest_batch=$BootstrapBatch")
    publishVersion(s, dir, v + 1) // staged dirs complete before the flag
    v + 1
  }

  /** One maintenance round, closing the [[centroidDrift]] loop: append
    * the arriving batch against the FROZEN serving centroids (the
    * [[appendIndex]] contract — history is never re-assigned, per-batch
    * cost is one batch-sized pass PLUS an O(cells × batches) metadata
    * merge via the cellstats sidecar, never a history rescan), read the
    * drift, and when max drift crosses `driftThreshold`, RETRAIN: re-centroid from the current
    * members, `kmeansIters` Lloyd refinements over the full index, a
    * full re-assignment, and a staged publication (the new `v<N+1>/` is
    * written COMPLETELY before its append-only `_ready` flag appears, so
    * a reader resolves either version N or N+1 whole — the VERSION swap
    * is never torn). Consistency granularity is the version for
    * retrains and the batch for appends: a batch lands as its own
    * `ingest_batch=<batchId>` partition inside the serving version, so a
    * RETRY of the same batchId overwrites rather than duplicates (the
    * streaming-sink discipline), and a `_batch-<id>` flag makes a
    * completed round a no-op on replay; a reader listing the serving
    * index concurrently with an in-flight append may see that one
    * batch's files partially (the standard file-sink caveat — the
    * ingestWithManifest contract documents the same), never a torn
    * RETRAIN. The retrain pass is corpus-sized — which is exactly when a
    * real deployment runs it: drift says recall is silently decaying,
    * and the readout makes the cost explicit instead of perpetual.
    */
  def maintainIndex(s: SparkSession, dir: String, newVecs: DataFrame,
      batchId: Long, driftThreshold: Double = 0.3,
      kmeansIters: Int = 2): IvfMaintenance = {
    require(batchId >= 0,
      s"batchId $batchId: negative ids are reserved for bootstrap/retrain")
    val v = readVersion(s, dir)
    val batchFlag = new org.apache.hadoop.fs.Path(s"$dir/_batch-$batchId")
    val fs = fsOf(s, dir)
    if (fs.exists(batchFlag)) // completed round replayed: no-op
      return IvfMaintenance(v, 0.0, retrained = false)
    val frozen = s.read.parquet(s"$dir/v$v/centroids")
    // SELF-HEAL before the append: a store from before the cellstats
    // sidecar existed gets its stats seeded from the current index —
    // one corpus scan, once, never again
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v$v/cellstats")))
      writeCellStats(cellStatsOf(s, readIndex(s, s"$dir/v$v/index")),
        s"$dir/v$v/cellstats/ingest_batch=$BootstrapBatch")
    writeIndex(buildIndex(newVecs.select("vec_id", "embedding"), frozen),
      s"$dir/v$v/index/ingest_batch=$batchId")
    // the batch's own stats come from its freshly written partition (a
    // batch-sized rescan), and drift merges the stats sidecar instead of
    // re-aggregating the corpus: the per-append cost is O(batch) data +
    // O(cells × batches) metadata, not a history rescan — the difference
    // between an append pipeline that scales and one that quietly
    // re-reads 100 TB per batch. OVERWRITE keeps a same-batch replay
    // after a crash between the two writes consistent.
    writeCellStats(
      cellStatsOf(s, readIndex(s, s"$dir/v$v/index/ingest_batch=$batchId")),
      s"$dir/v$v/cellstats/ingest_batch=$batchId")
    val maxDrift = incrementalMaxDrift(s, dir, v)
    val result =
      if (maxDrift <= driftThreshold) IvfMaintenance(v, maxDrift, retrained = false)
      else {
        // the retrain is corpus-sized by nature and runs on the SERVING
        // view: tombstoned vectors neither pull centroids nor survive
        // into the retrained version
        val index = servingView(s, dir, v)
        val vecs = index.select("vec_id", "embedding")
        val retrained = kmeans(s, vecs, centroidsOf(s, index), iters = kmeansIters)
        val local = s.createDataFrame(
          java.util.Arrays.asList(retrained.collect(): _*), retrained.schema)
        local.write.mode("overwrite").parquet(s"$dir/v${v + 1}/centroids")
        writeIndex(buildIndex(vecs, local),
          s"$dir/v${v + 1}/index/ingest_batch=$BootstrapBatch")
        writeCellStats(cellStatsOf(s, readIndex(s, s"$dir/v${v + 1}/index")),
          s"$dir/v${v + 1}/cellstats/ingest_batch=$BootstrapBatch")
        publishVersion(s, dir, v + 1) // staged dirs complete before the flag
        IvfMaintenance(v + 1, maxDrift, retrained = true)
      }
    fs.create(batchFlag, true).close()
    result
  }
}
