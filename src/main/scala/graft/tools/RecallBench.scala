package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Similarity}

/** ANN QUALITY readout — recall@k of the IVF store's serving paths
  * against brute-force cosine ground truth, per ScaleGen decade. Speed
  * without recall is a lie in an ANN system: the SLOPES sweeps pin that
  * the probes stay flat while the corpus grows 100×, and this harness
  * pins what those probes actually FIND, separating the two ways an
  * IVF-PQ serving stack loses truth:
  *
  *   - COARSE-PRUNE loss (nprobe): `annFromStore` ranks exactly inside
  *     the probed cells, so its only loss is true neighbors living in
  *     unprobed cells. Swept nprobe 1 → 4 on the generator's 10-cell
  *     store and 1 → 8 on the operated √n-cell store (the cells lever
  *     the fourth sweep measures for cost, here measured for recall —
  *     the two halves of the same operating decision).
  *   - QUANTIZATION loss (PQ): `annPqFromStore` under an EXHAUSTIVE
  *     probe has zero prune loss by construction, so its miss rate is
  *     purely the m=8 codebook's distortion; the same probe at nprobe=2
  *     shows the composed stack a deployment actually serves.
  *
  * Ground truth is the exact cosine top-k (`Similarity.cosineSafe`,
  * ties broken by vec_id exactly like the serving paths) over the full
  * corpus, for `Queries` evenly-spaced query vectors drawn FROM the
  * corpus. Driver-side per-query loops are fine here: this is a quality
  * harness over k-row results, not a throughput path — the serving
  * plans it exercises are the partition-pruned scans SLOPES times.
  *
  * Output: one JSON line per decade dir into `recall_out.json`,
  * `{"dir":…,"queries":{"<config>":<mean recall@10>}}` — the same shape
  * slope_out.json carries, so the SLOPES.md tables read identically.
  */
object RecallBench {

  private val K = 10
  private val Queries = 20

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallBench <decade-dir> [dir ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder
    args.foreach { dir =>
      val line = measure(spark, dir)
      println(line)
      out.append(line).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("recall_out.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  private def rm(s: SparkSession, d: String): Unit =
    new org.apache.hadoop.fs.Path(d)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(d), true)

  private def measure(s: SparkSession, dir: String): String = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding")
    val maxId = e.agg(max("vec_id")).head().getLong(0)
    val step = math.max(1L, maxId / Queries)
    val qids = (0L until Queries.toLong).map(_ * step).distinct
    val qembs: Seq[(Long, Array[Float])] = e
      .filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      .sortBy(_._1)

    def topIds(df: DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact: Map[Long, Set[Long]] = qembs.map { case (id, q) =>
      id -> topIds(e.select(col("vec_id"),
          Similarity.cosineSafe(col("embedding"), typedLit(q)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(K))
    }.toMap
    def recall(ann: Array[Float] => DataFrame): Double =
      qembs.map { case (id, q) =>
        (topIds(ann(q)) & exact(id)).size.toDouble / K
      }.sum / qembs.size

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // the generator's fixed 10-cell store, PQ enabled on top of it
    val s1 = java.nio.file.Files.createTempDirectory("graft-recall-f").toString
    Ivf.bootstrapStore(s, e, s1)
    Ivf.enablePq(s, s1, m = 8, ksub = 16, iters = 3)
    val cells1 = Ivf.servingCentroids(s, s1).count().toInt
    Seq(1, 2, 4).foreach { np =>
      results(s"exact_np$np") =
        recall(q => Ivf.annFromStore(s, s1, q, k = K, nprobe = np))
    }
    results("adc_np2") =
      recall(q => Ivf.annPqFromStore(s, s1, q, k = K, nprobe = 2))
    results("adc_exhaustive") =
      recall(q => Ivf.annPqFromStore(s, s1, q, k = K, nprobe = cells1))
    // IVFADC+R: the exact refine of the 4k-deep ADC shortlist — the
    // recall lever AFTER the on-disk m/ksub are fixed, priced at
    // refine×k embedding rows per query instead of the probed fifth
    results("refined_np2") =
      recall(q => Ivf.annPqRefined(s, s1, q, k = K, nprobe = 2, refine = 4))
    // the CODEBOOK-WIDTH lever: re-running enablePq is the quantizer
    // retrain, so sweep ksub 16 → 256 (4-bit → the published-standard
    // 8-bit codes; Jégou et al. 2011 run 256) on the same store and
    // measure what the extra 4 bits/subspace buy in pure quantization
    // recall — the operating-point decision a deployment makes, priced
    // in recall here and in bytes/rewrite-cost by the SLOPES sweeps
    Ivf.enablePq(s, s1, m = 8, ksub = 256, iters = 3)
    results("adc256_np2") =
      recall(q => Ivf.annPqFromStore(s, s1, q, k = K, nprobe = 2))
    results("adc256_exhaustive") =
      recall(q => Ivf.annPqFromStore(s, s1, q, k = K, nprobe = cells1))
    results("refined256_np2") =
      recall(q => Ivf.annPqRefined(s, s1, q, k = K, nprobe = 2, refine = 4))
    // the SHORTLIST-DEPTH lever: where refine=4 saturates below the
    // prune ceiling (large decades push true neighbors past rank 40 in
    // ADC order), a 160-deep shortlist should close back on exact_np2 —
    // measured, so the depth-vs-bytes tradeoff is a curve, not a remark
    results("refined256_np2_r16") =
      recall(q => Ivf.annPqRefined(s, s1, q, k = K, nprobe = 2, refine = 16))
    rm(s, s1)

    // the LSH scale path (the q_l12 family): the TABLES lever at the
    // registered bits=6 width — OR-amplification's recall curve per
    // decade, beside the IVF paths' nprobe curve above. Candidates are
    // bucket-mates in ANY table, exact cosine re-ranks — so like
    // exact_np*, the only loss is true neighbors hashing into no
    // shared bucket.
    Seq(1, 4, 14).foreach { t =>
      results(s"lsh_t$t") =
        recall(q => Similarity.annLshVec(s, dir, q, k = K, tables = t))
    }

    // the OPERATED store: cells ≈ √n (the fourth sweep's cost lever,
    // here its recall price) — finer cells shrink the probed fraction
    // AND the chance a true neighbor's cell is probed
    val n = e.count()
    val kc = math.max(10L, math.sqrt(n.toDouble).toLong)
    val s2 = java.nio.file.Files.createTempDirectory("graft-recall-s").toString
    Ivf.bootstrapStore(s, e.withColumn("label", pmod(col("vec_id"), lit(kc))), s2)
    Seq(1, 2, 8).foreach { np =>
      results(s"sqrtn_np$np") =
        recall(q => Ivf.annFromStore(s, s2, q, k = K, nprobe = np))
    }
    rm(s, s2)

    // the STREAMING-built store vs its batch-built twin (r14, verdict
    // item): StreamOps.ingestVectors drives the store through its
    // foreachBatch body with the stream's batch ids, so a store built
    // by streaming arrival — bootstrap-from-first-batch marker protocol
    // included — must serve IDENTICAL recall to a twin built with the
    // batch API from the same splits. Both rows are emitted; any gap
    // between them is a protocol bug, not an operating-point trade.
    val cut2 = maxId / 2
    val slice = (maxId - cut2) / 3 + 1
    val batches = (0 until 3).map(b => e.filter(
      col("vec_id") > cut2 + b * slice &&
        col("vec_id") <= cut2 + (b + 1) * slice))
    val s3 = java.nio.file.Files.createTempDirectory("graft-recall-st").toString
    val s4 = java.nio.file.Files.createTempDirectory("graft-recall-bt").toString
    graft.streaming.StreamOps.ingestVectorsBatch(
      e.filter(col("vec_id") <= cut2), 0L, s3, driftThreshold = 10.0)
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamOps.ingestVectorsBatch(b, i + 1L, s3,
        driftThreshold = 10.0)
    }
    Ivf.bootstrapStore(s, e.filter(col("vec_id") <= cut2), s4)
    batches.zipWithIndex.foreach { case (b, i) =>
      Ivf.maintainIndex(s, s4, b, i + 1L, driftThreshold = 10.0)
    }
    results("stream_np2") =
      recall(q => Ivf.annFromStore(s, s3, q, k = K, nprobe = 2))
    results("batchtwin_np2") =
      recall(q => Ivf.annFromStore(s, s4, q, k = K, nprobe = 2))
    // r15 (verdict item): the arrival-mode-irrelevance claim must hold
    // for the COMPRESSED serving path too — enablePq at the measured
    // serving defaults (m=8, ksub=256) on BOTH stores, then the ADC
    // probe and the ADC+R refine (refine=16, the measured default).
    // The codebook trains on the store's vector set, which is identical
    // by construction, so any stream-vs-batch gap in these rows is a
    // protocol bug surfacing, not an operating-point trade.
    Ivf.enablePq(s, s3, iters = 3)
    Ivf.enablePq(s, s4, iters = 3)
    results("stream_adc_np2") =
      recall(q => Ivf.annPqFromStore(s, s3, q, k = K, nprobe = 2))
    results("batchtwin_adc_np2") =
      recall(q => Ivf.annPqFromStore(s, s4, q, k = K, nprobe = 2))
    results("stream_adcr_np2") =
      recall(q => Ivf.annPqRefined(s, s3, q, k = K, nprobe = 2))
    results("batchtwin_adcr_np2") =
      recall(q => Ivf.annPqRefined(s, s4, q, k = K, nprobe = 2))
    rm(s, s3); rm(s, s4)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    s"""{"dir":"$dir","queries":{$qs}}"""
  }
}
