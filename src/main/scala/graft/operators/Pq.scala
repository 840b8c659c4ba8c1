package graft.operators

import graft.Tables
import graft.functions.{PqCodebook, PqCodec, VectorCentroid}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression half
  * of the IVF-ADC serving stack [[Ivf]] provides the cell half of:
  * vectors are unit-normalized (so squared L2 is monotone with the
  * engine's cosine convention), split into `m` subspaces, and each
  * subspace quantized to one of `ksub` learned centroids. A 64-dim
  * float vector (256 bytes) becomes `m` small codes (m bytes at
  * ksub=256) plus one shared O(m × ksub × dsub) codebook — the corpus
  * an ANN serving tier holds in memory shrinks ~32×, and a query scans
  * codes with `m` table lookups per row (ADC) instead of any vector
  * arithmetic.
  *
  * Spark shapes: encode is the [[graft.functions.PqEncode]] codegen
  * expression (map-only, zero shuffle at any corpus size), ADC is
  * [[graft.functions.PqAdc]] over a driver-built O(m × ksub) table,
  * and training is the same broadcast-assign / typed-re-centroid loop
  * as [[Ivf.kmeans]], run per subspace — only O(m × ksub) centroid
  * rows ever reach the driver.
  */
object Pq {

  /** The deterministic ARITHMETIC codebook behind the oracle-checked
    * q_l56: centroid coordinate (sub, code, i) is a pure function of
    * integer arithmetic — `((sub·ksub + code)·dsub + i + 1) · 2654435761
    * mod 1000003 mod 2001`, recentred to [-1, 1] — the same
    * regenerate-from-arithmetic discipline as [[graft.functions
    * .SignSketch]]/[[graft.functions.JlProject]], so the DuckDB twin
    * rebuilds the identical codebook from SQL alone and the ADC ranking
    * can be value-compared end-to-end. Quantization QUALITY is the
    * trained codebook's job ([[trainCodebook]], spec-tier); this one
    * exists so the encode/ADC machinery itself has an exact oracle.
    */
  def hashCodebook(m: Int, ksub: Int, dsub: Int): PqCodebook =
    new PqCodebook(m, dsub, ksub,
      Array.tabulate(m * ksub) { mc =>
        Array.tabulate(dsub) { i =>
          ((mc.toLong * dsub + i + 1) * 2654435761L % 1000003L % 2001L
            - 1000L).toDouble / 1000.0
        }
      })

  /** PQ-encode a corpus: (vec_id, codes array<int>). Map-only; rows of
    * the wrong dimension are dropped (PqEncode yields NULL for them).
    */
  def encode(embeddings: DataFrame, cb: PqCodebook): DataFrame =
    embeddings
      .withColumn("codes", PqCodec.pqEncode(col("embedding"), cb))
      .filter(col("codes").isNotNull)
      .select(col("vec_id"), col("codes"))

  /** The unit-normalized query vector, same left-fold norm as the
    * encode expression and its SQL twin.
    */
  private def normalized(q: Array[Float]): Array[Double] = {
    var norm = 0.0
    var i = 0
    while (i < q.length) { val x = q(i).toDouble; norm += x * x; i += 1 }
    val nrm = math.sqrt(norm)
    q.map(_.toDouble / nrm)
  }

  /** The O(m × ksub) ADC lookup table for one query: entry (sub, code)
    * is the exact squared L2 from the query's sub-slice to that
    * centroid — the only place the query's floats are touched; the
    * corpus scan then adds m table entries per row.
    */
  def adcTable(q: Array[Float], cb: PqCodebook): Array[Double] = {
    val v = normalized(q)
    require(v.length == cb.dim, s"query dim ${v.length} != ${cb.dim}")
    Array.tabulate(cb.m * cb.ksub) { mc =>
      val sub = mc / cb.ksub
      val c = cb.cents(mc)
      var d = 0.0
      var j = 0
      while (j < cb.dsub) {
        val diff = v(sub * cb.dsub + j) - c(j)
        d += diff * diff
        j += 1
      }
      d
    }
  }

  /** ADC top-k: ONE map-only pass over the corpus (encode + m lookups
    * per row fused in the same whole-stage-codegen stage) into a TopK
    * sort — no shuffle before the k-row reduction, the plan a
    * compressed serving scan must have at 100 TB.
    */
  def adcTopK(s: SparkSession, d: String, cb: PqCodebook,
      queryVecId: Long = 0, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === queryVecId).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val table = adcTable(q, cb)
    e.filter(col("vec_id") =!= queryVecId)
      .withColumn("codes", PqCodec.pqEncode(col("embedding"), cb))
      // drop malformed rows (NULL codes) BEFORE ranking: ascending
      // order puts NULLs first in Spark, so an unfiltered wrong-
      // dimension row would sit at the top of the ANN result
      .filter(col("codes").isNotNull)
      .select(col("vec_id"),
        PqCodec.pqAdc(col("codes"), table, cb.m, cb.ksub).as("adist"))
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(k)
  }

  /** Q-L56 — PQ ADC top-10 under the arithmetic codebook (m=8 subspaces
    * × 16 codes over the 64-dim corpus), oracle-checked value-exact:
    * the DuckDB twin regenerates the codebook, re-encodes every vector,
    * and re-ranks with the same left-fold arithmetic.
    */
  def qL56(s: SparkSession, d: String): DataFrame =
    adcTopK(s, d, hashCodebook(m = 8, ksub = 16, dsub = 8))

  /** ADC+R — [[adcTopK]]'s compressed ranking with an exact REFINE pass
    * (Jégou et al., TPAMI 2011 §VI, the same two-pass shape as
    * [[Ivf.annPqRefined]] serves from the persisted store): ADC ranks a
    * shortlist of `refine × k` candidates from codes alone, then ONE
    * id-filtered read re-ranks just those rows by exact cosine. The
    * shortlist ids are driver-sized (refine × k longs), so the second
    * pass is a pushed-down `vec_id IN` scan — at 100 TB the embedding
    * bytes read are bounded by the row groups holding refine × k rows
    * (parquet min/max + dictionary pushdown), not the corpus: the
    * recall-vs-bytes lever AFTER the on-disk m/ksub are fixed, priced
    * in recall by `tools/RecallBench`.
    */
  def adcRefineTopK(s: SparkSession, d: String, cb: PqCodebook,
      queryVecId: Long = 0, k: Int = 10, refine: Int = 4): DataFrame = {
    require(refine >= 1, s"refine $refine: shortlist must cover k")
    val e = Tables.embeddings(s, d)
    val shortlist = adcTopK(s, d, cb, queryVecId, refine * k)
      .collect().map(_.getLong(0)).toSeq
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    val hit = // empty shortlist (empty corpus): empty result, not isin()
      if (shortlist.isEmpty) e.filter(lit(false))
      else e.filter(col("vec_id").isin(shortlist: _*))
    hit.crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Q-L57 — ADC+R top-10 under the q_l56 arithmetic codebook,
    * oracle-checked value-exact end-to-end: the DuckDB twin regenerates
    * the codebook, re-encodes, ranks the same 40-deep ADC shortlist
    * (adist then vec_id — a total order, so the shortlist boundary is
    * deterministic on both engines), and re-ranks it with the q_l02
    * exact-cosine fold. The one query whose oracle crosses BOTH halves
    * of the compressed serving stack: quantized candidate generation
    * AND exact refinement.
    */
  def qL57(s: SparkSession, d: String): DataFrame =
    adcRefineTopK(s, d, hashCodebook(m = 8, ksub = 16, dsub = 8))

  /** IVFADC — the composed serving read: [[Ivf]]'s coarse quantizer
    * prunes the corpus to the `nprobe` cells nearest the query, and the
    * PQ ADC scan ranks WITHIN the probed cells. Both halves keep their
    * own shape (cell assignment and PQ encode are each one map-only
    * codegen pass; the centroid ranking is O(cells) driver metadata;
    * ADC is m lookups per surviving row), so the composition's plan is
    * a filtered scan → one codegen project → TakeOrdered — at 100 TB
    * the cell prune bounds what the ADC scan reads and the codes bound
    * what the serving tier holds in memory. With an exhaustive probe
    * this equals [[adcTopK]] exactly (spec-pinned); the nprobe < cells
    * operating point trades recall for read volume, the same lever the
    * persisted store measures in SLOPES.
    */
  def ivfAdcTopK(s: SparkSession, d: String, cb: PqCodebook,
      queryVecId: Long = 0, k: Int = 10, nprobe: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe: must probe at least one cell")
    val e = Tables.embeddings(s, d)
    val trained = Ivf.trainCentroids(s, e)
    val centroids = s.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    val index = Ivf.buildIndex(e, centroids)
    val q = e.filter(col("vec_id") === queryVecId).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val table = adcTable(q, cb)
    val probeCells = centroids
      .crossJoin(broadcast(e.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q_emb"))))
      .withColumn("c_sim", Similarity.cosineSafe(col("centroid"), col("q_emb")))
      .orderBy(col("c_sim").desc, col("cell")).limit(nprobe)
      .select("cell")
    index.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probeCells), Seq("cell"))
      .withColumn("codes", PqCodec.pqEncode(col("embedding"), cb))
      .filter(col("codes").isNotNull) // malformed rows must not rank first
      .select(col("vec_id"),
        PqCodec.pqAdc(col("codes"), table, cb.m, cb.ksub).as("adist"))
      .orderBy(col("adist").asc, col("vec_id"))
      .limit(k)
  }

  /** TRAIN a codebook per subspace: initial centroids are the
    * deterministic per-(vec_id mod ksub) slice means, refined by
    * `iters` Lloyd rounds — assign with the [[graft.functions
    * .PqEncode]] expression (map-only), re-centroid with the
    * [[VectorCentroid]] typed aggregate per (sub, code) group. A code
    * that captured no slices keeps its previous centroid (the
    * [[Ivf.kmeans]] carry-forward, per subspace). Training slices are
    * float-rounded unit-normalized values; encode normalizes in double
    * — the centroids are learned parameters, so the rounding moves
    * nothing observable.
    */
  def trainCodebook(s: SparkSession, embeddings: DataFrame, m: Int,
      ksub: Int, iters: Int = 3): PqCodebook = {
    import s.implicits._
    val dim = embeddings.select("embedding").head()
      .getAs[scala.collection.Seq[Float]](0).length
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    // (vec_id, sub, slice): the per-subspace training view — ONE codegen
    // pass ([[graft.functions.PqSlices]]; the HOF formulation this
    // replaces re-ran interpreted normalize folds m times per row and
    // dominated enablePq at scale), MATERIALIZED once: the init and
    // every Lloyd round's join re-read this checkpoint instead of
    // re-slicing the corpus per iteration
    val sliced = embeddings
      .select(col("vec_id"),
        posexplode(PqCodec.pqSlices(col("embedding"), m)).as(Seq("sub", "sl")))
      .localCheckpoint()
    def centroidsOf(assigned: DataFrame): Map[(Int, Int), Array[Float]] =
      assigned.select(col("sub").cast("int"), col("code").cast("int"), col("sl"))
        .as[(Int, Int, Array[Float])]
        .groupByKey(r => (r._1, r._2))
        .mapValues(_._3)
        .agg(VectorCentroid.toColumn.name("c"))
        .collect().map { case ((sub, code), c) => (sub, code) -> c }.toMap
    lazy val arithmetic = hashCodebook(m, ksub, dsub) // last-resort seed
    def toCodebook(centroidMap: Map[(Int, Int), Array[Float]],
        prev: Option[PqCodebook]): PqCodebook =
      new PqCodebook(m, dsub, ksub, Array.tabulate(m * ksub) { mc =>
        centroidMap.get((mc / ksub, mc % ksub)).map(_.map(_.toDouble))
          .orElse(prev.map(_.cents(mc))) // empty code: carry forward
          .getOrElse(arithmetic.cents(mc))
      })
    var cb = toCodebook(
      centroidsOf(sliced.withColumn("code", pmod(col("vec_id"), lit(ksub)))),
      None)
    (1 to iters).foreach { _ =>
      val assigned = embeddings
        .select(col("vec_id"), PqCodec.pqEncode(col("embedding"), cb).as("codes"))
        .filter(col("codes").isNotNull)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
        .join(sliced, Seq("vec_id", "sub"))
      cb = toCodebook(centroidsOf(assigned), Some(cb))
    }
    cb
  }
}
