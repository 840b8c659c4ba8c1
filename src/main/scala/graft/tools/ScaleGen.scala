package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus generator for the THIRD scale decade
  * (SLOPES): the driver's testdata tops out at sf0.1 (~5k documents),
  * which cannot expose candidate-driven growth in the LSH/pair-generation
  * family — band-collision fan-out grows with corpus², not rows, so a
  * superlinear plan looks flat until the corpus is big enough for
  * collisions to dominate. This generator reproduces the fixture tables'
  * SHAPE (documents / embeddings / supplier schemas, word-salad text over
  * the same small vocabulary, 20 sources, 5 langs, isotropic 64-dim
  * float embeddings, zero-padded supplier names) at any row count, from
  * pure splitmix64 functions of (seed, id) — regenerable anywhere, no
  * stored corpus.
  *
  * Two deliberate additions the fixtures lack, because dedup cost is
  * CANDIDATE-driven: ~1.5% of documents are near-duplicates of an
  * earlier doc (each word substituted with 5% probability) plus ~0.3%
  * exact duplicates, and ~2% of embeddings are small perturbations of an
  * earlier vector (cosine ≈ 0.999). Real corpora have duplicate mass;
  * a generator without it would measure the no-collision best case.
  *
  * Usage: runMain graft.tools.ScaleGen <outDir> <nDocs> [seed]
  * (embeddings = 2n/5 rows, supplier = n/5 — the fixture ratios).
  */
object ScaleGen {

  private val Vocab: Array[String] = Array(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "customer",
    "query", "big", "data", "column", "join", "small", "group", "stream",
    "order", "filter", "vector", "the", "a", "index", "shuffle", "broadcast",
    "cache", "stage", "task", "plan", "codegen", "parquet", "footer")

  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stream draw k of the (seed, id) chain: uniform non-negative long. */
  private def draw(seed: Long, id: Long, k: Long): Long =
    mix64(seed + id * 0x9e3779b97f4a7c15L + k * 0xbf58476d1ce4e5b9L) >>> 1

  /** The base word salad of doc `id`: 30..90 vocabulary words. */
  private def salad(seed: Long, id: Long): Array[String] = {
    val n = (draw(seed, id, 0) % 61L).toInt + 30
    Array.tabulate(n)(w =>
      Vocab((draw(seed, id, 100L + w) % Vocab.length).toInt))
  }

  private[tools] def docText(seed: Long, id: Long): String = {
    val kind = draw(seed, id, 1) % 1000L
    if (id >= 10 && kind < 3) {
      // exact duplicate of an earlier doc (0.3%)
      docText(seed, draw(seed, id, 2) % (id / 2))
    } else if (id >= 10 && kind < 18) {
      // near-duplicate (1.5%): each word substituted with 5% probability
      val base = draw(seed, id, 3) % (id / 2)
      val words = docTextWords(seed, base)
      words.zipWithIndex.map { case (w, i) =>
        if (draw(seed, id, 200L + i) % 100L < 5L)
          Vocab((draw(seed, id, 300L + i) % Vocab.length).toInt)
        else w
      }.mkString(" ")
    } else salad(seed, id).mkString(" ")
  }

  /** Word array of the doc's FINAL text (one recursion level: a near-dup
    * of a near-dup re-derives through docText — ids halve each hop, so
    * the chain terminates).
    */
  private def docTextWords(seed: Long, id: Long): Array[String] =
    docText(seed, id).split(" ")

  private[tools] def embedding(seed: Long, id: Long): Array[Float] = {
    val kind = draw(seed, 1L << 40 | id, 4) % 1000L
    if (id >= 10 && kind < 20) {
      // planted near-dup (2%): an earlier vector plus ±0.02 noise
      val base = draw(seed, 1L << 40 | id, 5) % (id / 2)
      embedding(seed, base).zipWithIndex.map { case (v, i) =>
        v + ((draw(seed, 1L << 41 | id, 500L + i) % 4001L).toInt - 2000) * 1e-5f
      }
    } else Array.tabulate(64)(i =>
      ((draw(seed, 1L << 40 | id, 600L + i) % 2000001L).toInt - 1000000) * 1e-6f)
  }

  def generate(s: SparkSession, outDir: String, nDocs: Long,
      seed: Long = 42L): Unit = {
    import s.implicits._
    val par = s.sparkContext.defaultParallelism
    val text = udf((id: Long) => docText(seed, id))
    s.range(0, nDocs, 1, par)
      .select(col("id").as("doc_id"), text(col("id")).as("text"),
        element_at(array(Seq("en", "de", "fr", "es", "pt").map(lit): _*),
          (pmod(col("id") * 2654435761L, lit(5)) + 1).cast("int")).as("lang"),
        concat(lit("src"), pmod(col("id") * 40503L, lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = udf((id: Long) => embedding(seed, id))
    s.range(0, nDocs * 2 / 5, 1, par)
      .select(col("id").as("vec_id"), emb(col("id")).as("embedding"),
        pmod(col("id"), lit(10)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    s.range(0, nDocs / 5, 1, math.max(1, (nDocs / 5000).toInt))
      .select(col("id").as("s_suppkey"),
        format_string("Supplier#%09d", col("id")).as("s_name"),
        pmod(col("id") * 2654435761L, lit(25)).cast("int").as("s_nationkey"),
        (pmod(col("id") * 48271L, lit(900000)) / 100.0 + 100.0).as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <outDir> <nDocs> [seed]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, args(0), args(1).toLong,
      if (args.length > 2) args(2).toLong else 42L)
    spark.stop()
  }
}
