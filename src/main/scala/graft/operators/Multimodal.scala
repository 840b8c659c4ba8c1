package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (driver mandate): image/audio/video payloads
  * travel as opaque `binary` columns next to a typed metadata struct; the
  * pipeline stages are decode → feature-extract → resize / frame-sample.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stand-in (STUB below) — but everything
  * Spark-side is real and at-scale-shaped: schema (binary + metadata
  * struct), partition-parallel `mapPartitions` over typed rows (the Scala
  * analog of mapInPandas batch processing: one iterator per partition, so
  * per-partition codec/model setup amortizes), and codegen expressions for
  * the cheap byte-level operations.
  */
object Multimodal {

  /** Typed media metadata — what StructField alone can't say about a blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Attach a deterministic synthetic media payload to each document: the
    * blob is the UTF-8 text bytes (stand-in for image data), metadata
    * derived from stable per-doc hashes. Real pipelines read
    * `spark.read.format("binaryFile")` or parquet with a binary column;
    * the downstream operators only see (blob, meta) and don't care.
    */
  def withMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(xxhash64(col("doc_id")), lit(4)) + 1).cast("int")).as("format"),
        (pmod(xxhash64(col("doc_id"), lit(1)), lit(1920)) + 16).cast("int").as("width"),
        (pmod(xxhash64(col("doc_id"), lit(2)), lit(1080)) + 16).cast("int").as("height"),
        (pmod(xxhash64(col("doc_id"), lit(3)), lit(300)) + 1).cast("int").as("n_frames"))
        .as("meta"))

  final case class MediaRow(doc_id: Long, blob: Array[Byte],
      format: String, width: Int, height: Int, n_frames: Int)
  final case class FeatureRow(doc_id: Long, features: Array[Float])

  /** ======================= STUB =======================
    * Deterministic fake "decode + embed": folds the raw bytes into a
    * fixed-size float vector. A real build replaces ONLY this function
    * with a codec/model call (e.g. JNI image decode); the partition
    * iteration, schema and batch shape around it stay identical.
    */
  def decodeAndEmbedStub(blob: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < blob.length) {
      out(i % dim) += (blob(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over the blob column: partition-parallel typed
    * mapPartitions (per-partition setup cost amortized across its rows —
    * where a codec or ONNX session would be initialized once).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handle, model session)
        rows.map(r => FeatureRow(r.doc_id, decodeAndEmbedStub(r.blob, dim)))
      }
      .toDF()
  }

  /** "Resize": crop the blob to its first `maxBytes` bytes — the plumbing
    * twin of an image resize (payload shrinks, schema unchanged; a real
    * codec-aware resize replaces the expression, not the plan). Pure
    * expression, stays in codegen.
    */
  def resize(media: DataFrame, maxBytes: Int = 1024): DataFrame =
    media.withColumn("blob_small",
      when(length(col("blob")) <= maxBytes, col("blob"))
        .otherwise(substring(col("blob"), 1, maxBytes)))

  /** Frame sampling for "video" rows: explode n_frames into every k-th
    * frame index with a per-frame byte-window into the blob — the shape of
    * a real frame extractor (one output row per sampled frame).
    */
  def sampleFrames(media: DataFrame, everyK: Int = 10): DataFrame =
    media.filter(col("meta.format") === "mp4")
      .select(col("doc_id"), col("meta.n_frames").as("n_frames"), col("blob"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame_bytes",
        substring(col("blob"),
          (pmod(col("frame_idx"), greatest(length(col("blob")), lit(1))) + 1).cast("int"),
          lit(64)))
      .select("doc_id", "frame_idx", "frame_bytes")

  // ---------------------------------------------------------------- queries

  /** Q-MM01 — media metadata profile (rows-only): count/avg dims per format. */
  def qMM01(s: SparkSession, d: String): DataFrame =
    withMedia(Tables.documents(s, d))
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.width")).as("avg_w"),
        avg(col("meta.height")).as("avg_h"),
        sum(length(col("blob"))).as("total_bytes"))
      .orderBy("format")

  /** Q-MM02 — feature extraction (rows-only): per-doc feature norm via the
    * stubbed decode, proving the mapPartitions plumbing end-to-end.
    */
  def qMM02(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(s, withMedia(Tables.documents(s, d)))
    feats.select(col("doc_id"),
        aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq_norm"))
      .orderBy("doc_id")
  }

  /** Q-MM03 — frame sampling (rows-only): sampled frame count per doc. */
  def qMM03(s: SparkSession, d: String): DataFrame =
    sampleFrames(withMedia(Tables.documents(s, d)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("doc_id")
}
