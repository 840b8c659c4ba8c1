package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` table (driver
  * mandate): deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard),
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd higher-order functions — no UDFs — so
  * each operator is a single declarative plan that Catalyst can pipeline.
  * Where an oracle must reproduce hash values, hashing is a polynomial
  * char-code hash (engine-portable, exact integer math) instead of an
  * engine-private hash function; the xxhash64-based variants are the faster
  * production path and are checked structurally (rows-only).
  */
object LLMOps {
  private val P = 1000000007L // modulus for portable polynomial hashing

  /** Whitespace tokens of lowercased text. */
  def tokens(c: Column): Column = split(lower(c), " ")

  /** Consecutive n-word shingles; a doc shorter than n yields one shingle
    * (the whole text) so every doc participates in dedup.
    */
  def shingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j + 1))): _*)))
      .otherwise(array(array_join(w, " ")))

  /** Portable polynomial string hash: fold over char codes, mod P. The
    * DuckDB oracle computes the identical fold (list_reduce over ord()),
    * which is why this exists alongside xxhash64.
    */
  def charHash(sh: Column): Column =
    aggregate(sequence(lit(1), length(sh)), lit(0L),
      (acc, i) => (acc * 31L + ascii(sh.substr(i, lit(1)))) % P)

  /** MinHash signature: numHashes affine permutations of the shingle hash,
    * min per permutation. One pass over the shingles per doc.
    */
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(shingleHashes,
        h => ((lit(31L) + lit(17L) * k) * h + lit(7L) + lit(11L) * k) % P)))

  /** LSH band keys: signature split into bands of `r`, each rendered as a
    * "bandIdx:sig:sig:..." string so candidates join on a single key column.
    */
  def bandKeys(sig: Column, numHashes: Int, r: Int): Column = {
    val bands = (0 until numHashes / r).map { b =>
      concat_ws(":", (lit(b) +: (0 until r).map(j =>
        element_at(sig, b * r + j + 1))).map(_.cast("string")): _*)
    }
    array(bands: _*)
  }

  // ---------------------------------------------------------------- queries

  /** Q-L01 — exact-dedup cardinality: total vs distinct text. */
  def qL01(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(count(lit(1)).as("total_docs"),
        countDistinct(col("text")).as("distinct_docs"))

  /** Q-L03 — token frequency top-20 (text analysis mandate). */
  def qL03(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** Q-L04 — exact dedup keepers: group by full text, keep min doc_id.
    * At 100 TB the groupBy key would be a 128-bit content hash rather than
    * the full text (same plan shape, tiny shuffle payload) — see
    * fingerprint() below, which supplies exactly that key.
    */
  def qL04(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("copies"))
      .select("keeper_id", "copies")
      .orderBy("keeper_id")

  /** Q-L05 — n-gram (3-word shingle) Jaccard similarity on candidate pairs,
    * bounded to doc_id < 100 (the exact-verification stage of a dedup
    * pipeline; at scale the candidate set comes from MinHash LSH instead of
    * an id-range — see qL06).
    */
  def qL05(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))), Seq("doc_a"))
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("doc_a", "doc_b")
  }

  /** Q-L06 — MinHash + LSH dedup candidates (16 hashes, 4 bands of 4):
    * shingle → portable hash → minhash signature → band keys → bucket
    * self-join. The only shuffle is the band-key join; signature
    * computation is map-side. This is the shape that survives 100 TB —
    * candidate generation never compares all pairs.
    */
  def qL06(s: SparkSession, d: String): DataFrame = {
    val numHashes = 16
    val r = 4
    val sig = Tables.documents(s, d)
      .select(col("doc_id"),
        minhashSig(transform(shingles(tokens(col("text")), 3), charHash _), numHashes).as("sig"))
      .select(col("doc_id"), explode(bandKeys(col("sig"), numHashes, r)).as("band_key"))
    val a = sig.select(col("band_key"), col("doc_id").as("doc_a"))
    val b = sig.select(col("band_key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash (64-bit) per doc: per-token xxhash64, signed bit-vote, sign →
    * bit. Docs sharing the signature are near-dup candidates. xxhash64 has
    * no cross-engine oracle → rows-only check.
    */
  def simhash(textCol: Column): Column = {
    val votes = aggregate(
      tokens(textCol),
      array_repeat(lit(0), 64),
      (acc, t) => array((0 until 64).map(j =>
        element_at(acc, j + 1) +
          when(shiftright(xxhash64(t), j).bitwiseAND(1L) === 1L, 1).otherwise(-1)): _*))
    (0 until 64).map(j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Q-L07 — SimHash dedup groups (rows-only): signature → group size. */
  def qL07(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), simhash(col("text")).as("sh"))
      .groupBy("sh")
      .agg(count(lit(1)).as("members"), min(col("doc_id")).as("keeper_id"))
      .filter(col("members") > 1)
      .orderBy("keeper_id")

  /** Q-L08 — language ID by stopword-ratio heuristic, scored against the
    * labeled lang column (confusion counts).
    */
  def qL08(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val w = tokens(col("text"))
    val ratio = size(filter(w, t => t.isin(stop: _*))).cast("double") /
      size(w).cast("double")
    Tables.documents(s, d)
      .select(col("lang"),
        when(ratio >= 0.03, "en").otherwise("unk").as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "lang_pred")
  }

  /** Q-L09 — quality-score histogram: stopword ratio, mean token length and
    * a length prior folded into [0,1]; bucketed by floor(score*10) so the
    * aggregate is integer-exact.
    */
  def qL09(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val w = tokens(col("text"))
    val stopRatio = size(filter(w, t => t.isin(stop: _*))).cast("double") /
      size(w).cast("double")
    val meanTokLen = length(col("text")).cast("double") / size(w).cast("double")
    val lengthOk = when(size(w).between(30, 1000), 1.0).otherwise(0.0)
    val score = (least(stopRatio * 5.0, lit(1.0)) + least(meanTokLen / 10.0, lit(1.0)) + lengthOk) / 3.0
    Tables.documents(s, d)
      .select(floor(score * 10).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("docs"))
      .orderBy("bucket")
  }

  /** Q-L10 — token statistics per source: regex word tokens + chars. */
  def qL10(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum(size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("source")

  /** Q-L11 — document fingerprint (polynomial rolling hash over the whole
    * text, portable math): the compact dedup key for the 100 TB path.
    */
  def qL11(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), charHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")
}
