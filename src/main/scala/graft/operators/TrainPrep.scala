package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators — the stages between "deduped
  * documents" and "training batches" that a 100 TB pipeline runs after the
  * LLMOps dedup family: duplicate-cluster resolution (connected components
  * over near-dup pairs), deterministic content-hash train/val/test
  * splitting, sequence packing into fixed token budgets, and a C4-style
  * quality-filter funnel.
  *
  * Everything is declarative DataFrame code (codegen'd built-ins, no UDFs);
  * the one iterative operator (connected components) loops a bounded number
  * of distributed rounds with lineage truncation — never a driver-side
  * traversal.
  */
object TrainPrep {

  /** Connected components by min-label propagation: each vertex starts
    * labeled with its own id, and every round adopts the minimum label of
    * its neighborhood; a fixpoint labels every member of a component with
    * the component's global minimum id.
    *
    * Scale shape: each round is one equi-join + one aggregate (both
    * shuffle on vertex id — AQE coalesces as components collapse), and
    * `localCheckpoint` truncates the plan so the lineage doesn't grow by
    * one join per round. Rounds needed = graph diameter; near-dup
    * clusters are band-join cliques with diameter ≤ ~2, so the loop ends
    * after 2-3 rounds regardless of corpus size. (For adversarial
    * long-chain graphs the large-star/small-star alternation — Kiveris et
    * al., "Connected Components in MapReduce and Beyond" — drops rounds
    * to O(log d); not needed for the dedup-cluster topology.)
    *
    * `edges` needs `src`/`dst` long columns; undirectedness is enforced
    * here. Returns (id, component) for every vertex with at least one
    * edge — isolated docs are their own singleton cluster by definition
    * and never enter the edge list.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // no distinct(): duplicate edges change message volume, never the
    // min-aggregate's result — and the input (verified pair sets) is
    // already deduplicated, so the extra shuffle would buy nothing
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // convergence via the label-sum invariant: min-propagation can only
    // DECREASE labels, so an unchanged sum(comp) is exactly a fixpoint —
    // one cheap scalar aggregate per round instead of a change-detection
    // join against the previous labels. Summed as decimal(38,0): a long
    // sum overflows (silently, wrapping) once vertex count × id magnitude
    // passes 2^63, which a 100 TB corpus with 64-bit ids does
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = bidir
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.union(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Q-L19 — near-duplicate cluster resolution: the verified Jaccard
    * pairs (the q_l05 two-stage MinHash→exact pipeline) become edges, and
    * connected components turn pairwise matches into dedup GROUPS — the
    * step that decides "keep one document per cluster" correctly when
    * A~B and B~C but A!~C. Output: one row per cluster (id = min member
    * doc_id), with its size. The DuckDB oracle recomputes the same
    * clusters with a recursive transitive-closure CTE.
    */
  def qL19(s: SparkSession, d: String): DataFrame = {
    val pairs = LLMOps.qL05(s, d)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    connectedComponents(pairs)
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("size"))
      .orderBy("cluster_id")
  }

  /** Q-L20 — deterministic content-hash train/val/test split (90/5/5):
    * bucket = first 32 bits of md5(text) mod 100. Content-addressed, so
    * (a) re-ingesting the corpus with different doc_ids keeps every
    * document's split, and (b) exact duplicates land in the SAME split —
    * no train/test leakage through dup pairs. No shuffle beyond the final
    * tiny aggregate; the hash is evaluated scan-side.
    */
  def qL20(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(splitCol.as("split"), col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"))
      .orderBy("split")
  }

  /** Q-L21 — sequence packing, concat-then-chunk (the GPT pretraining
    * layout): documents are concatenated in (source, doc_id) order and
    * the token stream is cut into fixed 2048-token bins; each doc reports
    * the bin span it occupies. Packing is PER SOURCE — the window
    * partitions by source, so at 100 TB each shard packs independently
    * and no global single-partition window exists (the classic
    * sequence-packing scale trap).
    */
  def qL21(s: SparkSession, d: String, capacity: Int = 2048): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(LLMOps.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .select(col("source"), col("doc_id"), col("n_tok"),
        expr(s"(cum - n_tok) div $capacity").as("start_bin"),
        expr(s"(cum - 1) div $capacity").as("end_bin"))
      .orderBy("source", "doc_id")
  }

  /** The content-hash split expression shared by qL20/qL24 — first 32
    * bits of md5(text) mod 100, 90/5/5.
    */
  private def splitCol = {
    val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 100
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** Q-L23 — language-balanced sampling: keep at most `cap` documents per
    * language, chosen in deterministic pseudo-random order (md5 of
    * content, doc_id tie-break) so the sample is reproducible across runs
    * and engines. Runs on the custom GroupTopK operator — ≤ cap rows per
    * (lang, partition) cross the shuffle, so one dominant language cannot
    * concentrate its whole partition into a single window sort (the
    * skew trap of the ROW_NUMBER() formulation the oracle uses).
    */
  def qL23(s: SparkSession, d: String, cap: Int = 50): DataFrame =
    graft.plans.Graft.groupTopK(
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            md5(col("text")).as("mh")),
        group = Seq(col("lang")),
        order = Seq(col("mh"), col("doc_id")),
        k = cap)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** Q-L24 — train/test contamination scan: how many train-split docs
    * share at least one 3-word shingle with any test-split doc — the
    * eval-integrity check a training pipeline runs after splitting.
    *
    * Single-pass shape: ONE scan emits (doc, split, shingle-hash)
    * postings, ONE shuffle clusters them by hash, and a window
    * `max(split='test') over (partition by h)` flags every posting whose
    * shingle also occurs in the test split — no self-join of the postings
    * (a semi-join formulation reads the corpus twice because column
    * pruning specializes each branch's scan, defeating exchange reuse),
    * no doc×doc comparison, and no broadcast of the test side (5% of the
    * corpus — the 100 TB mistake). Both output counts then fall out of
    * one aggregate over the flagged postings: a doc is contaminated iff
    * ANY of its postings is flagged, i.e. countDistinct over a
    * conditional. Window groups are bounded by document frequency of a
    * single 3-gram shingle — the same bound the LSH family's bucket
    * joins already rely on.
    */
  def qL24(s: SparkSession, d: String): DataFrame = {
    val posts = Tables.documents(s, d)
      .select(col("doc_id"), splitCol.as("split"),
        explode(graft.functions.ShingleHash(col("text"), 3)).as("h"))
      .repartition(col("h"))
    // duplicate (doc, h) postings (a 3-gram repeated inside one doc) are
    // harmless here: both counts are countDistinct over doc_id and the
    // window max is idempotent — so no dedup pass is spent on them
    val flagged = posts.withColumn("h_in_test",
      max(col("split") === "test").over(Window.partitionBy("h")))
    flagged.agg(
        countDistinct(when(col("split") === "train", col("doc_id")))
          .as("train_docs"),
        countDistinct(when(col("split") === "train" && col("h_in_test"),
          col("doc_id"))).as("contaminated_docs"))
      .select(col("train_docs"), col("contaminated_docs"),
        (col("contaminated_docs").cast("double") / col("train_docs"))
          .as("contamination_rate"))
  }

  /** Q-L22 — C4-style quality-filter funnel: per-document word count,
    * mean token length, repetition ratio (max single-token frequency /
    * word count) and stopword ratio, aggregated into one funnel row of
    * how many docs survive each filter and all of them. The repetition
    * stat needs a (doc, token) aggregate — two shuffles total (token
    * counts, then per-doc max), both map-side combined; every predicate
    * is engine-portable arithmetic so DuckDB recomputes the funnel
    * exactly.
    */
  def qL22(s: SparkSession, d: String): DataFrame = {
    // mirrored verbatim in the q_l22 oracle SQL (and LLMOps.stopwords) —
    // edit all sites together or parity breaks
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val docs = Tables.documents(s, d)
    val wc = size(LLMOps.tokens(col("text"))).cast("double")
    val stats = docs.select(
      col("doc_id"),
      wc.as("wc"),
      (length(col("text")).cast("double") / wc).as("mean_tok_len"),
      (size(filter(LLMOps.tokens(col("text")), t => t.isin(stop: _*)))
        .cast("double") / wc).as("stop_ratio"))
    val rep = docs
      .select(col("doc_id"), explode(LLMOps.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").cast("double").as("max_tok"))
    val fLen = col("wc").between(20.0, 80.0)
    val fWlen = col("mean_tok_len").between(3.0, 10.0)
    val fRep = (col("max_tok") / col("wc")) <= 0.125
    val fStop = col("stop_ratio") >= 0.01
    stats.join(rep, Seq("doc_id"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(fLen, 1L).otherwise(0L)).as("pass_len"),
        sum(when(fWlen, 1L).otherwise(0L)).as("pass_wlen"),
        sum(when(fRep, 1L).otherwise(0L)).as("pass_rep"),
        sum(when(fStop, 1L).otherwise(0L)).as("pass_stop"),
        sum(when(fLen && fWlen && fRep && fStop, 1L).otherwise(0L)).as("pass_all"))
  }
}
