package graft.operators

// Scratch profiler for qL59's phases (not part of the contract; delete
// after the optimization round's measurements are recorded).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

object ProfL59 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm-up whole query once (JIT, fixture staging)
    t("warmup qL59 full") {
      TrainPrep.qL59(s, d).write.format("noop").mode("overwrite").save()
    }
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val stop = LLMOps.stopwords
      val docs = Tables.documents(s, d)
      val wc = size(LLMOps.tokens(col("text"))).cast("double")
      val stats = docs.select(
        col("doc_id"), col("text"), wc.as("wc"),
        (length(col("text")).cast("double") / wc).as("mean_tok_len"),
        (size(filter(LLMOps.tokens(col("text")), t => t.isin(stop: _*)))
          .cast("double") / wc).as("stop_ratio"),
        LLMOps.runArgmax(array_sort(LLMOps.tokens(col("text"))))
          .getField("cnt").cast("double").as("max_tok"))
      t("stats only (noop)") {
        stats.write.format("noop").mode("overwrite").save()
      }
      val qual = col("wc").between(20.0, 80.0) &&
        col("mean_tok_len").between(3.0, 10.0) &&
        (col("max_tok") / col("wc")) <= 0.125 &&
        col("stop_ratio") >= 0.01
      val wTxt = Window.partitionBy("text")
      val baseNoCp = stats.withColumn("q", qual)
        .withColumn("k", col("q") &&
          col("doc_id") === min(when(col("q"), col("doc_id"))).over(wTxt))
      t("stats+window (noop)") {
        baseNoCp.write.format("noop").mode("overwrite").save()
      }
      val base = t("stats+window checkpoint") { baseNoCp.localCheckpoint() }
      t("heads from checkpoint") {
        base.agg(count(lit(1)).as("d0")).collect()
      }
      val keepers = base.filter(col("k")).select("doc_id", "text", "wc")
      val benchShingles = t("benchShingles distinct (noop)") {
        val b = LLMOps.shinglePostings(
          docs.filter(col("doc_id") % 13 === 0), keep = Nil,
          distinctPerDoc = false).distinct()
        b.write.format("noop").mode("overwrite").save(); b
      }
      t("contaminated semi-join") {
        LLMOps.shinglePostings(keepers, distinctPerDoc = false)
          .join(benchShingles, Seq("h"), "left_semi")
          .select("doc_id").distinct()
          .write.format("noop").mode("overwrite").save()
      }
      val tmp = Multimodal.stageMm10Fixture(s, d)
      val ingested = graft.io.Readers.binaryMedia(s, tmp, idFromStem = true)
      val store = Multimodal.stageFixtureOnce("mm10s", d) { dir =>
        FingerprintStore.bootstrap(s, ingested, dir)
      }
      t("img pairs (store)") {
        FingerprintStore.imageNearDupPairs(s, store)
          .write.format("noop").mode("overwrite").save()
      }
      t("aud pairs (store)") {
        FingerprintStore.audioNearDupPairs(s, store)
          .write.format("noop").mode("overwrite").save()
      }
      t("vid pairs (store)") {
        FingerprintStore.videoNearDupPairs(s, store)
          .write.format("noop").mode("overwrite").save()
      }
      t("vid pairs UNORDERED (store)") {
        FingerprintStore.videoNearDupPairs(s, store, ordered = false)
          .write.format("noop").mode("overwrite").save()
      }
      if (round == 1) println(FingerprintStore
        .videoNearDupPairs(s, store, ordered = false)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      locally {
        val postings = FingerprintStore.videoPostings(s, store)
        t("  vid postings scan") {
          postings.write.format("noop").mode("overwrite").save()
        }
        val dedup = postings.select("doc_id", "dhash").distinct()
        t("  vid distinct") {
          dedup.write.format("noop").mode("overwrite").save()
        }
        val sizes = dedup.groupBy("doc_id").agg(count(lit(1)).as("n_fr"))
        t("  vid sizes") {
          sizes.write.format("noop").mode("overwrite").save()
        }
        val localP = dedup.repartition(col("doc_id"))
        val sizesP = localP.groupBy("doc_id").agg(count(lit(1)).as("n_fr"))
        val withNP = localP.join(sizesP, Seq("doc_id"))
        t("  withN repartitioned (noop)") {
          withNP.write.format("noop").mode("overwrite").save()
        }
        t("  join ONLY (noop, no agg)") {
          withNP.as("a").join(withNP.as("b"),
              col("a.dhash") === col("b.dhash") &&
                col("a.doc_id") < col("b.doc_id") &&
                least(col("a.n_fr"), col("b.n_fr")).cast("double") /
                  (col("a.n_fr") + col("b.n_fr") -
                    least(col("a.n_fr"), col("b.n_fr"))).cast("double") >= 0.8)
            .select(col("a.doc_id"), col("b.doc_id"))
            .write.format("noop").mode("overwrite").save()
        }
        t("  join+AGG repartitioned (noop)") {
          withNP.as("a").join(withNP.as("b"),
              col("a.dhash") === col("b.dhash") &&
                col("a.doc_id") < col("b.doc_id") &&
                least(col("a.n_fr"), col("b.n_fr")).cast("double") /
                  (col("a.n_fr") + col("b.n_fr") -
                    least(col("a.n_fr"), col("b.n_fr"))).cast("double") >= 0.8)
            .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.n_fr").as("n_a"), col("b.n_fr").as("n_b"))
            .agg(count(lit(1)).as("inter"))
            .write.format("noop").mode("overwrite").save()
        }
        val withN = dedup.join(sizes, Seq("doc_id"))
        val boundOk = least(col("a.n_fr"), col("b.n_fr")).cast("double") /
          (col("a.n_fr") + col("b.n_fr") -
            least(col("a.n_fr"), col("b.n_fr"))).cast("double") >= 0.8
        t("  vid self-join+agg") {
          withN.as("a").join(withN.as("b"),
              col("a.dhash") === col("b.dhash") &&
                col("a.doc_id") < col("b.doc_id") && boundOk)
            .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.n_fr").as("n_a"), col("b.n_fr").as("n_b"))
            .agg(count(lit(1)).as("inter"))
            .write.format("noop").mode("overwrite").save()
        }
        def joined = withN.as("a").join(withN.as("b"),
            col("a.dhash") === col("b.dhash") &&
              col("a.doc_id") < col("b.doc_id") && boundOk)
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.n_fr").as("n_a"), col("b.n_fr").as("n_b"))
          .agg(count(lit(1)).as("inter"))
          .select(col("doc_a"), col("doc_b"),
            (col("inter").cast("double") /
              (col("n_a") + col("n_b") - col("inter")).cast("double"))
              .as("jaccard"))
          .where(col("jaccard") >= 0.8)
        t("  join+agg+filter NO orderBy") {
          joined.write.format("noop").mode("overwrite").save()
        }
        t("  join+agg+filter + orderBy") {
          joined.orderBy("doc_a", "doc_b")
            .write.format("noop").mode("overwrite").save()
        }
      }
      val pairsAll = FingerprintStore.imageNearDupPairs(s, store)
        .select("doc_a", "doc_b")
        .unionByName(FingerprintStore.audioNearDupPairs(s, store)
          .select("doc_a", "doc_b"))
        .unionByName(FingerprintStore.videoNearDupPairs(s, store)
          .select("doc_a", "doc_b"))
      println("[prof] pair count: " + pairsAll.count())
      t("connectedComponents") {
        TrainPrep.connectedComponents(
          pairsAll.select(col("doc_a").as("src"), col("doc_b").as("dst")))
          .write.format("noop").mode("overwrite").save()
      }
      t("mediaLosers (store-served)") {
        Multimodal.mixedMediaRanked(s, ingested, store)
          .filter(col("rn") > 1 && col("id") < Multimodal.TwinOffset)
          .select(col("id").as("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      base.unpersist()
    }
    t("full qL59 again") {
      TrainPrep.qL59(s, d).write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
