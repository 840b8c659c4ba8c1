package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout.
  *
  * Honest measurement rules: a full uncharged warm-up pass runs first so
  * JIT/codegen/parquet-footer/page-cache warm-up isn't billed to whichever
  * query runs first (warm-cache timing, the standard DB-bench methodology;
  * disable with SPARK_GRAFT_WARM=0 while iterating), and each query is
  * fully materialized through the noop sink — `count()` would let Catalyst
  * prune every non-key column out of the scan and undercount the real work.
  *
  * Output-size rule: the harness captures only the tail of stdout, so the
  * JSON line must stay short — per-query keys are the query id prefix
  * (`q_a05_string_agg` → `q_a05`; asserted unique) and seconds are rounded
  * to 3 decimals. BASELINE.md's measured table is keyed the same way.
  * Capture-proofing: the same JSON line is ALSO written to
  * `bench_out.json` in the working directory — the r7 driver artifact
  * lost seven queries to stdout tail-truncation; the file copy is the
  * authoritative record when the stdout window clips.
  *
  * Adjacency isolation (r7 finding): q_mm02 read 2.49x in-suite but 0.97x
  * isolated — pressure left behind by neighboring queries (page cache,
  * un-collected heap from ~140 prior executions) was billed to whichever
  * query ran next. Two countermeasures: (a) before every timed run the
  * harness clears the SQL cache and runs System.gc(), so each query
  * starts from the same reclaimed-heap state its isolated run would see;
  * (b) passes >= 3 run in a deterministic per-pass scatter order, so a
  * query's neighbors differ across passes and min() gets at least one
  * sample with different adjacency (forward/reverse alone keeps
  * same-block queries adjacent in every pass).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Status-store retention is capped near zero: each noop write retains
    // its full (AQE-expanded) plan in the live SQL status store otherwise,
    // and ~140 retained executions measurably slow the tail of the suite.
    def mkSession(): SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "1")
      .config("spark.ui.retainedJobs", "10")
      .config("spark.ui.retainedStages", "10")
      .getOrCreate()
    var spark = mkSession()
    spark.sparkContext.setLogLevel("WARN")

    // Per-query pass failures, emitted in the JSON (not just stderr): a
    // query that succeeded once but crashes on re-run would otherwise
    // report a normal min() time with no machine-readable trace of the
    // instability.
    var failedPasses = Map.empty[String, Int].withDefaultValue(0)

    // Every charged timing, in pass order, so breach adjudication can live
    // IN the artifact: the r9 driver bench ran on a host under ~2.5× load
    // and 50 queries breached the 2× gate on untouched code, with no
    // per-pass evidence to tell ambience from regression. Offenders
    // (min > 1.5× their BASELINE.md row) carry their per-pass times on
    // the stdout JSON line; the full per-pass record for every query is
    // written to bench_passes.json.
    var passTimes = Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)

    // Untimed pre-query hygiene: drop any cached plans and reclaim heap so
    // the timed window sees the same starting state an isolated run would.
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }

    // `charged = false` for warm-up runs: failed_passes is the machine-
    // readable instability record for TIMED samples — an uncharged
    // warm-up flake must not impugn timings that were all valid
    def run(name: String, charged: Boolean = true): Double = {
      hygiene()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        if (charged) {
          failedPasses += name -> (failedPasses(name) + 1)
          passTimes += name -> (passTimes(name) :+ -1.0)
        }
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (charged) passTimes += name -> (passTimes(name) :+ dt)
      dt
    }

    // SPARK_GRAFT_ONLY=q_x,q_y — time a subset while iterating; full
    // query names or the short ids the JSON emits both select
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(s => s.contains(n) ||
        s.contains(n.split("_").take(2).mkString("_"))))
    require(names.nonEmpty,
      s"SPARK_GRAFT_ONLY=${only.mkString} selects no query — use full " +
        "names (q_a05_string_agg) or short ids (q_a05)")
    val shortId = names.map(n => n -> n.split("_").take(2).mkString("_")).toMap
    require(shortId.values.toSet.size == names.size,
      "short query ids collide; bench JSON keys must stay unique")

    // Multiple passes, charge min per query: pass 1 doubles as warm-up
    // (JIT/Janino/page cache), later passes run in fresh sessions so
    // accumulated session state from ~130 executions isn't billed, and
    // the min absorbs one-off GC/scheduling spikes in any pass — a
    // best-of-N steady-state estimate, not a cold-start one.
    //
    // Passes alternate query ORDER (forward, reverse, forward, ...):
    // every pass takes a similar wall-clock, so a time-localized
    // environmental disturbance (another process on the box, a periodic
    // host-level job) lands at similar OFFSETS in each pass — with a
    // fixed order that means the SAME queries get hit twice and min()
    // can't absorb it (observed in the r5 driver bench: three contiguous
    // alphabetical blocks at 2–3.7× with the rest of the suite at 1×,
    // on code unchanged since r1/r4). Reversing alternate passes makes
    // the hit sets disjoint, restoring min()'s protection.
    // SPARK_GRAFT_PASSES (default 3; min 2) adds more passes for noisier
    // hosts — 3 is the default because with 2 a single time-localized host
    // disturbance can hit a query in both passes and min() has nothing
    // clean to keep (exactly the r9 artifact failure mode).
    val results =
      if (sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0") {
        val nPasses = {
          val raw = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3")
          raw.toIntOption.getOrElse(sys.error(
            s"SPARK_GRAFT_PASSES must be an integer, got '$raw'")).max(2)
        }
        var best = names.map(n => n -> run(n)).toMap
        for (p <- 2 to nPasses) {
          spark.stop()
          spark = mkSession()
          spark.sparkContext.setLogLevel("WARN")
          System.gc()
          // Pass 2 reverses (disjoint hit-sets for time-localized host
          // disturbances); passes >= 3 scatter deterministically so
          // same-block neighbors — adjacent in BOTH forward and reverse —
          // get at least one differently-ordered sample.
          val order =
            if (p == 2) names.reverse
            else names.sortBy(n => scala.util.hashing.MurmurHash3.stringHash(n, p))
          run(order.head, charged = false) // new-session warm-up, not charged
          order.foreach { n =>
            val t = run(n)
            // A transient failure in a later pass must not discard a valid
            // earlier timing: keep the best timing from any pass that
            // succeeded; -1 only when EVERY pass failed.
            if (t < 0 && best(n) >= 0)
              System.err.println(s"[bench] $n failed in pass $p; keeping " +
                f"earlier valid ${best(n)}%.3f s")
            best += n -> ((best(n), t) match {
              case (b, x) if b < 0 => x
              case (b, x) if x < 0 => b
              case (b, x)          => math.min(b, x)
            })
          }
        }
        names.map(n => n -> best(n))
      } else { run(names.head, charged = false); names.map(n => n -> run(n)) }
    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + shortId(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Only present when some pass failed, to keep the line short.
    val failed =
      if (failedPasses.isEmpty) ""
      else failedPasses.toSeq.sortBy(_._1)
        .map { case (k, c) => "\"" + shortId(k) + "\":" + c }
        .mkString(""","failed_passes":{""", ",", "}")
    // Breach evidence on the line itself: queries whose charged min exceeds
    // 1.5× their BASELINE.md row (or failed every pass) carry per-pass
    // times, so a load-inflated run self-adjudicates — uniform inflation
    // across all passes of many queries is host ambience; a single query
    // slow in every pass with idle neighbors is a regression.
    val baseline = loadBaseline()
    val breaches = results.filter { case (k, v) =>
      v < 0 || baseline.get(shortId(k)).exists(b => v > 1.5 * b)
    }
    val passesJson =
      if (breaches.isEmpty) ""
      else breaches.sortBy(_._1).map { case (k, _) =>
        "\"" + shortId(k) + "\":[" + passTimes(k).map(r3).mkString(",") + "]"
      }.mkString(""","passes":{""", ",", "}")
    // Field ORDER is capture-proofing: the driver keeps the TAIL of stdout,
    // so truncation clips the line's HEAD — put the adjudication extras
    // (failed passes, breach pass-times) first and the per-query times +
    // total LAST, so a clipped capture loses passes, never timings (the
    // r10 driver artifact shipped parsed:null with the head clipped).
    val line =
      s"""{"metric":"total","unit":"sec"$failed$passesJson,"queries":$qs,"value":${r3(total)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Full per-pass record for EVERY query (not just breaches) — the
    // on-disk adjudication archive that survives stdout tail-truncation.
    val allPasses = names.map { n =>
      "\"" + shortId(n) + "\":[" + passTimes(n).map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_passes.json"),
      (allPasses + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // STDOUT gets a COMPACT line sized to the harness capture window: the
    // driver keeps the LAST 2000 chars of stdout and sbt appends its own
    // `[success] Total time: ...` (~70 chars) after us, so the line must
    // fit ~1930 chars or the head — including the opening brace — is
    // clipped and the artifact ships parsed:null (r9–r12 all did). At
    // 165+ queries the full-precision q_-prefixed map is ~2.4 KB and can
    // NEVER fit, so stdout compresses losslessly-enough: query keys drop
    // the shared `q_` prefix (declared in `key_prefix` so the line stays
    // self-describing), times carry 2 decimals with trailing zeros
    // trimmed, and sf is the directory basename. The authoritative
    // full-precision record stays in bench_out.json / bench_passes.json
    // (committed as BENCH_r*_local). Data still sits LAST on the line, so
    // if growth ever overflows the window again it clips the metadata
    // head, not the timings.
    def r2t(v: Double): String =
      if (v < 0) "-1"
      else {
        val s = f"$v%.2f"
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
          .stripSuffix(".")
        else s
      }
    val sfBase = new java.io.File(sfDir).getName
    def compactLine(fmt: Double => String): String = {
      val m = results.map { case (k, v) =>
        "\"" + shortId(k).stripPrefix("q_") + "\":" + fmt(v)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","unit":"sec","key_prefix":"q_","queries":$m,"value":${r2t(total)},"sf":"$sfBase"}"""
    }
    def r1t(v: Double): String =
      if (v < 0) "-1"
      else f"$v%.1f".reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    // degrade precision rather than overflow: a 1-decimal map that parses
    // beats a 2-decimal map whose head is clipped
    val line2 = compactLine(r2t)
    val stdoutLine = if (line2.length <= 1900) line2 else compactLine(r1t)
    spark.stop() // nothing may print after the line below
    println(stdoutLine)
  }

  /** `| q_xxx | 1.234 |` rows from BASELINE.md (env-overridable path);
    * absent file or unparseable rows just mean no breach annotation.
    */
  private[graft] def loadBaseline(): Map[String, Double] = {
    val path = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md"))
    if (!java.nio.file.Files.exists(path)) return Map.empty
    val row = """\|\s*(q_\w+)\s*\|\s*([0-9]+\.?[0-9]*)\s*\|""".r
    scala.util.Using.resource(
      scala.io.Source.fromFile(path.toFile, "UTF-8")) { src =>
      src.getLines().collect { case row(id, sec) => id -> sec.toDouble }.toMap
    }
  }
}
