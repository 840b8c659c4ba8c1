package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming smoke (SURVEY §5.2 t1): windows + watermark + custom state over
  * a MemoryStream, validated against the batch twins' semantics.
  */
class StreamOpsSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:20:00"), "click"),
    (2L, ts("2024-01-01 10:45:00"), "view"),
    // > 30 min gap for user 1 → second session
    (1L, ts("2024-01-01 11:30:00"), "click"),
    (2L, ts("2024-01-01 11:50:00"), "view"))

  test("tumbling window counts per hour/type (streaming Q-T01)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.tumblingCounts(events).writeStream
      .format("memory").queryName("tumbling").outputMode("update").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select("hr", "event_type", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 10:00:00"), "view", 1L),
        (ts("2024-01-01 11:00:00"), "click", 1L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("sliding window: each event lands in window_size/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.slidingCounts(events).writeStream
      .format("memory").queryName("sliding").outputMode("update").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:20:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("sliding")
        .select("w_start", "cnt").as[(Timestamp, Long)].collect().toSet
      // 1h window sliding every 15min → the event is in 4 windows
      assert(got == Set(
        (ts("2024-01-01 09:30:00"), 1L), (ts("2024-01-01 09:45:00"), 1L),
        (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:15:00"), 1L)))
    } finally q.stop()
  }

  test("session_window sessionization (streaming Q-T02)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.sessionCounts(events).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("sessions")
        .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
        .as[(Long, Long)].collect().toMap
      // user 1: 10:05+10:20 merge (15 min gap), 11:30 separate → 2 sessions
      // user 2: 10:45 and 11:50 are > 30 min apart → 2 sessions
      assert(got == Map(1L -> 2L, 2L -> 2L))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.streamingDedup(events, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "click"),
        (1L, ts("2024-01-01 10:01:00"), "click"), // dup (same user+type)
        (1L, ts("2024-01-01 10:02:00"), "view"),
        (2L, ts("2024-01-01 10:03:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("dedup").select("user_id", "event_type")
        .as[(Long, String)].collect().toSet
      assert(got == Set((1L, "click"), (1L, "view"), (2L, "click")))
      assert(spark.table("dedup").count() == 3)
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with dimension rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "interaction"), ("view", "impression"))
      .toDF("event_type", "category")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.enrichWithDim(events, dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("user_id", "event_type", "category")
        .as[(Long, String, String)].collect()
      assert(got.length == rows.length)
      assert(got.forall { case (_, t, c) =>
        (t == "click" && c == "interaction") || (t == "view" && c == "impression")
      })
    } finally q.stop()
  }

  test("stream-stream join matches keys only within the event-time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamOps.joinStreams(
      clicks.toDF().toDF("user_id", "click_ts", "page"),
      views.toDF().toDF("user_id", "view_ts", "item"),
      key = "user_id", leftTs = "click_ts", rightTs = "view_ts",
      delay = "10 minutes", maxGap = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), "home"),
        (2L, ts("2024-01-01 10:00:00"), "search"))
      views.addData(
        (1L, ts("2024-01-01 10:05:00"), "itemA"),  // within 10 min → match
        (1L, ts("2024-01-01 10:20:00"), "itemB"),  // beyond the gap → no match
        (2L, ts("2024-01-01 09:55:00"), "itemC"),  // before the click → no match
        (3L, ts("2024-01-01 10:02:00"), "itemD"))  // no such click key
      q.processAllAvailable()
      val got = spark.table("ssjoin").select("user_id", "page", "item")
        .as[(Long, String, String)].collect().toSet
      assert(got == Set((1L, "home", "itemA")))
    } finally q.stop()
  }

  test("foreachBatch streams micro-batches through the jdbc writer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftstream;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE EVENTS_SINK (USER_ID BIGINT, TS TIMESTAMP, EVENT_TYPE VARCHAR(32))")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      val mem = MemoryStream[(Long, Timestamp, String)]
      val events = mem.toDF().toDF("user_id", "ts", "event_type")
      val q = StreamOps.foreachBatchJdbc(events, url, "EVENTS_SINK",
        new java.util.Properties(), ckpt).start()
      try {
        mem.addData(rows.take(3): _*)
        q.processAllAvailable()
        mem.addData(rows.drop(3): _*)
        q.processAllAvailable()
      } finally q.stop()
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM EVENTS_SINK")
      rs.next()
      assert(rs.getInt(1) == rows.length)
    } finally conn.close()
  }

  test("rate-micro-batch source drives the windowed aggregation without kafka") {
    // deterministic built-in source: `rowsPerBatch` rows per micro-batch
    // with evenly advancing timestamps — the kafka-less way to smoke a
    // streaming topology end-to-end
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 100)
      .option("numPartitions", 2)
      .option("startTimestamp", 0)
      .option("advanceMillisPerBatch", 60000)
      .load() // schema: timestamp, value
    val shaped = rate.selectExpr("value % 7 AS user_id", "timestamp AS ts",
      "CASE WHEN value % 2 = 0 THEN 'click' ELSE 'view' END AS event_type")
    val q = StreamOps.tumblingCounts(shaped)
      .writeStream.format("memory").queryName("rate_tumbling")
      .outputMode("update").start()
    try {
      // NB: processAllAvailable() would never return here — an unbounded
      // rate source always has another batch pending — so poll progress
      // instead and stop explicitly
      val deadline = System.currentTimeMillis() + 60000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        done = q.recentProgress.map(_.numInputRows).sum >= 300
      }
      assert(done, "rate source never delivered 3 micro-batches")
      val counts = spark.table("rate_tumbling")
      assert(counts.count() > 0)
      // every micro-batch contributes 50 clicks + 50 views
      import spark.implicits._
      val byType = counts.groupBy("event_type").count().as[(String, Long)]
        .collect().toMap
      assert(byType.keySet == Set("click", "view"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState custom sessionization emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = StreamOps.statefulSessions(spark, events).writeStream
      .format("memory").queryName("stateful").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // push the watermark far forward so open sessions time out and emit
      mem.addData((99L, ts("2024-01-02 12:00:00"), "tick"))
      q.processAllAvailable()
      mem.addData((99L, ts("2024-01-03 12:00:00"), "tick"))
      q.processAllAvailable()
      val got = spark.table("stateful").as[StreamOps.SessionOut].collect()
        .map(s => (s.user_id, s.session_start, s.n_events)).toSet
      assert(got.contains((1L, ts("2024-01-01 10:05:00"), 2L))) // merged pair
      assert(got.contains((1L, ts("2024-01-01 11:30:00"), 1L))) // post-gap
      assert(got.contains((2L, ts("2024-01-01 10:45:00"), 1L)))
    } finally q.stop()
  }

  test("transformWithState sessionization (arbitrary stateful v2) emits " +
      "exactly the flatMapGroupsWithState sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB provider (multiple column
    // families for state + timers)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val events = mem.toDF().toDF("user_id", "ts", "event_type")
      val q = StreamOps.statefulSessionsTws(spark, events).writeStream
        .format("memory").queryName("tws").outputMode("append").start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
        // the same watermark pushes that close the fMGWS twin's sessions
        mem.addData((99L, ts("2024-01-02 12:00:00"), "tick"))
        q.processAllAvailable()
        mem.addData((99L, ts("2024-01-03 12:00:00"), "tick"))
        q.processAllAvailable()
        val got = spark.table("tws").as[StreamOps.SessionOut].collect()
          .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
          .toSet
        // parity with the fMGWS implementation on identical input: the
        // closed user-1/user-2 sessions match field for field
        assert(got.contains((1L, ts("2024-01-01 10:05:00"),
          ts("2024-01-01 10:20:00"), 2L)))
        assert(got.contains((1L, ts("2024-01-01 11:30:00"),
          ts("2024-01-01 11:30:00"), 1L)))
        assert(got.contains((2L, ts("2024-01-01 10:45:00"),
          ts("2024-01-01 10:45:00"), 1L)))
        assert(got.contains((2L, ts("2024-01-01 11:50:00"),
          ts("2024-01-01 11:50:00"), 1L)))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState MapState+ListState (TimeMode.None) carries " +
      "per-type counts and a bounded recent ring with batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val events = mem.toDF().toDF("user_id", "ts", "event_type")
      val q = StreamOps.typeStatsTws(spark, events, k = 3).writeStream
        .format("memory").queryName("type_stats").outputMode("update").start()
      try {
        mem.addData(rows: _*) // 3 user-1 clicks, 2 user-2 views (ts order)
        q.processAllAvailable()
        // TimeMode.None drains normally — this wait returning IS part of
        // the pin (contrast with the ProcessingTime livelock below)
        mem.addData(
          (1L, ts("2024-01-01 12:00:00"), "view"),
          (1L, ts("2024-01-01 12:05:00"), "purchase"),
          (2L, ts("2024-01-01 12:10:00"), "view"))
        q.processAllAvailable()
        val out = spark.table("type_stats")
          .as[StreamOps.TypeStats].collect()
        // final counts per (user, type): the max across update-mode
        // re-emissions equals the batch groupBy of the same feed
        val finalCounts = out.groupBy(r => (r.user_id, r.event_type))
          .view.mapValues(_.map(_.cnt).max).toMap
        assert(finalCounts == Map(
          (1L, "click") -> 3L, (1L, "view") -> 1L, (1L, "purchase") -> 1L,
          (2L, "view") -> 3L))
        // the ring holds the LAST THREE types in event order: batch-2
        // rows for user 1 carry click>view>purchase, user 2 view>view>view
        assert(out.filter(r => r.user_id == 1L && r.event_type == "purchase")
          .map(_.recent_path).toSet == Set("click>view>purchase"))
        assert(out.filter(r => r.user_id == 2L)
          .map(_.recent_path).max == "view>view>view")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState ProcessingTime+TTL: poll-and-stop discipline " +
      "works, TTL state expires, and the 4.1 drain-livelock is still present") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // THE TRAP (reproduced on Spark 4.1.2, this repo, 2026-08; re-probed
    // r19 2026-08-17 against the same spark-sql_2.13-4.1.2.jar — javap of
    // TransformWithStateExecBase.shouldRunAnotherBatch still shows the
    // unconditional `timeMode == ProcessingTime → true` return, no patch
    // release in the jar set): the runner schedules empty micro-batch after
    // empty micro-batch to advance processing time. EVERY drain-style wait
    // livelocks — processAllAvailable() (~490 epochs/120 s observed) AND
    // Trigger.AvailableNow (~330 epochs before its 120 s timeout; it can
    // never see "done"). The supported discipline for ProcessingTime+TTL
    // pipelines is a periodic/default trigger + POLL THE SINK + explicit
    // stop, exactly what this test does. EventTime+explicit-timer
    // pipelines (statefulSessionsTws) drain normally — the parity test
    // above runs them under processAllAvailable.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val events = mem.toDF().toDF("user_id", "ts", "event_type")
      val ttlMs = 1000L
      def poll(deadlineMs: Long)(cond: => Boolean): Boolean = {
        val t0 = System.currentTimeMillis()
        while (!cond && System.currentTimeMillis() - t0 < deadlineMs)
          Thread.sleep(100L)
        cond
      }
      val q = StreamOps.ttlCountsTws(spark, events, ttlMs).writeStream
        .format("memory").queryName("ttl_counts").outputMode("update").start()
      try {
        def counts(): Map[Long, Seq[Long]] =
          spark.table("ttl_counts").as[StreamOps.KeyCount].collect()
            .groupBy(_.user_id).view.mapValues(_.map(_.cnt).toSeq).toMap
        mem.addData((1L, ts("2024-01-01 10:00:00"), "a"),
          (1L, ts("2024-01-01 10:00:01"), "b"),
          (2L, ts("2024-01-01 10:00:02"), "a"))
        assert(poll(60000L) {
          counts().get(1L).exists(_.contains(2L)) &&
            counts().get(2L).exists(_.contains(1L))
        }, s"first batch never reached the sink: ${counts()}")
        // let the TTL lapse in processing time, then touch key 1 again:
        // the evicted count restarts at 1 instead of resuming at 3
        Thread.sleep(3 * ttlMs)
        mem.addData((1L, ts("2024-01-01 10:00:10"), "c"))
        assert(poll(60000L) { counts().get(1L).exists(_.size >= 2) },
          s"second batch never reached the sink: ${counts()}")
        val k1 = counts()(1L)
        assert(k1.contains(1L) && !k1.contains(3L),
          s"key 1 should have restarted at 1 after TTL expiry, got $k1")
        // the livelock mechanism is still present: the runner keeps
        // emitting EMPTY batches between ours. If this count comes back
        // tiny on a future Spark, shouldRunAnotherBatch was fixed —
        // re-adjudicate the bounded-trigger guidance in ttlCountsTws's doc
        assert(poll(30000L) {
          q.recentProgress.count(_.numInputRows == 0) >= 5
        }, "ProcessingTime no longer schedules idle batches: the 4.1 " +
          "livelock seems FIXED — update StreamOps.ttlCountsTws guidance")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("tsMicros is monotonic across second boundaries, and typeStatsTws " +
      "orders sub-second events correctly within one micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the trap the r10 advice caught: Timestamp.getTime already includes
    // integral ms from nanos, so getTime*1000 + nanos/1000 double-counts
    // the ms component — 12:00:00.600 would sort AFTER 12:00:01.000
    assert(StreamOps.tsMicros(ts("2024-01-01 12:00:00.6")) <
      StreamOps.tsMicros(ts("2024-01-01 12:00:01")))
    assert(StreamOps.tsMicros(ts("2024-01-01 12:00:01")) <
      StreamOps.tsMicros(ts("2024-01-01 12:00:01.2")))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val events = mem.toDF().toDF("user_id", "ts", "event_type")
      val q = StreamOps.typeStatsTws(spark, events, k = 3).writeStream
        .format("memory").queryName("subsec_stats").outputMode("update").start()
      try {
        // one batch, sub-second timestamps straddling a second boundary:
        // the buggy ms-double-count key would order this b>a>c
        mem.addData(
          (1L, ts("2024-01-01 12:00:00.6"), "a"),
          (1L, ts("2024-01-01 12:00:01"), "b"),
          (1L, ts("2024-01-01 12:00:01.2"), "c"))
        q.processAllAvailable()
        val paths = spark.table("subsec_stats")
          .as[StreamOps.TypeStats].collect().map(_.recent_path).toSet
        assert(paths == Set("a>b>c"),
          s"sub-second within-batch order broke: $paths")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("ingestChunkStoreBatch skips a replayed (already-committed) batchId") {
    import spark.implicits._
    import graft.io.ChunkStore
    val base = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val (dir, ckpt) = (s"$base/store", s"$base/ckpt")
    val b0 = Seq((0L, "alpha beta gamma delta"), (1L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    StreamOps.ingestChunkStoreBatch(b0, 0L, dir, ckpt)
    val manifest0 = spark.read.parquet(s"$dir/manifest").count()
    val chunks0 = spark.read.parquet(s"$dir/chunks").count()
    // foreachBatch replay: same batchId arrives again after a recovery —
    // must be a no-op, not a duplicate manifest append
    StreamOps.ingestChunkStoreBatch(b0, 0L, dir, ckpt)
    assert(spark.read.parquet(s"$dir/manifest").count() == manifest0)
    assert(spark.read.parquet(s"$dir/chunks").count() == chunks0)
    // a genuinely new batch still lands
    val b1 = Seq((2L, "theta iota kappa")).toDF("doc_id", "text")
    StreamOps.ingestChunkStoreBatch(b1, 1L, dir, ckpt)
    assert(spark.read.parquet(s"$dir/manifest")
      .select("doc_id").distinct().count() == 3)
    // and the store still round-trips byte-exactly
    val all = b0.union(b1)
    val mismatches = all.as("o")
      .join(ChunkStore.materialize(spark, dir).as("r"), "doc_id", "full_outer")
      .where(col("o.text").isNull || col("r.text").isNull ||
        col("o.text") =!= col("r.text")).count()
    assert(mismatches == 0)
    // THE CLOSED RESIDUAL WINDOW (r17): a crash BETWEEN the append and
    // the checkpoint-side marker write replays the batch past the
    // marker check — the store's own _batch flag must no-op it instead
    // of duplicating manifest slots (the pre-r17 behavior)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest1 = spark.read.parquet(s"$dir/manifest").count()
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/_graft_last_batch"),
      false) // the marker write never happened
    StreamOps.ingestChunkStoreBatch(b1, 1L, dir, ckpt)
    assert(spark.read.parquet(s"$dir/manifest").count() == manifest1,
      "a marker-lost replay must not duplicate manifest slots")
    // …and the BOOTSTRAP's own window: batch 0 fully landed (snapshot
    // published, flag committed), marker lost — the replay goes down
    // the append path, where the manifest doc_id anti-join blocks
    // every row
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/_graft_last_batch"),
      false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_batch-0"), false)
    StreamOps.ingestChunkStoreBatch(b0, 0L, dir, ckpt)
    assert(spark.read.parquet(s"$dir/manifest").count() == manifest1,
      "a bootstrap replay must not duplicate manifest slots")
    val mismatches2 = all.as("o")
      .join(ChunkStore.materialize(spark, dir).as("r"), "doc_id", "full_outer")
      .where(col("o.text").isNull || col("r.text").isNull ||
        col("o.text") =!= col("r.text")).count()
    assert(mismatches2 == 0)
  }

  test("file sink resumes from its checkpoint exactly-once across a restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    def start() = spark.readStream.schema(schema).parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    // batch 1: first landing file, then stop the query entirely
    (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // a second landing file arrives while no query is running
    (100L until 150L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in)
    // restart from the SAME checkpoint: the committed first batch must not
    // replay (file-sink manifest + source offsets make the pair
    // exactly-once), the new file must be picked up
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 150L), s"expected exactly-once 0..149, got " +
      s"${got.size} rows (dups or losses)")
  }

  test("publishStagedDir: the loser of a concurrent publish race discards " +
      "its stage instead of nesting it inside the published directory") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft-pub").toString
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkStage(name: String): Path = {
      val stage = new Path(base, name)
      fs.mkdirs(stage)
      fs.create(new Path(stage, "part-00000.parquet"), true).close()
      fs.create(new Path(stage, "_graft_ready"), true).close()
      stage
    }
    val dest = new Path(base, "postings")
    // winner path: destination absent, stage renamed wholesale
    StreamOps.publishStagedDir(fs, mkStage("postings__stage-w"), dest)
    assert(fs.exists(new Path(dest, "_graft_ready")))
    assert(fs.exists(new Path(dest, "part-00000.parquet")))
    assert(!fs.exists(new Path(base, "postings__stage-w")))
    // loser path: destination already published. Hadoop rename into an
    // existing directory NESTS the source inside it (LocalFileSystem
    // included) and returns true, so the old !rename cleanup never ran —
    // the loser must detect the winner and delete its own stage, leaving
    // the published directory exactly as the winner wrote it
    val loser = mkStage("postings__stage-l")
    StreamOps.publishStagedDir(fs, loser, dest)
    assert(!fs.exists(loser), "loser stage must be discarded")
    val entries = fs.listStatus(dest).map(_.getPath.getName).toSet
    assert(entries == Set("_graft_ready", "part-00000.parquet"),
      s"published dir polluted: $entries")
  }

  test("ingestVectors: the first micro-batch bootstraps the IVF store, " +
      "later batches append exactly-once, and drifted arrivals retrain — " +
      "the full store lifecycle under streaming arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.Tables
    import graft.operators.Ivf
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("string").as("label"),
        col("embedding"))
      .as[(Long, String, Array[Float])]
    val rows = e.collect().sortBy(_._1)
    val n = rows.length
    val boot = rows.take(n / 2)
    val calm = rows.slice(n / 2, 3 * n / 4)
    // the EngineSpec adversarial-shift recipe: a tight new domain far
    // from the training distribution, so drift crosses the threshold
    val shifted = rows.drop(3 * n / 4)
      .map { case (id, l, emb) => (id, l, emb.map(x => x * 0.05f + 0.3f)) }
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-stream")
    val (dir, ckpt) = (s"$base/store", s"$base/ckpt")
    val mem = MemoryStream[(Long, String, Array[Float])]
    val vecs = mem.toDF().toDF("vec_id", "label", "embedding")
    val q = StreamOps.ingestVectors(vecs, dir, ckpt, driftThreshold = 0.35)
      .start()
    try {
      mem.addData(boot.toSeq: _*); q.processAllAvailable()
      assert(Ivf.servingIndex(spark, dir).count() == boot.length.toLong,
        "batch 0 must bootstrap the store")
      mem.addData(calm.toSeq: _*); q.processAllAvailable()
      val served = Ivf.servingIndex(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(served.distinct.size == served.size &&
        served.size == boot.length + calm.length,
        s"serving must be bootstrap ∪ appended batches: ${served.size}")
      val d1 = Ivf.describeStore(spark, dir).collect()
      assert(d1.map(_.getLong(0)).max == 0L,
        "stationary arrivals must not retrain")
      mem.addData(shifted.toSeq: _*); q.processAllAvailable()
      val d2 = Ivf.describeStore(spark, dir).collect()
      assert(d2.map(_.getLong(0)).max == 1L,
        s"drifted arrivals must publish a retrained version: ${d2.toSeq}")
      val served2 = Ivf.servingIndex(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(served2.distinct.size == served2.size && served2.size == n,
        s"the retrained version must serve the complete corpus: ${served2.size}")
    } finally q.stop()
    // foreachBatch replay (checkpoint commit lost after a successful
    // batch): a committed batchId is a no-op even across the retrain —
    // the _batch flags live at the store root, not per version
    val replayed = spark.createDataset(calm.toSeq)
      .toDF("vec_id", "label", "embedding")
    StreamOps.ingestVectorsBatch(replayed, 1L, dir)
    assert(Ivf.servingIndex(spark, dir).count() == n.toLong)
    // an empty micro-batch commits its id and changes nothing
    StreamOps.ingestVectorsBatch(replayed.limit(0), 99L, dir)
    assert(Ivf.servingIndex(spark, dir).count() == n.toLong)
    assert(new java.io.File(s"$dir/_batch-99").isFile)
    // bootstrap-crash replay (fresh store): a crash BETWEEN bootstrap
    // and flag re-runs the bootstrap, whose v0 writes are overwrite-
    // idempotent — and a flagged bootstrap batch replays as a no-op
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-boot")
      .toString
    val b0 = spark.createDataset(boot.toSeq).toDF("vec_id", "label", "embedding")
    StreamOps.ingestVectorsBatch(b0, 0L, dir2)
    StreamOps.ingestVectorsBatch(b0, 0L, dir2) // flagged: no-op
    assert(Ivf.servingIndex(spark, dir2).count() == boot.length.toLong)
    // crash between `_ready-0` and the flag: without the
    // _bootstrap_batch marker this replay would look like an append and
    // maintainIndex would DOUBLE-INGEST the bootstrap corpus
    new java.io.File(s"$dir2/_batch-0").delete()
    StreamOps.ingestVectorsBatch(b0, 0L, dir2)
    val ids2 = Ivf.servingIndex(spark, dir2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids2.distinct.size == ids2.size && ids2.size == boot.length,
      s"bootstrap replay must not duplicate the corpus: ${ids2.size}")
    assert(new java.io.File(s"$dir2/_batch-0").isFile,
      "the replay must re-commit the batch flag")
  }

  test("ingestVectors housekeeping: the compactEvery/vacuumRetainMs policy " +
      "folds file sprawl and GCs superseded versions inline with ingestion, " +
      "with serving exact throughout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ivf
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("string").as("label"),
        col("embedding"))
      .as[(Long, String, Array[Float])]
      .collect().sortBy(_._1)
    val chunks = rows.grouped(math.max(1, rows.length / 4)).toSeq.take(4)
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-hk")
    val (dir, ckpt) = (s"$base/store", s"$base/ckpt")
    val mem = MemoryStream[(Long, String, Array[Float])]
    val vecs = mem.toDF().toDF("vec_id", "label", "embedding")
    // stationary arrivals (huge drift threshold): versions only ever
    // advance through the POLICY's compactions, never retrains
    val q = StreamOps.ingestVectors(vecs, dir, ckpt, driftThreshold = 10.0,
      compactEvery = 2, vacuumRetainMs = 0L).start()
    try {
      chunks.zipWithIndex.foreach { case (c, i) =>
        mem.addData(c.toSeq: _*); q.processAllAvailable()
        val served = Ivf.servingIndex(spark, dir)
          .select("vec_id").collect().map(_.getLong(0)).toSeq
        val expect = chunks.take(i + 1).flatten.map(_._1)
        assert(served.sorted == expect.sorted.toSeq,
          s"after batch $i serving must be exactly the arrivals so far")
      }
    } finally q.stop()
    // the policy ran: the serving version is compacted (its partition
    // count is back under the threshold) and superseded versions are
    // GONE from disk while their _ready flags remain publication history
    val d = Ivf.describeStore(spark, dir).collect()
    val servingV = d.filter(_.getBoolean(1)).map(_.getLong(0)).max
    assert(servingV > 0, "compaction must have published new versions")
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.stripPrefix("v").toLong).sorted
    assert(onDisk.toSeq == Seq(servingV),
      s"vacuum must leave only the serving version on disk: ${onDisk.toSeq}")
    assert(new java.io.File(s"$dir/_ready-0").isFile,
      "vacuum must never delete the append-only flags")
    val servingRow = d.filter(_.getLong(0) == servingV).head
    assert(servingRow.getLong(4) < 2 + 1,
      s"serving version must be freshly folded: ${servingRow.getLong(4)} partitions")
    // a replayed already-committed batch still no-ops under the policy
    val replay = spark.createDataset(chunks(1).toSeq)
      .toDF("vec_id", "label", "embedding")
    StreamOps.ingestVectorsBatch(replay, 1L, dir, driftThreshold = 10.0,
      compactEvery = 2, vacuumRetainMs = 0L)
    assert(Ivf.servingIndex(spark, dir).count() == rows.length.toLong)
  }
}
