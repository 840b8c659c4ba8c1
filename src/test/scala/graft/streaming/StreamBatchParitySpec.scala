package graft.streaming

import graft.{SparkFixture, Tables}
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity over the real corpus: the streaming tumbling window
  * replayed from a file source must produce exactly the batch Q-T01 counts
  * (same bucket semantics, no dropped or duplicated events). This is the
  * t1 streaming smoke from SURVEY §5.2 run against real files rather than
  * a MemoryStream.
  */
class StreamBatchParitySpec extends AnyFunSuite with SparkFixture {

  test("file-source streaming tumbling counts equal the batch query") {
    // stream the events table through the same normalization Tables.events
    // applies (nanos → µs), one file = one micro-batch replay
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source wants a directory; stage the single corpus
    // file into one (simulating an arriving-files landing zone)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val events = raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    val q = StreamOps.tumblingCounts(events).writeStream
      .format("memory").queryName("parity").outputMode("update").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity")
        .select(col("hr"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = Temporal.qT01(spark, sfDir)
        .select(col("hr"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
