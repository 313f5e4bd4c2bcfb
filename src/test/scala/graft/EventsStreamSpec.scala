package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Structured Streaming ingestion: a micro-batch (AvailableNow) run over the
 *  static events table must reproduce the batch q20 aggregation exactly. */
class EventsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed aggregation equals the batch answer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // file streams consume a DIRECTORY of arriving files — stage the static
    // table as one arrival
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$tmp/in/events.parquet"))
    EventsStream.runAvailableNow(spark, s"$tmp/in", "events_sink",
      s"$tmp/ckpt")
    val got = spark.table("events_sink").collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventsStream.windowAgg(spark.read.parquet(s"$dir/events.parquet"))
      .collect()
      .map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("watermark bounds state: aggregation plan carries the event-time watermark") {
    val s = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, s"$dir/events.parquet"))
    assert(s.isStreaming)
    assert(s.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
  }
}
