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

  test("append-mode deployment path: closed windows emit once, open windows carry over") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_app").toString
    def writeEvents(minutes: Seq[Int], mode: String): Unit =
      minutes.zipWithIndex
        .map { case (m, i) => (i.toLong, f"2026-01-01 00:$m%02d:30", 1L, "click", 1.0) }
        .toDF("event_id", "ts_s", "user_id", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode(mode).parquet(s"$tmp/in")

    // batch A: events in windows [00:00,05) [00:05,10) [00:15,20); max ts
    // 00:17:30 → watermark 00:07:30 → ONLY [00:00,05) has closed
    writeEvents(Seq(1, 2, 6, 17), "overwrite")
    EventsStream.runAppend(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val r1 = spark.read.parquet(s"$tmp/out").collect()
      .map(r => String.valueOf(r.get(0)).replace('T', ' ').take(16)).toSet
    assert(r1 === Set("2026-01-01 00:00"),
      s"append must emit exactly the windows the watermark closed, got $r1")

    // batch B: an event at 00:50 → watermark 00:40 → [00:05,10) and
    // [00:15,20) close and emit; [00:50,55) stays open in state
    writeEvents(Seq(50), "append")
    EventsStream.runAppend(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val r2 = spark.read.parquet(s"$tmp/out").collect()
    val starts = r2.map(r => String.valueOf(r.get(0)).replace('T', ' ').take(16)).toSeq
    assert(starts.sorted === Seq("2026-01-01 00:00", "2026-01-01 00:05", "2026-01-01 00:15"),
      s"carry-over windows must emit exactly once each, got $starts")
    // counts are the full batch answer for each closed window
    val byStart = r2.map(r => String.valueOf(r.get(0)).replace('T', ' ').take(16) -> r.getAs[Long]("n_events")).toMap
    assert(byStart("2026-01-01 00:00") === 2L)
    assert(byStart("2026-01-01 00:05") === 1L)
    assert(byStart("2026-01-01 00:15") === 1L)
  }
}
