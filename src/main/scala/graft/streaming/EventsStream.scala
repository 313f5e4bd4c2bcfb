package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/**
 * Streaming ingestion path (engine capability beyond the batch-only
 * reference): the events windowed aggregation of `q20_events_window`
 * expressed as a Structured Streaming job — same aggregation expression, so
 * a micro-batch run over a static directory must produce exactly the batch
 * answer (EventsStreamSpec asserts this).
 *
 * Scale notes: the aggregation keys are (5-minute window, event_type).
 * The watermark's state bound — windows below the watermark evicted, state
 * O(active windows × event types) independent of stream length — holds in
 * APPEND/UPDATE output modes ([[runAppend]], the deployment path); in
 * COMPLETE mode ([[runAvailableNow]], the batch-parity harness) Spark
 * retains every window ever seen, by design of that mode. The same
 * shuffle reasoning as the batch job applies: partial aggregation runs
 * map-side per micro-batch before the state-store exchange.
 */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** The shared window aggregation (identical expression to q20's batch
   *  form; `floor(value·1000)` keeps sums in exact integer space). */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_value_q"))

  /** Open a file-source stream over a parquet directory of events. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /**
   * Streaming variant with a watermark: complete-mode aggregation for the
   * micro-batch/backfill case. `withWatermark` bounds state; 10 minutes
   * tolerates the driver data's out-of-order timestamps. Event-time
   * watermarks require TIMESTAMP (not NTZ): cast in (and the window start
   * back out) — value-preserving under the engine's fixed UTC session zone,
   * so the output is bit-identical to the batch aggregation over the NTZ
   * column.
   */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    windowAgg(events.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark))
      .withColumn("window_start", col("window_start").cast("timestamp_ntz"))

  /** One-shot micro-batch run (Trigger.AvailableNow) into an in-memory sink.
   *  COMPLETE output mode: the full result table every trigger — the
   *  batch-parity harness (EventsStreamSpec compares it row-for-row against
   *  the batch aggregation), NOT the deployment path. In complete mode Spark
   *  retains ALL window state (nothing is evicted below the watermark), so
   *  state grows with total distinct windows — fine for a bounded backfill,
   *  wrong for an unbounded stream; deploy with [[runAppend]]. */
  def runAvailableNow(spark: SparkSession, dir: String, sinkName: String,
                      checkpointDir: String): Unit = {
    val q = windowedCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The unbounded-stream deployment path: APPEND mode into a durable
   *  parquet sink. A window's row is emitted once, when the watermark passes
   *  its end — which is precisely the mode where the watermark's state bound
   *  actually holds (state = O(active windows × event types); closed windows
   *  are evicted after emission). Windows still open when the last available
   *  batch ends stay in the checkpointed state store and emit on a later
   *  run — EventsStreamSpec drives two runs to prove both the emitted-once
   *  and the carry-over behavior. */
  def runAppend(spark: SparkSession, dir: String, outDir: String,
                checkpointDir: String): Unit = {
    // Append-mode eligibility requires grouping by the event-time `window`
    // STRUCT itself (Spark ties watermark eviction to it); the start field
    // is projected out after the aggregation — same result columns as
    // [[windowAgg]].
    val agg = readEvents(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("sum_value_q"))
      .select(col("window").getField("start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value_q"))
    val q = agg
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ()
  }
}
