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
 * Scale notes: the aggregation keys are (5-minute window, event_type) —
 * bounded state; the watermark bounds it further against late data (state
 * for windows older than the watermark is evicted, so state size is
 * O(active windows × event types), independent of stream length). The same
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

  /** One-shot micro-batch run (Trigger.AvailableNow) into an in-memory sink;
   *  returns the result table name. Used by the spec and as the reference
   *  wiring for a real `writeStream.toTable(...)` deployment. */
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
}
