package graft.runtime

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.util.CollectionAccumulator

/** One per-partition lineage/metrics row (north_rule: "emits per-partition
 *  lineage and metrics rows"). */
case class StageMetric(
    run_id: String,
    stage: String,
    partition_id: Int,
    rows: Long,
    nanos: Long)

/**
 * Per-partition instrumentation: a pass-through `mapPartitions` that counts
 * rows and wall time per partition into a driver-side accumulator, without
 * changing the data. Accumulators are the right channel here — metrics ride
 * the existing job instead of forcing a second action, and partial/retried
 * tasks are deduplicated by Spark's accumulator semantics for result stages.
 *
 * `instrument` sits *after* a stage's computation, so the recorded partition
 * row counts are exactly what the stage handed downstream — the lineage view
 * that makes skew visible (one partition with 100× the rows of its siblings
 * is the skew alarm north_rule asks to surface).
 */
class Metrics(spark: SparkSession, runId: String) extends Serializable {
  val acc: CollectionAccumulator[StageMetric] =
    spark.sparkContext.collectionAccumulator[StageMetric]("graft.metrics")

  /** Driver-side metrics row (skew-drop totals, stage-level counters):
   *  `partition_id = -1` marks it as not-a-partition. */
  def record(stage: String, rows: Long, nanos: Long = 0L): Unit =
    acc.add(StageMetric(runId, stage, -1, rows, nanos))

  def instrument(df: DataFrame, stage: String): DataFrame = {
    val a = acc
    val rid = runId
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val t0 = System.nanoTime()
      var n = 0L
      // Record exactly once per task: a consumer re-checking hasNext after
      // exhaustion must not double-count, and partitions terminated early
      // (limits) still record via the task-completion listener.
      var recorded = false
      def record(): Unit = if (!recorded) {
        recorded = true
        a.add(StageMetric(rid, stage, pid, n, System.nanoTime() - t0))
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => record()))
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) record()
          h
        }
        def next(): org.apache.spark.sql.Row = { n += 1; it.next() }
      }
    }(enc)
  }

  /** Collected metrics as a DataFrame — the metrics-table sink. */
  def toDF(): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(acc.value.asScala.toSeq)
  }
}
