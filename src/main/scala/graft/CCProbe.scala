package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused micro-probe for the connected-components iteration cost (dev
 *  tool; not part of the driver contract). Builds a synthetic edge set and
 *  times CC under the current implementation, printing one iteration's
 *  physical plan so exchange-reuse regressions are visible. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val threads = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", (4 * threads).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // chains of length 8 + some stars: forces a few iterations
    val edges = spark.range(0, n).select(
      (col("id") * 31L).as("src"),
      when(col("id") % 8 === 0, col("id") * 31L + 7L).otherwise(col("id") * 31L - 31L).as("dst"))
      .localCheckpoint()
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val cc = graft.operators.Clustering.connectedComponents(edges)
      val n2 = cc.count()
      println(f"[ccprobe] round=$round nodes=$n2 total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
