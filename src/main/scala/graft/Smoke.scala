package graft

import org.apache.spark.sql.SparkSession

/** Local smoke driver: runs SparkEntry.entry (the flagship query) and prints
 *  row count + formatted physical plan — the per-operator plan-inspection
 *  loop the build instructions call for. `runMain graft.Smoke [queryName]`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = args.headOption match {
      case Some(q) if SparkEntry.queries.contains(q) =>
        SparkEntry.queries(q)(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
      case _ => SparkEntry.entry(spark)
    }
    df.explain("formatted")
    println(s"[smoke] rows=${df.count()}")
    spark.stop()
  }
}
