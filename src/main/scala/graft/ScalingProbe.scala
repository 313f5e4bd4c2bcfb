package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: run the pipeline at alternating thread counts in one JVM to
 *  separate JIT/run-order effects from true scaling. */
object ScalingProbe {
  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"probe-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toLong
    val work = java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft_probe").toString
    val corpusPath = s"$work/corpus"
    val s0 = session(8)
    graft.corpus.Corpus.synthetic(s0, docs).toDF()
      .repartition(64).write.mode("overwrite").parquet(corpusPath)
    Pipeline.run(graft.runtime.RunContext(s0, s"$work/warm"),
      s0.read.parquet(corpusPath).limit(3000)).clusters.count()
    s0.stop()

    var i = 0
    for (threads <- sys.env.getOrElse("SPARK_GRAFT_PROBE_SEQ", "32,8,32,8").split(",").map(_.trim.toInt).toSeq) {
      i += 1
      val s = session(threads)
      val t0 = System.nanoTime()
      Pipeline.run(graft.runtime.RunContext(s, s"$work/run$i"),
        s.read.parquet(corpusPath)).clusters.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] run$i local[$threads] ${dt}%.1f s  heap=${Runtime.getRuntime.totalMemory() / (1 << 20)}MB")
      s.stop()
    }
  }
}
