package graft

import org.apache.spark.sql.SparkSession

/** Child-process entry for one timed pipeline run: fresh JVM = clean JIT/GC
 *  state, no cross-run contamination (the in-JVM probe showed 3× wall-time
 *  swings for identical work from accumulated allocation churn alone).
 *  Prints a single `[scaling_run] threads=<t> seconds=<s> rows=<n>` line. */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val Array(threadsS, corpusPath, runDir) = args
    val threads = threadsS.toInt
    // Shuffle partitions are decoupled from the thread count: with
    // partitions == threads, AQE coalesces every small exchange down to a
    // handful of partitions and post-shuffle stages run at the SAME
    // parallelism in both arms — the round-1 scaling collapse. A fixed
    // over-partitioned value, IDENTICAL in both arms (fairness), keeps every
    // stage wide enough for the high arm; AQE still coalesces the tiny ones.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-scaling-$threads")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      // commit algorithm v2: task outputs move straight to the destination
      // at task commit instead of a serial driver-side rename pass at job
      // commit — the parquet-commit slice of the serial stage floor, safe
      // here (tmpfs, no speculative tasks, whole-directory overwrite).
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.eventLog.enabled", sys.env.contains("SPARK_GRAFT_EVENTLOG").toString)
      .config("spark.eventLog.dir", sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "/tmp/spark-events"))
      .config("spark.eventLog.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (!new java.io.File(corpusPath).exists()) {
        val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
        graft.corpus.Corpus.synthetic(spark, docs).toDF()
          .repartition(64).write.mode("overwrite").parquet(corpusPath)
      }
      val corpus = spark.read.parquet(corpusPath)
      val n = corpus.count()
      // small JIT warmup before the timed run (codegen + shuffle paths);
      // its cached light stages are dropped before timing starts
      val warmCtx = graft.runtime.RunContext(spark, s"$runDir-warm")
      Pipeline.run(warmCtx, corpus.limit(2000)).clusters.count()
      warmCtx.cleanup()
      val t0 = System.nanoTime()
      val ctx = graft.runtime.RunContext(spark, runDir)
      // SPARK_GRAFT_PRUNE=0 disables the SeenTwice singleton prune — the
      // A/B knob for measuring the prune under one weather window.
      val cfg = graft.model.DedupConfig(
        pruneSingletons = !sys.env.get("SPARK_GRAFT_PRUNE").contains("0"))
      val res = Pipeline.run(ctx, corpus, cfg)
      require(res.clusters.count() > 0)
      val dt = (System.nanoTime() - t0) / 1e9
      ctx.cleanup()
      println(f"[scaling_run] threads=$threads seconds=$dt%.3f rows=$n")
    } finally spark.stop()
  }
}
