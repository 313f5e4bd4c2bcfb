package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Benchmark harness. Two phases:
 *
 *  1. per-query timing of every `SparkEntry.queries` entry on
 *     `SPARK_GRAFT_SF_DIR` at `SPARK_GRAFT_CPUS` threads (driver contract);
 *  2. scaling evidence (north_rule: throughput at N vs 4N with efficiency
 *     ≥ 0.8, evidenced as local[N] vs local[4N] per the driver instruction):
 *     the full checkpointed [[Pipeline]] over one pre-materialized synthetic
 *     corpus, timed at both parallelism levels with PAIRED alternating
 *     fresh-JVM reps; the reported efficiency is the median of per-rep
 *     ratios (advice: unpaired per-arm minima can fabricate any number on a
 *     noisy VM), with dispersion and a per-stage breakdown alongside.
 *     Results → BENCH/BASELINE.md.
 *
 * Prints exactly one JSON line at the end.
 */
object Bench {

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", (4 * threads).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** JDK-17 module opens Spark needs outside spark-submit (same list as
   *  build.sbt's fork options). */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private case class RunResult(seconds: Double, rows: Long, stages: Map[String, Double])

  /** One timed pipeline run in a FRESH child JVM: clean JIT/GC state — the
   *  in-JVM probe showed 3× swings for identical work otherwise. Captures
   *  per-stage wall times (the timed run's stage lines overwrite the
   *  warm-up's — last occurrence wins). */
  private def timePipeline(threads: Int, corpusPath: String, runDir: String): RunResult = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx12g", "-cp", System.getProperty("java.class.path"),
      "-Dspark.ui.enabled=false",
      "graft.ScalingRun", threads.toString, corpusPath, runDir)
    val out = new StringBuilder
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val rd = new java.io.BufferedReader(new java.io.InputStreamReader(p.getInputStream))
    var line = rd.readLine()
    while (line != null) { out.append(line).append('\n'); line = rd.readLine() }
    require(p.waitFor() == 0, s"child run failed:\n${out.takeRight(2000)}")
    val Re = """\[scaling_run\] threads=\d+ seconds=([0-9.]+) rows=(\d+)""".r
    val StageRe = """\[graft.stage\] (\S+) ([0-9.]+) s""".r
    val stages = StageRe.findAllMatchIn(out.toString)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.last._2 } // timed run = last
    Re.findFirstMatchIn(out)
      .map(m => RunResult(m.group(1).toDouble, m.group(2).toLong, stages))
      .getOrElse(sys.error(s"no scaling_run line in child output:\n${out.takeRight(2000)}"))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Raw CPU scaling ceiling nLow→nHigh threads (pure hash loop, no Spark):
   *  the measurable upper bound for any parallel job on this VM. */
  private def cpuCeiling(nLow: Int, nHigh: Int): Double = {
    val buf = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    def work(iters: Long): Long = {
      var h = 0L; var i = 0L
      while (i < iters) { h ^= graft.functions.XXHash64.hash(buf, i); i += 1 }
      h
    }
    work(2000000)
    def rate(threads: Int): Double = {
      val iters = 2000000L
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ => val t = new Thread(() => { work(iters) }); t.start(); t }
      ts.foreach(_.join())
      threads * iters / ((System.nanoTime() - t0) / 1e9)
    }
    // alternate and take best-of-2 per level (pure CPU is stable; co-tenant
    // bursts only ever slow it down)
    val rLow = math.max(rate(nLow), rate(nLow))
    val rHigh = math.max(rate(nHigh), rate(nHigh))
    rHigh / (4.0 * rLow)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    val work = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft_bench").toString

    // ---- Phase 1: per-query timings -------------------------------------
    val s1 = session(cpus)
    val queryTimes = if (sys.env.contains("SPARK_GRAFT_SCALING_ONLY")) Seq.empty
    else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(s1, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Pre-materialize the scaling corpus.
    val corpusPath = s"$work/corpus"
    graft.corpus.Corpus.synthetic(s1, benchDocs).toDF()
      .repartition(64).write.mode("overwrite").parquet(corpusPath)
    s1.stop()

    // ---- Phase 2: scaling evidence (N vs 4N cores) -----------------------
    // N defaults to 4 (vs 4N=16): on this VM a local[32] JVM oversubscribes
    // the deliverable vCPUs once Spark's service threads and the host
    // harness are counted (CpuProbe: raw 8→32 CPU scaling ≈ 3.3x but Spark
    // service threads push past the core count); 4 vs 16 keeps both levels
    // inside deliverable cores. Alternating PAIRED fresh-JVM reps; the
    // efficiency estimate is the median of per-rep ratios.
    val nLow = sys.env.getOrElse("SPARK_GRAFT_N", "4").toInt
    val nHigh = 4 * nLow
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val ceiling = cpuCeiling(nLow, nHigh)
    var n = 0L
    val highs = Seq.newBuilder[RunResult]
    val lows = Seq.newBuilder[RunResult]
    for (r <- 1 to reps) {
      val a = timePipeline(nHigh, corpusPath, s"$work/run$nHigh-$r")
      val b = timePipeline(nLow, corpusPath, s"$work/run$nLow-$r")
      n = a.rows; highs += a; lows += b
      System.err.println(f"[bench] rep $r: t$nHigh=${a.seconds}%.1f s t$nLow=${b.seconds}%.1f s ratio=${b.seconds / a.seconds}%.2f")
    }
    val (rawHigh, rawLow) = (highs.result(), lows.result())
    val ratios = rawHigh.zip(rawLow).map { case (h, l) => l.seconds / h.seconds }
    val effs = ratios.map(_ / 4.0)
    val eff = median(effs)
    val tHigh = median(rawHigh.map(_.seconds))
    val tLow = median(rawLow.map(_.seconds))
    val fpsHigh = n / tHigh
    val fpsLow = n / tLow
    val effOfCeiling = eff / ceiling

    // per-stage medians for the 4-vs-16 breakdown table
    val stageNames = rawHigh.flatMap(_.stages.keys).distinct.sorted
    val stageTable = stageNames.map { st =>
      val h = median(rawHigh.flatMap(_.stages.get(st)))
      val l = median(rawLow.flatMap(_.stages.get(st)))
      f"| $st | $l%.1f | $h%.1f | ${l / h}%.2f |"
    }.mkString("\n")

    val baseline =
      f"""# BENCH/BASELINE — measured scaling evidence
         |
         |Workload: full checkpointed dedup pipeline (exact sha256 snapshot +
         |MinHash/LSH near-dup + verified substring fingerprints + connected-
         |components clusters) over a deterministic synthetic corpus, same
         |input at both parallelism levels (driver rule: no real cluster —
         |local[$nLow] vs local[$nHigh] stands in for N vs 4N executors).
         |
         |Methodology (per round-1 advice): $reps PAIRED alternating reps,
         |one fresh child JVM per run (clean JIT/GC state); efficiency =
         |median over reps of (t_low_i / t_high_i) / 4 — paired ratios, not
         |per-arm minima, because identical runs on this shared VM swing with
         |co-tenant bursts. Dispersion is reported below.
         |
         |Raw samples (s): local[$nHigh] = ${rawHigh.map(r => f"${r.seconds}%.1f").mkString(", ")};
         |local[$nLow] = ${rawLow.map(r => f"${r.seconds}%.1f").mkString(", ")}.
         |Per-rep efficiencies: ${effs.map(e => f"$e%.3f").mkString(", ")}
         |(median ${eff}%.3f, min ${effs.min}%.3f, max ${effs.max}%.3f).
         |
         |Hardware ceiling, measured in-run (pure-hash threads, no Spark):
         |raw $nLow→$nHigh-thread CPU scaling efficiency = ${ceiling}%.3f on this VM.
         |Job efficiency relative to that ceiling: ${effOfCeiling}%.3f.
         |Local mode additionally shares ONE memory bus across both arms,
         |where a real 4N cluster brings 4x shuffle/memory bandwidth — the
         |local measurement structurally understates cluster scaling for
         |shuffle-bound stages.
         |
         || quantity | value |
         ||---|---|
         || corpus files | $n |
         || local[$nLow] wall (median) | ${tLow}%.1f s |
         || local[$nHigh] wall (median) | ${tHigh}%.1f s |
         || throughput local[$nLow] | ${fpsLow}%.0f files/sec |
         || throughput local[$nHigh] | ${fpsHigh}%.0f files/sec |
         || scaling efficiency (median paired) | ${eff}%.3f |
         || hardware ceiling (same pair) | ${ceiling}%.3f |
         || efficiency / ceiling | ${effOfCeiling}%.3f |
         || target (north_rule) | >= 0.8 |
         |
         |Per-stage medians (materialized stages only; light stages fold into
         |their consumers):
         |
         || stage | local[$nLow] s | local[$nHigh] s | ratio |
         ||---|---|---|---|
         |$stageTable
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), baseline)

    val qs = queryTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    val scaling =
      f"""{"docs":$n,"n_low":$nLow,"n_high":$nHigh,"t_low_sec":$tLow%.2f,"t_high_sec":$tHigh%.2f,"fps_low":$fpsLow%.1f,"fps_high":$fpsHigh%.1f,"efficiency":$eff%.3f,"eff_min":${effs.min}%.3f,"eff_max":${effs.max}%.3f,"cpu_ceiling":$ceiling%.3f,"eff_of_ceiling":$effOfCeiling%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")

    // tmpfs hygiene: the work dir lives in RAM
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(work)).deleteRecursively()
    } catch { case _: Throwable => }
  }
}
