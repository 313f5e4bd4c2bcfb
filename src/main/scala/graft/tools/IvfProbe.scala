package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 scratch probe: attribute the ~1 s single-task Lloyd stages of
 *  q26 to a layer (cache read / assignment UDF / explode+agg). Diagnostic
 *  only — not part of any query path. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val normed = graft.operators.Similarity.normQuantized(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    normed.count()
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfprobe] $what ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      time(s"cache-count rep$rep") { normed.count() }
      // plain driver-side compute of the same assignment workload
      val local = time(s"collect-nq rep$rep") { normed.select("nq").collect().map(_.getSeq[Long](0).toArray) }
      val cents = local.take(45)
      time(s"driver-assign rep$rep") {
        var s = 0L
        local.foreach { v =>
          var best = 0; var bestD = Long.MaxValue; var c = 0
          while (c < cents.length) {
            val ctr = cents(c); var d = 0L; var i = 0
            while (i < ctr.length && i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
            if (d < bestD) { bestD = d; best = c }; c += 1
          }
          s += best
        }
        s
      }
      val assignUdf = udf((v: Seq[Long]) => {
        var best = 0; var bestD = Long.MaxValue; var c = 0
        while (c < cents.length) {
          val ctr = cents(c); var d = 0L; var i = 0
          while (i < ctr.length && i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }; c += 1
        }
        best
      })
      val assigned = normed.select(assignUdf(col("nq")).as("cell"), col("nq"))
      time(s"assign-count rep$rep") { assigned.count() }
      time(s"assign-agg-collect rep$rep") {
        assigned.select(col("cell"), posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("cell", "pos")
          .agg(sum(col("component")).as("s"), count(lit(1)).as("c")).collect().length
      }
      time(s"explode-agg-nocell rep$rep") {
        normed.select(posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("pos").agg(sum(col("component"))).collect().length
      }
      val assignedND = normed.select(assignUdf.asNondeterministic()(col("nq")).as("cell"), col("nq"))
      time(s"assign-agg-collect-nondet rep$rep") {
        assignedND.select(col("cell"), posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("cell", "pos")
          .agg(sum(col("component")).as("s"), count(lit(1)).as("c")).collect().length
      }
      time(s"udf-only-sum rep$rep") {
        assigned.select(sum(col("cell"))).collect()
      }
      val assignUdfArr = udf((v: Array[Long]) => {
        var best = 0; var bestD = Long.MaxValue; var c = 0
        while (c < cents.length) {
          val ctr = cents(c); var d = 0L; var i = 0
          while (i < ctr.length && i < v.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }; c += 1
        }
        best
      })
      time(s"udfArr-only-sum rep$rep") {
        normed.select(assignUdfArr(col("nq")).as("cell")).select(sum(col("cell"))).collect()
      }
      val trivUdf = udf((v: Seq[Long]) => v.length)
      time(s"udfTrivial-only-sum rep$rep") {
        normed.select(trivUdf(col("nq")).as("cell")).select(sum(col("cell"))).collect()
      }
      time(s"constcell-agg-collect rep$rep") {
        normed.select((col("vec_id") % 45).cast("int").as("cell"), col("nq"))
          .select(col("cell"), posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("cell", "pos")
          .agg(sum(col("component")).as("s"), count(lit(1)).as("c")).collect().length
      }
      time(s"assign-ckpt-agg rep$rep") {
        val a = assigned.localCheckpoint()
        a.select(col("cell"), posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("cell", "pos")
          .agg(sum(col("component")).as("s"), count(lit(1)).as("c")).collect().length
      }
      if (rep == 1) {
        println("=== deterministic plan ===")
        println(assigned.select(col("cell"), posexplode(col("nq")).as(Seq("pos", "component")))
          .groupBy("cell", "pos").agg(sum(col("component"))).queryExecution.executedPlan.toString.take(3000))
      }
    }
    spark.stop()
  }
}
