package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: decompose the `candidates` stage cost at one thread count
 *  — explode, sketch build, pruned vs unpruned pair scan — to see where the
 *  stage's wall actually goes (the A/B wall numbers alone can't separate the
 *  band explode from the exchange+sort it feeds). Not part of the library
 *  surface; used to tune SeenTwice. */
object CandidatesProbe {
  def main(args: Array[String]): Unit = {
    val Array(threadsS, corpusPath) = args.take(2)
    val threads = threadsS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.model.DedupConfig
    import graft.operators.{ExactDedup, NearDup, Substring}
    val cfg = DedupConfig()
    def lap[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val corpusK = ExactDedup.validRows(spark.read.parquet(corpusPath))
      .withColumn("rkey", ExactDedup.rkey)
    val uniq = NearDup.dedupedByContentBroadcast(corpusK)
      .select(xxhash64(col("rkey")).as("id"),
        NearDup.shingleCol(col("content"), cfg.shingleN).as("shingles"))
      .persist()
    lap("uniq_fill")(uniq.count())
    val shingles = uniq.select(col("id"), col("shingles"), size(col("shingles")).as("n_shingles"))
      .where(col("n_shingles") > 0)
    val sigs = lap("signatures") {
      val s = NearDup.signaturesById(shingles, cfg).persist()
      s.count(); s
    }
    val banded = NearDup.bandedById(sigs, cfg)
    val nBand = lap("explode_count")(banded.count())
    System.err.println(s"[probe] band rows = $nBand")
    val log2m = graft.functions.SeenTwice.autoLog2m(nBand)
    val bits = lap("sketch_build")(graft.functions.SeenTwice.sketch(banded, "band_hash", log2m))
    val bc = spark.sparkContext.broadcast(bits)
    val pruned = banded.filter(org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SeenTwice.BitsetContainsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(banded("band_hash")), bc, log2m)))
    val nKept = lap("pruned_count")(pruned.count())
    System.err.println(f"[probe] kept $nKept of $nBand (${100.0 * nKept / nBand}%.1f%%)")
    // decompose the stage: pure exchange, +sort, +run-scan (no distinct),
    // full (with distinct) — for both raw and pruned inputs
    import spark.implicits._
    def scanPairs(df: org.apache.spark.sql.DataFrame) = df
      .repartition(col("band_hash"))
      .sortWithinPartitions("band_hash", "id")
      .select(col("band_hash"), col("id")).as[(Long, Long)]
      .mapPartitions(it => graft.functions.BucketScan.pairs(it, cfg.maxBucketSize, _ => ()))
      .toDF("a_id", "b_id")
    lap("exchange_only")(banded.repartition(col("band_hash")).count())
    val nEmit = lap("emit_no_distinct")(scanPairs(banded).count())
    System.err.println(s"[probe] emitted pair rows (pre-distinct) = $nEmit")
    lap("pairs_unpruned")(NearDup.candidateIdPairs(banded, cfg).count())
    lap("emit_no_distinct_pruned")(scanPairs(pruned).count())
    lap("pairs_pruned")(NearDup.candidateIdPairs(pruned, cfg).count())
    // gram side
    val grams = NearDup.dedupedByContentBroadcast(corpusK)
      .select(xxhash64(col("rkey")).as("id"),
        explode(Substring.rollingCol(col("content"), cfg.gramWidth, cfg.sampleMask)).as("gram"))
    val nG = lap("gram_explode_count")(grams.count())
    val log2g = graft.functions.SeenTwice.autoLog2m(nG)
    val gbits = lap("gram_sketch")(graft.functions.SeenTwice.sketch(grams, "gram", log2g))
    val gbc = spark.sparkContext.broadcast(gbits)
    val gpruned = grams.filter(org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SeenTwice.BitsetContainsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(grams("gram")), gbc, log2g)))
    val nGK = lap("gram_pruned_count")(gpruned.count())
    System.err.println(f"[probe] gram kept $nGK of $nG (${100.0 * nGK / nG}%.1f%%)")
    lap("gram_pairs_unpruned")(
      Substring.gramPairs(grams, cfg.minSharedGrams, cfg.maxBucketSize).count())
    lap("gram_pairs_pruned")(
      Substring.gramPairs(gpruned, cfg.minSharedGrams, cfg.maxBucketSize).count())
    // ---- substring verify decomposition (the stage's dominant cost?) ----
    val gp = Substring.gramPairs(gpruned, cfg.minSharedGrams, cfg.maxBucketSize)
      .persist()
    val nPairs = lap("sub_pairs_fill")(gp.count())
    System.err.println(s"[probe] substring candidate pairs = $nPairs")
    val contentById = corpusK.select(xxhash64(col("rkey")).as("rkey"), col("content"))
    val pk = gp.select(col("a_key").as("rkey"))
      .union(gp.select(col("b_key").as("rkey"))).distinct()
    val nMembers = lap("sub_member_keys")(pk.count())
    System.err.println(s"[probe] pair member keys = $nMembers")
    lap("sub_content_semi")(
      contentById.join(broadcast(pk), Seq("rkey"), "left_semi").count())
    lap("sub_verify_full")(
      Substring.verifiedSubstringPairs(gp, contentById, cfg.gramWidth).count())
    gp.unpersist()
    // near-side verify for comparison
    val nshingles = uniq.select(col("id"), col("shingles"),
      size(col("shingles")).as("n_shingles")).where(col("n_shingles") > 0)
    val cand = NearDup.candidateIdPairs(pruned, cfg).persist()
    lap("near_cand_fill")(cand.count())
    lap("near_verify_full")(
      NearDup.verifyCandidatesById(cand, nshingles, cfg).count())
    cand.unpersist()
    spark.stop()
  }
}
