package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-6 exercise of the band-range candidate driver at BENCH SCALE
 * (round-5 verdict "Next round #4": the 10⁹-doc recipe had only ever run in
 * BandRangeSpec at toy size). Over a pre-materialized synthetic corpus
 * (e.g. the campaign corpus at /dev/shm/graft_corpus) this times
 *
 *   1. the single-pass candidates stage (prune → one exchange → run-scan),
 *   2. the band-RANGED driver with `pruneShardedMaxRows` lowered so the
 *      corpus routes through ≥ 4 ranges (each range re-entering the prune's
 *      effective-load window, one sketch live at a time),
 *
 * and asserts the two distinct pair sets are IDENTICAL (count + symmetric
 * difference). Usage:
 *   graft.tools.BandRangeProbe <threads> <corpusPath> [rangesTarget]
 */
object BandRangeProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val corpusPath = args(1)
    val rangesTarget = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", (4 * threads).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.model.DedupConfig
    import graft.operators.{ExactDedup, NearDup}
    val cfg = DedupConfig()
    def lap[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bandrange] $name $s%.1f s")
      (r, s)
    }
    val corpusK = ExactDedup.validRows(spark.read.parquet(corpusPath))
      .withColumn("rkey", ExactDedup.rkey)
    val uniq = NearDup.dedupedByContentBroadcast(corpusK)
      .select(xxhash64(col("rkey")).as("id"),
        NearDup.shingleCol(col("content"), cfg.shingleN).as("shingles"))
      .select(col("id"), col("shingles"), size(col("shingles")).as("n_shingles"))
      .where(col("n_shingles") > 0)
    val sigs = NearDup.signaturesById(uniq, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSigs = sigs.count()
    val bandRows = nSigs * cfg.bands
    System.err.println(s"[bandrange] signatures=$nSigs bandRows=$bandRows")

    // ---- arm 1: single pass (prune regime chosen as the pipeline would) ----
    val (single, tSingle) = lap("single_pass") {
      val banded = NearDup.bandedById(sigs, cfg)
      val pruned =
        if (bandRows >= cfg.pruneMinRows && bandRows <= cfg.pruneMaxRows)
          graft.functions.SeenTwice.prune(banded, "band_hash",
            graft.functions.SeenTwice.autoLog2m(bandRows))
        else if (bandRows > cfg.pruneMaxRows) {
          val (l2, sb) = graft.functions.SeenTwice.autoShardedBits(bandRows)
          graft.functions.SeenTwice.pruneSharded(banded, "band_hash", l2, sb)
        } else banded
      val p = NearDup.candidateIdPairs(pruned, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (p, p.count())
    }
    System.err.println(s"[bandrange] single-pass pairs=${single._2}")

    // ---- arm 2: band-ranged driver, forced to >= rangesTarget ranges ----
    val loweredMax = math.max(1L, bandRows / rangesTarget)
    val cfgRanged = cfg.copy(pruneShardedMaxRows = loweredMax)
    val runDir = s"/dev/shm/graft_bandrange_${System.nanoTime()}"
    val (ranged, tRanged) = lap("band_ranged") {
      val p = NearDup.candidateIdPairsBandRanged(sigs, cfgRanged, runDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (p, p.count())
    }
    System.err.println(s"[bandrange] ranged pairs=${ranged._2}")

    val onlySingle = single._1.except(ranged._1).count()
    val onlyRanged = ranged._1.except(single._1).count()
    val equal = onlySingle == 0 && onlyRanged == 0 && single._2 == ranged._2
    println(f"""{"metric":"band_range_probe","docs":$nSigs,"band_rows":$bandRows,""" +
      f""""t_single_sec":$tSingle%.1f,"t_ranged_sec":$tRanged%.1f,""" +
      f""""ratio":${tRanged / tSingle}%.2f,"pairs_single":${single._2},""" +
      f""""pairs_ranged":${ranged._2},"only_single":$onlySingle,"only_ranged":$onlyRanged,""" +
      f""""pair_sets_equal":$equal}""")
    // /dev/shm hygiene
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(runDir)).deleteRecursively()
    } catch { case _: Throwable => }
    spark.stop()
  }
}
