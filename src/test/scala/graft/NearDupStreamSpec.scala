package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.model.DedupConfig
import graft.operators.NearDup
import graft.streaming.NearDupStream

/** Streaming incremental near-dup candidates (two chained Append-mode
 *  flatMapGroupsWithState stages): static single-batch mode must reproduce
 *  the batch LSH candidate set exactly; a second micro-batch must pair new
 *  representatives against RETAINED bucket members; the bucket cap is
 *  prefix-emit with a sticky drop flag. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val cfg = DedupConfig()

  private def batchCandidates(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val corpusK = graft.operators.ExactDedup.validRows(corpus)
      .withColumn("rkey", graft.operators.ExactDedup.rkey)
    val sh = NearDup.uniqShingleSets(corpusK, cfg)
      .select(xxhash64(col("rkey")).as("id"), col("shingles"),
        col("n_shingles"))
    NearDup.candidateIdPairs(
        NearDup.bandedById(NearDup.signaturesById(sh, cfg), cfg), cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .map((p: (Long, Long)) => (math.min(p._1, p._2), math.max(p._1, p._2)))
  }

  test("static single-batch run reproduces the batch LSH candidate set exactly") {
    val corpus = Corpus.synthetic(spark, 300, seed = 23L).toDF()
    val corpusK = graft.operators.ExactDedup.validRows(corpus)
      .withColumn("rkey", graft.operators.ExactDedup.rkey)
    val got = NearDupStream.candidateIdPairs(corpusK, cfg).toDF().distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = batchCandidates(corpus)
    assert(want.nonEmpty && got === want)
  }

  test("two micro-batches: new reps pair against retained bucket members; union = static set") {
    val corpus = Corpus.synthetic(spark, 300, seed = 23L).toDF().cache()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndstream").toString
    // split by CONTENT so an exact-dup group never spans batches: the stream
    // elects its rep from the first-seeing batch (sticky), so a group whose
    // global-min rkey arrived later would legitimately diverge from the
    // static run — causal semantics, not a bug (same story as DedupStream's
    // sticky keepers). Near-dup PAIRS still span batches, which is the
    // incremental behavior under test.
    val b1 = corpus.where(pmod(xxhash64(col("content")), lit(2)) === 0)
    val b2 = corpus.where(pmod(xxhash64(col("content")), lit(2)) === 1)
    b1.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    NearDupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", cfg)
    val after1 = spark.read.parquet(s"$tmp/out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    b2.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    NearDupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt", cfg)
    val after2 = spark.read.parquet(s"$tmp/out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = batchCandidates(corpus)
    assert(after2 === want, "streamed union != static candidate set")
    assert(after1.subsetOf(after2))
    // incremental pairing actually happened: batch 2 emitted pairs, and at
    // least one pair joins a batch-1 rep to a batch-2 rep (retained state)
    val ids1 = b1.select(xxhash64(concat(col("repo"), lit("/"), col("path")))).collect()
      .map(_.getLong(0)).toSet
    val cross = (after2 -- after1).exists { case (a, b) =>
      ids1.contains(a) ^ ids1.contains(b)
    }
    assert((after2 -- after1).nonEmpty)
    assert(cross, "no cross-batch pair — bucket state was not retained")
    corpus.unpersist()
  }

  test("bucket cap is prefix-emit with a sticky drop flag") {
    import spark.implicits._
    val rows = (1L to 5L).map(i => NearDupStream.BandRow(77L, i))
    val got = NearDupStream.bucketPairs(rows.toDS(), cap = 3).collect()
    // first 3 arrivals pair among themselves (3 choose 2), the cap-crossing
    // 4th and everything after emit nothing
    assert(got.length === 3)
    got.foreach { p =>
      assert(p.a_id < p.b_id)
      assert((1L to 5L).contains(p.a_id) && (1L to 5L).contains(p.b_id))
    }
  }
}
