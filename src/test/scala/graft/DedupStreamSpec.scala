package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.operators.ExactDedup
import graft.streaming.DedupStream

/** Streaming incremental dedup (flatMapGroupsWithState): a single-batch run
 *  must reproduce the batch snapshot's keeper election exactly; a second
 *  micro-batch over late arrivals must dedup against the RETAINED keeper
 *  state without re-emitting old rows. */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("single AvailableNow batch reproduces the batch snapshot; late arrivals join sticky keepers") {
    val corpus = Corpus.synthetic(spark, 300, seed = 13L).toDF()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    corpus.coalesce(2).write.mode("overwrite").parquet(s"$tmp/in")

    DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val s1 = spark.read.parquet(s"$tmp/out").collect()
    assert(s1.nonEmpty)

    // exactly one keep per group, keeper is a member, symlinks point at it
    val byGroup = s1.groupBy(_.getAs[String]("group_id"))
    byGroup.foreach { case (_, rows) =>
      val keeps = rows.filter(_.getAs[String]("action") == "keep")
      assert(keeps.length === 1)
      val keeper = keeps.head.getAs[String]("rkey")
      rows.filterNot(_.getAs[String]("action") == "keep").foreach { r =>
        assert(r.getAs[String]("action") === "symlink")
        assert(r.getAs[String]("symlink_source") === keeper)
      }
    }

    // multi-member groups match the batch snapshot row-for-row (same group
    // ids, same min-rkey keeper election, same sizes)
    val batch = ExactDedup.snapshot(ExactDedup.withHashes(corpus))
      .select("group_id", "rkey", "action", "symlink_source")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), Option(r.getString(3))))
      .toSet
    val multiGroups = byGroup.filter(_._2.length >= 2).keySet
    val gotMulti = s1.filter(r => multiGroups.contains(r.getAs[String]("group_id")))
      .map(r => (r.getAs[String]("group_id"), r.getAs[String]("rkey"),
        r.getAs[String]("action"), Option(r.getAs[String]("symlink_source"))))
      .toSet
    assert(gotMulti === batch)

    // ---- micro-batch 2: late copies of known content, new paths ----------
    val keeperOf = s1.filter(_.getAs[String]("action") == "keep")
      .map(r => r.getAs[String]("group_id") -> r.getAs[String]("rkey")).toMap
    val late = corpus.limit(40)
      .withColumn("repo", concat(lit("zlate/"), col("repo")))
    late.coalesce(1).write.mode("append").parquet(s"$tmp/in")

    DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val s2 = spark.read.parquet(s"$tmp/out").collect()
      .filter(_.getAs[String]("rkey").startsWith("zlate/"))
    // only the 40 new rows are processed (checkpointed file-source progress)
    assert(s2.length === 40)
    s2.foreach { r =>
      assert(r.getAs[String]("rkey").startsWith("zlate/"))
      // every late row duplicates existing content → symlink to the batch-1
      // keeper retained in state ("zlate/" sorts after real keys, so the old
      // keeper must stay sticky)
      assert(r.getAs[String]("action") === "symlink")
      assert(r.getAs[String]("symlink_source") === keeperOf(r.getAs[String]("group_id")))
    }
  }

  test("10⁵-member mega-group in ONE batch: bounded buffer path completes, election exact") {
    import spark.implicits._
    val n = 100000
    // one content shared by 100k paths + a couple of singletons
    val rows = (0 until n).map(i => (f"repo$i%06d", "dup.txt", "c1", "scala", "MEGA-CONTENT")) ++
      Seq(("zz1", "a.txt", "c1", "scala", "unique-1"), ("zz2", "b.txt", "c1", "scala", "unique-2"))
    val df = rows.toDF("repo", "path", "commit", "lang", "content")
    val acts = DedupStream.dedupActions(df).collect()
    assert(acts.length === n + 2)
    val mega = acts.filter(_.size == "MEGA-CONTENT".length)
    assert(mega.count(_.action == "keep") === 1)
    val keeper = mega.find(_.action == "keep").get.rkey
    assert(keeper === "repo000000/dup.txt", "keeper must be the min rkey of the batch")
    assert(mega.filter(_.action == "symlink").forall(_.symlink_source.contains(keeper)))
  }

  test("keeper re-arrival in a later batch emits a no-op keep, never a self-symlink") {
    val corpus = Corpus.synthetic(spark, 120, seed = 29L).toDF()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dstream2").toString
    corpus.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")
    val s1 = spark.read.parquet(s"$tmp/out").collect()
    val keepers = s1.filter(_.getAs[String]("action") == "keep")
    assert(keepers.nonEmpty)

    // re-ingest the exact keeper rows (same repo/path/content → same rkey)
    val keeperKeys = keepers.map(_.getAs[String]("rkey")).toSet
    val again = corpus.where(
      concat(col("repo"), lit("/"), col("path")).isin(keeperKeys.toSeq: _*))
    assert(again.count() > 0)
    again.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt")

    val all = spark.read.parquet(s"$tmp/out").collect()
    // batch 2 re-emitted each re-arrived keeper as a second identical keep row
    val reArrived = all.filter(r => keeperKeys.contains(r.getAs[String]("rkey")))
    assert(reArrived.forall(_.getAs[String]("action") == "keep"))
    // and NO self-referential symlink exists anywhere
    assert(all.forall(r => r.getAs[String]("symlink_source") != r.getAs[String]("rkey")))
  }
}
