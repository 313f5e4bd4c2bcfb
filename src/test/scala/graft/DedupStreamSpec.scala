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

  test("RocksDB state store + retention timeout: idle group evicted, re-arrival re-elects without corruption") {
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val partKey = "spark.sql.shuffle.partitions"
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prior = spark.conf.getOption(provKey)
    val priorParts = spark.conf.get(partKey)
    val priorCk = spark.conf.getOption(ckKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 2 state partitions: each RocksDB instance pays a per-commit zip +
    // rename tax (local-FS renames fork a readlink per file) — 32 instances
    // over 3 micro-batch runs took ~20 min of pure overhead for a 5-row test
    spark.conf.set(partKey, "2")
    // the checksum wrapper's async upload-await deadlocks the RocksDB zip
    // commit on this local FS (observed: one commit parked 25 min in
    // ChecksumCheckpointFileManager.awaitResult); corruption detection is
    // orthogonal to what this case proves (eviction + re-election semantics)
    spark.conf.set(ckKey, "false")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dstream_rocks").toString
      def write(rows: Seq[(String, String, String, String, String)]): Unit =
        rows.toDF("repo", "path", "commit", "lang", "content")
          .coalesce(1).write.mode("append").parquet(s"$tmp/in")

      // batch 1: group X elects keeper b/x (min rkey of the batch)
      write(Seq(("b", "x", "c1", "scala", "EVICT-CONTENT"),
                ("c", "x", "c1", "scala", "EVICT-CONTENT")))
      DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt",
        retentionMs = 500L)
      val b1 = spark.read.parquet(s"$tmp/out").collect()
      assert(b1.count(_.getAs[String]("action") == "keep") === 1)
      assert(b1.find(_.getAs[String]("action") == "keep").get.getAs[String]("rkey") === "b/x")

      // batch 2 (after the retention window): group X has NO data in this
      // trigger and its timeout has expired -> hasTimedOut fires, state evicted
      Thread.sleep(1500L)
      write(Seq(("zz", "other", "c1", "scala", "UNRELATED-1")))
      DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt",
        retentionMs = 500L)

      // batch 3: X re-arrives at a/x (sorts BEFORE the old keeper). With the
      // state evicted this RE-ELECTS a/x as keeper ('keep'); were the state
      // still present, the sticky keeper would force 'symlink -> b/x'.
      write(Seq(("a", "x", "c1", "scala", "EVICT-CONTENT")))
      DedupStream.runAvailableNow(spark, s"$tmp/in", s"$tmp/out", s"$tmp/ckpt",
        retentionMs = 500L)
      val all = spark.read.parquet(s"$tmp/out").collect()
      val ax = all.filter(_.getAs[String]("rkey") == "a/x")
      assert(ax.length === 1)
      assert(ax.head.getAs[String]("action") === "keep",
        "post-eviction re-arrival must re-elect, not symlink to evicted state")
      // weakened, never corrupted: no self-symlink, every symlink names a key
      // that was emitted as a keep at some point
      assert(all.forall(r => r.getAs[String]("symlink_source") != r.getAs[String]("rkey")))
      val keeps = all.filter(_.getAs[String]("action") == "keep").map(_.getAs[String]("rkey")).toSet
      assert(all.filter(_.getAs[String]("action") == "symlink")
        .forall(r => keeps.contains(r.getAs[String]("symlink_source"))))

      // the run really used RocksDB: its state checkpoints are .zip snapshots
      // (+ changelogs), never the HDFS store's .delta files
      val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/ckpt/state"))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var sawZip = false
      var sawDelta = false
      stateFiles.forEachRemaining { p =>
        val s = p.toString
        if (s.endsWith(".zip")) sawZip = true
        if (s.endsWith(".delta")) sawDelta = true
      }
      assert(sawZip && !sawDelta)
    } finally {
      spark.conf.set(partKey, priorParts)
      prior match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      priorCk match {
        case Some(v) => spark.conf.set(ckKey, v)
        case None => spark.conf.unset(ckKey)
      }
    }
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
