package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.corpus.Corpus
import graft.model.DedupConfig
import graft.operators.{ExactDedup, NearDup, Substring}

/**
 * Physical-plan shape regressions — the scale rules the operators document
 * must stay visible in `explain`:
 *
 *  1. no Exchange ever carries the `content` column (content stays in the
 *     scan stage; hashes/projections travel instead) — the 100 TB design
 *     rule of ExactDedup/NearDup, and the round-1→2 scaling fix;
 *  2. the similarity interior exchanges narrow key/id columns, not strings
 *     where an id form exists.
 *
 * Checked against `explain("formatted")` operator blocks: every block
 * belonging to an Exchange is scanned for the forbidden column name, so the
 * assertion survives plan-id churn and AQE wrapping.
 */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private lazy val corpus = Corpus.synthetic(spark, 300, seed = 11L).toDF()
  private lazy val corpusK =
    ExactDedup.validRows(corpus).withColumn("rkey", ExactDedup.rkey)
  private val cfg = DedupConfig()

  /** Operator blocks of the formatted explain that are Exchanges. */
  private def exchangeBlocks(df: DataFrame): Seq[String] = {
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    txt.split("\n\n").toSeq.filter(b =>
      b.linesIterator.exists(l => l.matches("^\\(\\d+\\) Exchange.*")))
  }

  private def assertNoContentInExchanges(df: DataFrame, what: String): Unit = {
    val bad = exchangeBlocks(df).filter(_.contains("content#"))
    assert(bad.isEmpty,
      s"$what: Exchange carries the content column:\n${bad.mkString("\n---\n")}")
  }

  test("exact-dup grouping never shuffles content") {
    assertNoContentInExchanges(
      ExactDedup.duplicateGroups(ExactDedup.withHashes(corpus)), "duplicateGroups")
    assertNoContentInExchanges(
      ExactDedup.snapshot(ExactDedup.withHashes(corpus)), "snapshot")
  }

  test("near-dup pipeline (project-then-dedup form) never shuffles content") {
    // register variant: keeps the returned plan LAZY (inspectable) and hands
    // us the persists to release — the default path is eager + self-cleaning
    // (PersistHygieneSpec).
    val persists = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try assertNoContentInExchanges(
      NearDup.verifiedPairs(corpusK, cfg, register = Some(persists += _)), "verifiedPairs")
    finally persists.foreach(_.unpersist(false))
  }

  test("broadcast content-dedup keeps the corpus side out of exchanges entirely") {
    val uniq = NearDup.dedupedByContentBroadcast(corpusK).select(
      xxhash64(col("rkey")).as("id"),
      NearDup.shingleCol(col("content"), cfg.shingleN).as("shingles"),
      Substring.rollingCol(col("content"), cfg.gramWidth, cfg.sampleMask).as("grams"))
    assertNoContentInExchanges(uniq, "dedupedByContentBroadcast+projections")
    // and the only shuffle in the subtree is the narrow (cid, rkey) aggregate
    val ex = exchangeBlocks(uniq)
    assert(ex.nonEmpty, "expected the narrow representative-key aggregate exchange")
    assert(ex.forall(b => b.contains("cid#") || b.contains("rkey#")),
      s"unexpected exchange shape:\n${ex.mkString("\n---\n")}")
  }

  test("substring pair generation shuffles only (gram, id) — no strings in the long-keyed form") {
    val uniqGrams = NearDup.dedupedByContentBroadcast(corpusK).select(
      xxhash64(col("rkey")).as("id"),
      explode(Substring.rollingCol(col("content"), cfg.gramWidth, cfg.sampleMask)).as("gram"))
    val pairs = Substring.gramPairs(uniqGrams, cfg.minSharedGrams, cfg.maxBucketSize)
    assertNoContentInExchanges(pairs, "gramPairs(long-keyed)")
  }
}
