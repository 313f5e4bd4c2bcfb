package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.DedupConfig
import graft.operators.{Clustering, ExactDedup, NearDup, Substring}
import graft.runtime.RunContext

/**
 * The end-to-end dedup job (north_star): corpus → exact snapshot → MinHash/
 * LSH near-dup pairs → substring pairs → connected-components cluster table,
 * every stage checkpointed through [[graft.runtime.RunContext]] (resumable)
 * and instrumented with per-partition lineage metrics.
 *
 * Stage graph (each node a materialized parquet stage):
 *
 *   hashed ─→ snapshot ─────────────────────────┐
 *   shingles ─→ signatures ─→ near_pairs ───────┼─→ clusters
 *   corpus ─→ substring_pairs ──────────────────┘
 *
 * This is also the benchmark workload: files/sec is measured over a full run.
 */
object Pipeline {

  case class Result(snapshot: DataFrame, clusters: DataFrame, metrics: DataFrame)

  def run(ctx: RunContext, corpus: DataFrame, cfg: DedupConfig = DedupConfig()): Result = {
    val corpusK = ExactDedup.validRows(corpus).withColumn("rkey", ExactDedup.rkey)

    val hashed = ctx.stage("hashed") { ExactDedup.withHashes(corpus, cfg.quick) }
    val snapshot = ctx.stage("snapshot") { ExactDedup.snapshot(hashed) }
    // Similarity stages run on distinct content only (structural skew fix —
    // see NearDup.dedupedByContent); exact edges restore full connectivity.
    val uniq = ctx.stage("uniq") { NearDup.dedupedByContent(corpusK) }
    val shingles = ctx.stage("shingles") { NearDup.shingleSets(uniq, cfg) }
    val signatures = ctx.stage("signatures") { NearDup.signatures(shingles, cfg) }
    // candidate state checkpointed separately (north_rule) — and the banded
    // subtree (sig explode + bucket counts + semi-join + self-join) runs once
    // instead of once per downstream consumer.
    val candidates = ctx.stage("candidates") {
      NearDup.candidatePairs(NearDup.banded(signatures, cfg), signatures, cfg)
    }
    val nearPairs = ctx.stage("near_pairs") {
      NearDup.verifyCandidates(candidates, shingles, cfg)
    }
    val subPairs = ctx.stage("substring_pairs") { Substring.substringPairs(uniq, cfg) }
    val clusters = ctx.stage("clusters") {
      // exact-dup edges as keeper-centered STARS (symlink_source = keeper):
      // star spanning trees converge in O(1) large/small-star rounds, unlike
      // chains (O(log n) rounds on a 10⁶-member boilerplate group).
      val exactEdges = snapshot
        .where(col("action") === "symlink")
        .select(col("symlink_source").as("a_key"), col("rkey").as("b_key"))
      val edges = exactEdges
        .union(nearPairs.select("a_key", "b_key"))
        .union(subPairs.select("a_key", "b_key"))
      val members = hashed.select("rkey", "repo", "path", "commit")
      Clustering.clusterTable(members, edges)
    }
    Result(snapshot, clusters, ctx.metrics.toDF())
  }
}
