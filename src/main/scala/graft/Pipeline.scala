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
 *   corpus ─→ snapshot ─────────────────────────┐
 *   corpus ─→ signatures ─→ candidates ─→ near_pairs ─┼─→ clusters
 *   corpus ─→ substring_pairs ──────────────────┘
 *
 * This is also the benchmark workload: files/sec is measured over a full run.
 */
object Pipeline {

  case class Result(snapshot: DataFrame, clusters: DataFrame, metrics: DataFrame)

  def run(ctx: RunContext, corpus: DataFrame, cfg: DedupConfig = DedupConfig()): Result = {
    val corpusK = ExactDedup.validRows(corpus).withColumn("rkey", ExactDedup.rkey)

    // The three edge-producing branches are independent given the scan:
    // submit them CONCURRENTLY (Spark schedules independent jobs onto idle
    // cores). This overlaps each branch's serial segments — driver planning,
    // commit protocol, small-shuffle rounds — with another branch's parallel
    // compute; on a wide cluster (or the local[4N] arm) those serial
    // segments are the Amdahl tax that a higher core count cannot shrink.
    // On the saturated low-parallelism arm the overlap changes little, which
    // is exactly the point: it converts idle-core time into work.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // SPARK_GRAFT_SEQUENTIAL=1 serializes the branches (diagnostic: branch
    // concurrency trades scheduler-gap fill against shared-cache pressure).
    val sequential = sys.env.get("SPARK_GRAFT_SEQUENTIAL").contains("1")
    def branch(body: => DataFrame): Future[DataFrame] =
      if (sequential) Future.successful(body) else Future(body)

    // Stage 1 — the exact snapshot. The hash projection is inlined (content
    // is dropped inside the scan stage; nothing here is reused elsewhere, so
    // persisting it would only burn cache-fill bandwidth).
    val fSnapshot = branch {
      ctx.stage("snapshot") { ExactDedup.snapshot(ExactDedup.withHashes(corpus, cfg.quick)) }
    }

    // Similarity runs on distinct content only (structural skew fix). The
    // dedup itself is the NARROW codegen'd shape — `(cid → min rkey)` hash
    // aggregate + semi-join back (NearDup.dedupedByContent) — and EVERY
    // similarity projection (shingle hashes AND rolling-gram fingerprints)
    // is then computed ONCE, on representatives only, straight into the
    // shared cache. Two measured dead ends recorded here: (a) per-branch
    // dedup aggs contend for execution memory at high thread counts (16
    // threads ran *slower* than 4); (b) fusing the projections into the
    // dedup via `first(struct(arrays))` forces ObjectHashAggregate's
    // sort-based fallback over wide array rows — same inversion. Exact-group
    // edges restore full-cluster connectivity in stage 3.
    val uniq = ctx.stage("uniq", materialize = false) {
      NearDup.dedupedByContent(corpusK).select(col("rkey"),
        NearDup.shingleCol(col("content"), cfg.shingleN).as("shingles"),
        Substring.rollingCol(col("content"), cfg.gramWidth, cfg.sampleMask).as("grams"))
    }
    // Materialize the shared cache BEFORE forking: two branches racing on a
    // cold cached plan would each compute the full subtree (cache fills are
    // not coordinated across concurrent jobs).
    val tUniq = System.nanoTime()
    uniq.count()
    System.err.println(f"[graft.stage] uniq ${(System.nanoTime() - tUniq) / 1e9}%.1f s")

    val fNearPairs = branch {
      val shingles = ctx.stage("shingles", materialize = false, persist = false) {
        uniq.select(col("rkey"), col("shingles"), size(col("shingles")).as("n_shingles"))
          .where(col("n_shingles") > 0)
      }
      val signatures = ctx.stage("signatures") { NearDup.signatures(shingles, cfg) }
      // candidate state checkpointed separately (north_rule) — and the banded
      // subtree (sig explode + bucket counts + semi-join + self-join) runs once
      // instead of once per downstream consumer.
      val candidates = ctx.stage("candidates") {
        NearDup.candidatePairs(NearDup.banded(signatures, cfg), signatures, cfg)
      }
      ctx.stage("near_pairs") { NearDup.verifyCandidates(candidates, shingles, cfg) }
    }

    val fSubPairs = branch {
      // Substring edges feed clustering only after byte-exact verification —
      // a gram coincidence or hash collision must not merge clusters. The
      // verify pass fetches content for candidate members straight from the
      // scan (semi-join on the bounded pair-key set).
      ctx.stage("substring_pairs") {
        Substring.verifiedSubstringPairs(
          Substring.gramPairs(uniq.select(col("rkey"), explode(col("grams")).as("gram")),
            cfg.minSharedGrams, cfg.maxBucketSize),
          corpusK, cfg.gramWidth)
      }
    }

    val snapshot = Await.result(fSnapshot, Duration.Inf)
    val nearPairs = Await.result(fNearPairs, Duration.Inf)
    val subPairs = Await.result(fSubPairs, Duration.Inf)
    val clusters = ctx.stage("clusters") {
      // Exact-dup groups enter as a MAPPING (member → keeper), not as edges:
      // CC iterates over the representative-level similarity graph only —
      // orders of magnitude fewer edges on a duplicate-heavy corpus, and a
      // 10⁶-member boilerplate group costs one join row per member instead
      // of 10⁶ star edges in every CC round.
      val baseRep = snapshot.select(col("rkey"),
        coalesce(col("symlink_source"), col("rkey")).as("rep0"))
      val repPairs = nearPairs.select("a_key", "b_key")
        .union(subPairs.select("a_key", "b_key"))
      // Narrow key columns straight from the scan (column pruning — no hash
      // recompute, no cache): membership needs no content or hashes.
      val members = corpusK.select("rkey", "repo", "path", "commit")
      Clustering.clusterTableCollapsed(members, baseRep, repPairs)
    }
    Result(snapshot, clusters, ctx.metrics.toDF())
  }
}
