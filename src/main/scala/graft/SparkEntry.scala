package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.corpus.Corpus
import graft.model.DedupConfig
import graft.operators.{Clustering, ExactDedup, NearDup}

/**
 * Driver contract (see SURVEY.md §2 / §7). Every `queries` entry is one
 * implemented operator of the inventory; `oracleSql` holds the DuckDB-runnable
 * equivalent over the same parquet tables. The corpus all dedup queries run on
 * is derived deterministically from `documents.parquet` (planted duplicates —
 * see [[graft.corpus.Corpus.fromDocuments]]) so both engines rebuild the
 * identical input.
 */
object SparkEntry {

  /** Flagship: the exact-duplicate snapshot (reference `find`, SURVEY §3.1)
   *  on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    ExactDedup.snapshot(ExactDedup.withHashes(Corpus.fromDocuments(spark, "/root/testdata/sf0.001")))

  private def hashed(spark: SparkSession, dir: String): DataFrame =
    ExactDedup.withHashes(Corpus.fromDocuments(spark, dir))

  private def corpusWithKey(spark: SparkSession, dir: String): DataFrame =
    ExactDedup.validRows(Corpus.fromDocuments(spark, dir))
      .withColumn("rkey", ExactDedup.rkey)

  /** Default near-dup config used by the oracle-checked queries. */
  val cfg: DedupConfig = DedupConfig()

  /** Exact-dup chain edges (consecutive members by rkey within each sha256
   *  group) — path graphs, the CC worst case. */
  private def exactChainEdges(h: DataFrame): DataFrame = {
    val w = Window.partitionBy("group_id").orderBy("rkey")
    h.withColumn("prev", lag(col("rkey"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("a_key"), col("rkey").as("b_key"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/A4 — sha256 duplicate groups (scanner.rs:108-138 analog).
    "q01_exact_groups" -> ((s, dir) => ExactDedup.duplicateGroups(hashed(s, dir))),

    // A1/A2 — size prefilter survivors (scanner.rs:80-106).
    "q02_size_prefilter" -> ((s, dir) =>
      ExactDedup.sizePrefilter(hashed(s, dir)).select("rkey", "size")),

    // A5/P6 — snapshot with keeper election + default actions
    // (snapshot/mod.rs:56-67, 84-91).
    "q03_snapshot" -> ((s, dir) => ExactDedup.snapshot(hashed(s, dir))),

    // A7 — freeable space metric (snapshot/mod.rs:153-162).
    "q04_freeable_space" -> ((s, dir) => ExactDedup.freeableSpace(hashed(s, dir))),

    // J4 — connected components over intra-group chain edges; must rediscover
    // exactly the sha256 groups (worst-case path graphs for large/small-star).
    "q05_cluster_exact" -> ((s, dir) => {
      val h = hashed(s, dir)
      val members = h.select("rkey", "repo", "path", "commit")
      Clustering.clusterTable(members, exactChainEdges(h)).select("rkey", "rep_key")
    }),

    // J3 + §2.8 — MinHash/LSH candidates verified by exact Jaccard; matches
    // the brute-force O(n²) Jaccard oracle (recall 1 − 4e-13 at threshold).
    "q06_near_pairs" -> ((s, dir) =>
      NearDup.verifiedPairs(corpusWithKey(s, dir), cfg)),

    // North-star cluster table: CC over exact-chain + verified-near edges,
    // canonical representative per cluster (singletons represent themselves).
    "q07_clusters_all" -> ((s, dir) => {
      val h = hashed(s, dir)
      val near = NearDup.verifiedPairs(corpusWithKey(s, dir), cfg)
        .select("a_key", "b_key")
      val members = h.select("rkey", "repo", "path", "commit")
      Clustering.clusterTable(members, exactChainEdges(h).union(near))
        .select("rkey", "rep_key")
    }),

    // SimHash sketch + Hamming-≤3 block-join pairs (no SQL oracle — verified
    // against a brute-force Hamming oracle in SimHashSpec; rows-only check).
    "q08_simhash_pairs" -> ((s, dir) =>
      NearDup.simhashPairs(NearDup.simhashes(corpusWithKey(s, dir))))
  )

  /** Shared DuckDB CTEs rebuilding the shingle/Jaccard brute-force oracle:
   *  the same tokenization contract as [[graft.functions.Shingles]]. */
  private def duckShingleCtes: String = s""",
tokl AS (
  SELECT repo || '/' || path AS rkey,
         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM corpus
),
tok AS (
  SELECT rkey, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i FROM tokl
),
sh AS (
  SELECT DISTINCT rkey, sh FROM (
    SELECT rkey, tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w || ' ' || lead(tok,3) OVER w || ' ' || lead(tok,4) OVER w AS sh
    FROM tok WINDOW w AS (PARTITION BY rkey ORDER BY i)
  ) t WHERE sh IS NOT NULL
),
card AS (SELECT rkey, count(*) AS n FROM sh GROUP BY rkey),
inter AS (
  SELECT a.rkey AS a_key, b.rkey AS b_key, count(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.rkey < b.rkey
  GROUP BY 1, 2
),
nearpairs AS (
  SELECT a_key, b_key, CAST(c AS BIGINT) AS n_intersect,
         CAST(ca.n + cb.n - c AS BIGINT) AS n_union,
         CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
  FROM inter JOIN card ca ON a_key = ca.rkey JOIN card cb ON b_key = cb.rkey
  WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= ${cfg.jaccardThreshold}
)"""

  def oracleSql: Map[String, String] = {
    val H = "WITH " + Corpus.duckHashedCte
    val HR = "WITH RECURSIVE " + Corpus.duckHashedCte
    Map(
      "q01_exact_groups" ->
        s"""$H
SELECT group_id, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(size) AS BIGINT) AS total_bytes,
       CAST(min(size) AS BIGINT) AS member_size,
       CAST(count(DISTINCT repo) AS BIGINT) AS n_repos
FROM hashed GROUP BY group_id HAVING count(*) > 1""",

      "q02_size_prefilter" ->
        s"""$H
SELECT rkey, size FROM (
  SELECT rkey, size, count(*) OVER (PARTITION BY size) AS c FROM hashed
) t WHERE c > 1""",

      "q03_snapshot" ->
        s"""$H
SELECT group_id, repo, path, commit_id AS "commit", rkey, size,
       CASE WHEN rkey = keeper THEN 'keep' ELSE 'symlink' END AS action,
       CASE WHEN rkey = keeper THEN NULL ELSE keeper END AS symlink_source,
       n_members
FROM (
  SELECT *, min(rkey) OVER (PARTITION BY group_id) AS keeper,
         CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS n_members
  FROM hashed
) t WHERE n_members > 1""",

      "q04_freeable_space" ->
        s"""$H
SELECT CAST(coalesce(sum(member_size * (n_members - 1)), 0) AS BIGINT) AS freeable_bytes
FROM (
  SELECT min(size) AS member_size, count(*) AS n_members
  FROM hashed GROUP BY group_id HAVING count(*) > 1
) g""",

      "q05_cluster_exact" ->
        s"""$H
SELECT rkey, min(rkey) OVER (PARTITION BY group_id) AS rep_key FROM hashed""",

      "q06_near_pairs" ->
        s"""$H$duckShingleCtes
SELECT a_key, b_key, n_intersect, n_union, jaccard FROM nearpairs""",

      "q07_clusters_all" ->
        s"""$HR$duckShingleCtes,
edges0 AS (
  SELECT a_key AS a, b_key AS b FROM nearpairs
  UNION
  SELECT a, b FROM (
    SELECT lag(rkey) OVER (PARTITION BY group_id ORDER BY rkey) AS a, rkey AS b FROM hashed
  ) t WHERE a IS NOT NULL
),
edges AS (SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0),
cc AS (
  SELECT a AS node, b AS reach FROM edges
  UNION
  SELECT cc.node, e.b FROM cc JOIN edges e ON cc.reach = e.a
)
SELECT h.rkey, least(h.rkey, coalesce(m.mn, h.rkey)) AS rep_key
FROM hashed h
LEFT JOIN (SELECT node, min(reach) AS mn FROM cc GROUP BY node) m ON h.rkey = m.node"""
    )
  }
}
