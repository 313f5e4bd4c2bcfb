package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.corpus.Corpus
import graft.model.DedupConfig
import graft.operators.{Clustering, ExactDedup, Multimodal, NearDup, Similarity, Snapshots, Substring, TextAnalysis}

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

  /** Memoized per-(session, dir) inputs: the 13 queries of one Verify/Bench
   *  run share the derived corpus and its hash projection instead of
   *  re-deriving them 13×. Tiny tables — MEMORY_AND_DISK persist. */
  private val memo = scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]
  private def memoized(spark: SparkSession, dir: String, tag: String)(mk: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, dir, tag),
      mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def hashed(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "hashed") {
      ExactDedup.withHashes(Corpus.fromDocuments(spark, dir))
    }

  private def corpusWithKey(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "corpus") {
      ExactDedup.validRows(Corpus.fromDocuments(spark, dir))
        .withColumn("rkey", ExactDedup.rkey)
    }

  /** Distinct-content representatives — the similarity stages' input (the
   *  structural skew fix; see [[NearDup.dedupedByContent]]). */
  private def uniqCorpus(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "uniq") {
      NearDup.dedupedByContent(corpusWithKey(spark, dir))
    }

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
      NearDup.verifiedPairs(uniqCorpus(s, dir), cfg)),

    // North-star cluster table: CC over exact-chain + verified-near edges,
    // canonical representative per cluster (singletons represent themselves).
    "q07_clusters_all" -> ((s, dir) => {
      val h = hashed(s, dir)
      val near = NearDup.verifiedPairs(uniqCorpus(s, dir), cfg)
        .select("a_key", "b_key")
      val members = h.select("rkey", "repo", "path", "commit")
      Clustering.clusterTable(members, exactChainEdges(h).union(near))
        .select("rkey", "rep_key")
    }),

    // SimHash sketch + Hamming-≤3 block-join pairs (no SQL oracle — verified
    // against a brute-force Hamming oracle in SimHashSpec; rows-only check).
    "q08_simhash_pairs" -> ((s, dir) =>
      NearDup.simhashPairs(NearDup.simhashes(uniqCorpus(s, dir)))),

    // Stage 4 — long-substring pairs via shift-invariant sampled md5 grams
    // (oracle-parity sampler; cap disabled to mirror the uncapped oracle).
    "q09_substring_pairs" -> ((s, dir) =>
      Substring.gramPairs(
        Substring.sampledGramTable(uniqCorpus(s, dir), 48),
        minShared = 2, cap = Int.MaxValue)),

    // Text analysis: token counts + quality scoring (codegen'd built-ins only).
    "q10_text_stats" -> ((s, dir) => TextAnalysis.textStats(corpusWithKey(s, dir))),

    // Language-ID heuristic (charset rule + stopword voting).
    "q11_lang_id" -> ((s, dir) => TextAnalysis.langId(corpusWithKey(s, dir))),

    // Document fingerprinting (min-gram winnowing degenerate case).
    "q12_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(corpusWithKey(s, dir), 48)),

    // Scale-path rolling-hash substring pairs (no SQL oracle — the sampler is
    // a one-pass Rabin-Karp; verified vs planted blocks in SubstringSpec).
    "q13_rolling_pairs" -> ((s, dir) =>
      Substring.substringPairs(uniqCorpus(s, dir), cfg)),

    // J1 — snapshot validation truth table against current corpus state
    // (validation.rs:305-335) over an edited snapshot with planted violations.
    "q14_validate" -> ((s, dir) => {
      val h = hashed(s, dir)
      Snapshots.validate(Snapshots.editedSnapshot(h), h)
    }),

    // Apply — transactional canonical-table rewrite (executor.rs:96-137 as a
    // MERGE: deletes dropped, symlinks become representative pointers).
    "q15_apply" -> ((s, dir) => {
      val h = hashed(s, dir)
      Snapshots.applyActions(Snapshots.validate(Snapshots.editedSnapshot(h), h), h)
    }),

    // A8/A9 — pending actions + freeable bytes (executor.rs:140-162).
    "q16_pending" -> ((s, dir) => {
      val h = hashed(s, dir)
      Snapshots.pendingStats(Snapshots.validate(Snapshots.editedSnapshot(h), h))
    }),

    // Similarity baseline — brute-force cosine top-5 on the quantized metric
    // (exact integer dot/norms; deterministic ranking).
    "q17_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(s.read.parquet(s"$dir/embeddings.parquet"), 5)),

    // ANN scale path — hyperplane-LSH bucketed top-5 (no SQL oracle;
    // recall vs brute force measured in SimilaritySpec).
    "q18_ann_topk" -> ((s, dir) =>
      Similarity.annTopK(s.read.parquet(s"$dir/embeddings.parquet"), 5)),

    // Multimodal metadata projection over binary media columns.
    "q19_media_meta" -> ((s, dir) => Multimodal.mediaMeta(s, dir)),

    // Tumbling-window aggregation over the events table (batch equivalent of
    // the streaming ingestion path; exact integer value quantization).
    "q20_events_window" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 1000).cast("long")).as("sum_value_q")))
  )

  /** Shared DuckDB CTEs rebuilding the shingle/Jaccard brute-force oracle:
   *  the same tokenization contract as [[graft.functions.Shingles]]. */
  private def duckShingleCtes: String = s""",
uniq AS (
  SELECT min(rkey) AS rkey, min(content) AS content FROM hashed GROUP BY group_id
),
tokl AS (
  SELECT rkey,
         list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM uniq
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
LEFT JOIN (SELECT node, min(reach) AS mn FROM cc GROUP BY node) m ON h.rkey = m.node""",

      "q09_substring_pairs" ->
        s"""$H,
uniq AS (
  SELECT min(rkey) AS rkey, min(content) AS content FROM hashed GROUP BY group_id
),
offs AS (
  SELECT rkey, content, unnest(generate_series(1, length(content) - 47)) AS i
  FROM uniq WHERE length(content) >= 48
),
grams AS (
  SELECT DISTINCT rkey, md5(substr(content, i, 48)) AS g FROM offs
  WHERE substr(md5(substr(content, i, 48)), 32, 1) = '0'
)
SELECT a.rkey AS a_key, b.rkey AS b_key, CAST(count(*) AS BIGINT) AS n_shared
FROM grams a JOIN grams b ON a.g = b.g AND a.rkey < b.rkey
GROUP BY 1, 2 HAVING count(*) >= 2""",

      "q10_text_stats" ->
        s"""$H,
t AS (
  SELECT rkey,
    CAST(length(content) AS BIGINT) AS n_chars,
    CAST(len(list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(lower(content), '[^a-z0-9]', '', 'g')) AS BIGINT) AS n_alnum,
    CAST(len(list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS BIGINT) AS n_stop
  FROM hashed
)
SELECT rkey, n_chars, n_tokens, n_alnum,
  CASE WHEN n_chars > 0 THEN CAST(n_alnum AS DOUBLE)/n_chars ELSE 0.0 END AS alnum_ratio,
  CASE WHEN n_tokens > 0 THEN CAST(n_alnum AS DOUBLE)/n_tokens ELSE 0.0 END AS avg_token_len,
  CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END AS stopword_ratio,
  0.4 * (CASE WHEN n_chars > 0 THEN CAST(n_alnum AS DOUBLE)/n_chars ELSE 0.0 END)
  + 0.3 * (CASE WHEN n_tokens >= 50 THEN 1.0 ELSE CAST(n_tokens AS DOUBLE)/50.0 END)
  + 0.3 * (1.0 - CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/n_tokens ELSE 0.0 END) AS quality_score
FROM t""",

      "q11_lang_id" ->
        s"""$H,
t AS (
  SELECT rkey,
    list_filter(regexp_split_to_array(lower(content), '[^a-z0-9]+'), x -> x <> '') AS toks,
    CAST(len(regexp_extract_all(content, '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS s_zh
  FROM hashed
), s AS (
  SELECT rkey, s_zh,
    CAST(len(list_filter(toks, t -> t IN ('der','die','und','das','ist'))) AS BIGINT) AS s_de,
    CAST(len(list_filter(toks, t -> t IN ('the','is','and','of','to'))) AS BIGINT) AS s_en,
    CAST(len(list_filter(toks, t -> t IN ('el','la','de','que','los'))) AS BIGINT) AS s_es,
    CAST(len(list_filter(toks, t -> t IN ('le','la','les','et','des'))) AS BIGINT) AS s_fr
  FROM t
)
SELECT rkey, s_zh, s_de, s_en, s_es, s_fr,
  CASE WHEN s_zh > 0 THEN 'zh'
       WHEN s_de + s_en + s_es + s_fr = 0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS predicted_lang
FROM s""",

      "q12_fingerprint" ->
        s"""$H,
offs AS (
  SELECT rkey, content, unnest(generate_series(1, length(content) - 47)) AS i
  FROM hashed WHERE length(content) >= 48
)
SELECT rkey, min(md5(substr(content, i, 48))) AS fingerprint FROM offs GROUP BY rkey""",

      "q14_validate" -> s"$H,$duckValidatedCtes\nSELECT * FROM validated",

      "q15_apply" ->
        s"""$H,$duckValidatedCtes,
bad AS (SELECT DISTINCT group_id FROM validated WHERE NOT valid),
v AS (
  SELECT v0.rkey, v0.action, v0.symlink_source, (b.group_id IS NOT NULL) AS bad
  FROM validated v0 LEFT JOIN bad b ON v0.group_id = b.group_id
)
SELECT rkey, status, points_to FROM (
  SELECT h.rkey,
    CASE WHEN v.action IS NULL OR v.action = 'keep' OR v.bad THEN 'kept'
         WHEN v.action = 'symlink' THEN 'redirected'
         ELSE 'deleted' END AS status,
    CASE WHEN NOT (v.action IS NULL OR v.action = 'keep' OR v.bad)
              AND v.action = 'symlink' THEN v.symlink_source END AS points_to
  FROM hashed h LEFT JOIN v ON h.rkey = v.rkey
) t WHERE status <> 'deleted'""",

      "q16_pending" ->
        s"""$H,$duckValidatedCtes,
bad AS (SELECT DISTINCT group_id FROM validated WHERE NOT valid)
SELECT CAST(count(*) AS BIGINT) AS n_pending,
       CAST(coalesce(sum(size), 0) AS BIGINT) AS freeable_bytes
FROM validated v LEFT JOIN bad b ON v.group_id = b.group_id
WHERE v.valid AND NOT v.is_no_op AND v.action <> 'keep' AND b.group_id IS NULL""",

      "q17_cosine_topk" ->
        """WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
  FROM embeddings
),
u AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS i FROM emb),
n AS (SELECT vec_id, CAST(sum(v*v) AS BIGINT) AS ss FROM u GROUP BY 1),
p AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, CAST(sum(a.v*b.v) AS BIGINT) AS dot
  FROM u a JOIN u b ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2
)
SELECT vec_id, neighbor_id, rank, cosq FROM (
  SELECT p.vec_id, p.neighbor_id,
    CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cosq,
    row_number() OVER (
      PARTITION BY p.vec_id
      ORDER BY CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) DESC,
               p.neighbor_id) AS rank
  FROM p JOIN n na ON p.vec_id = na.vec_id JOIN n nb ON p.neighbor_id = nb.vec_id
) t WHERE rank <= 5""",

      "q19_media_meta" ->
        """SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS width,
  CAST(ascii(substr(text, 2, 1)) AS BIGINT) AS height
FROM documents""",

      "q20_events_window" ->
        """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_q
FROM events GROUP BY 1, 2"""
    )
  }

  /** Oracle CTEs for the edited-snapshot validation pipeline — mirrors
   *  [[graft.operators.Snapshots]] check order exactly. */
  private def duckValidatedCtes: String = """
snapk AS (
  SELECT group_id, rkey, size, keeper,
         CASE WHEN rkey = keeper THEN 'keep' ELSE 'symlink' END AS action
  FROM (
    SELECT *, min(rkey) OVER (PARTITION BY group_id) AS keeper,
           count(*) OVER (PARTITION BY group_id) AS nm
    FROM hashed
  ) t WHERE nm > 1
),
ed0 AS (
  SELECT group_id AS gid0, substr(group_id, 1, 1) AS c, rkey, keeper,
    CASE WHEN substr(group_id, 1, 1) = 'f' THEN 'delete'
         WHEN rkey = keeper THEN 'keep'
         WHEN substr(group_id, 1, 1) BETWEEN '0' AND '7' THEN 'delete'
         ELSE 'symlink' END AS action
  FROM snapk
),
edited AS (
  SELECT CASE WHEN c = 'd' THEN upper(gid0) ELSE gid0 END AS group_id, rkey, action,
         CASE WHEN action = 'symlink' THEN keeper END AS symlink_source
  FROM ed0
  UNION ALL
  SELECT gid0, keeper || '.ghost', 'delete', NULL FROM ed0 WHERE c = 'e' AND rkey = keeper
),
v0 AS (
  SELECT e.group_id, e.rkey, e.action, e.symlink_source, h.group_id AS true_sha, h.size
  FROM edited e LEFT JOIN hashed h ON e.rkey = h.rkey
),
gk AS (
  SELECT group_id, max(CASE WHEN action = 'keep' THEN 1 ELSE 0 END) AS has_keep
  FROM edited GROUP BY group_id
),
validated AS (
  SELECT v0.group_id, v0.rkey, v0.action, v0.symlink_source, v0.size,
    CASE WHEN v0.true_sha IS NULL AND v0.action = 'delete' THEN TRUE
         WHEN v0.true_sha IS NULL THEN FALSE
         WHEN v0.true_sha <> v0.group_id THEN FALSE
         WHEN gk.has_keep = 0 THEN FALSE
         ELSE TRUE END AS valid,
    CASE WHEN v0.true_sha IS NULL AND v0.action = 'delete' THEN NULL
         WHEN v0.true_sha IS NULL THEN 'missing_path'
         WHEN v0.true_sha <> v0.group_id THEN 'checksum_mismatch'
         WHEN gk.has_keep = 0 THEN 'no_keep_in_group'
         ELSE NULL END AS error,
    (v0.true_sha IS NULL AND v0.action = 'delete') AS is_no_op
  FROM v0 JOIN gk ON v0.group_id = gk.group_id
)"""
}
