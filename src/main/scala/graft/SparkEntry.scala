package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.corpus.Corpus
import graft.operators.{Clustering, ExactDedup}

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
      val w = Window.partitionBy("group_id").orderBy("rkey")
      val chain = h.withColumn("prev", lag(col("rkey"), 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("prev").as("a"), col("rkey").as("b"))
      val members = h.select("rkey", "repo", "path", "commit")
      Clustering.clusterTable(members, chain).select("rkey", "rep_key")
    })
  )

  def oracleSql: Map[String, String] = {
    val H = "WITH " + Corpus.duckHashedCte
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
SELECT rkey, min(rkey) OVER (PARTITION BY group_id) AS rep_key FROM hashed"""
    )
  }
}
