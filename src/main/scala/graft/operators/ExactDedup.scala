package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Stage 1 — exact-duplicate detection: the Spark-native analog of the
 * reference's `find` pipeline (scanner.rs:140-157): validity filter →
 * size prefilter → content-hash grouping → sha256 confirm → keeper election →
 * snapshot rows.
 *
 * Scale design (100 TB, 1000 executors). The reference stages
 * size → xxh3 → sha256 because each stage required *re-reading files from
 * disk* (scanner.rs:96-138, rationale README.md:469-485). With content as an
 * in-table column the calculus inverts: every hash is computed in the one
 * columnar scan projection, and the expensive resource is the **shuffle**, not
 * the hash CPU (sha256 of 100 TB across 8000 cores is minutes). So the
 * default pipeline:
 *
 *   1. one narrow projection `(rkey, size, sha256)` — content never leaves the
 *      scan stage; ~120 bytes/row crosses the wire instead of the ~10 KB row;
 *   2. a single hash-shuffle on `group_id = sha256` with map-side partial
 *      aggregation (`HashAggregateExec`);
 *   3. keeper election as a second aggregation over the *duplicate rows only*
 *      (dup groups are a small fraction of the corpus after the HAVING
 *      count>1 filter).
 *
 * The faithful staged operators (A1–A3 of SURVEY.md §2.3) are kept as
 * [[sizePrefilter]] / [[xxhPrefilter]]: they become profitable again when
 * content is *not* stored in-row (e.g. lazily-fetched blobs), because they
 * let sha256 run on survivors only.
 */
object ExactDedup {

  /** Engine row key: `repo || '/' || path`. Binary string collation matches
   *  the DuckDB oracle's. Commit participates in outputs, not in the key,
   *  because the corpus derivation guarantees (repo,path) uniqueness. */
  def rkey: Column = concat(col("repo"), lit("/"), col("path"))

  /** P1-analog validity filter (scanner.rs:43-78): in the corpus model, rows
   *  must have non-null path/content. Pushed to the parquet scan by Catalyst. */
  def validRows(corpus: DataFrame): DataFrame =
    corpus.where(col("content").isNotNull && col("path").isNotNull && length(col("path")) > 0)

  /** Narrow hash projection: `(repo, path, commit, rkey, size, sha/group_id [, xxh])`.
   *  Content is dropped here — nothing downstream shuffles it.
   *
   *  `quick` (main.rs:26-31) skips the crypto confirm; the group id is the
   *  64-bit hash rendered as unsigned decimal (hash.rs:57-61 semantics).
   *  `xxh3 = true` makes that 64-bit hash BIT-IDENTICAL to the reference's
   *  `xxh3::xxh3_64(&data)` (hash.rs:9-13) via the native
   *  [[graft.functions.XXHash3]] codegen expression — quick-mode snapshot
   *  ids then match the reference byte-for-byte (XXH3Spec +
   *  ExactDedupSpec). Default stays XXH64 (verifiable in-suite against
   *  Spark's built-in `xxhash64`; sha256 remains the authoritative id). */
  def withHashes(corpus: DataFrame, quick: Boolean = false,
                 xxh3: Boolean = false): DataFrame = {
    val base = validRows(corpus)
      .withColumn("rkey", rkey)
      .withColumn("size", length(col("content")).cast("long"))
      .withColumn("xxh",
        if (xxh3) graft.functions.NativeExprs.xxh3_64(col("content"))
        else xxhash64(col("content")))
    val hashed =
      if (quick)
        base.withColumn("group_id", conv(hex(col("xxh")), 16, 10))
      else
        base.withColumn("group_id", sha2(col("content").cast("binary"), 256))
    hashed.drop("content")
  }

  /** A1+A2 (scanner.rs:80-106): keep only rows whose size occurs more than
   *  once. Implemented as a self-contained aggregation + semi-join rather than
   *  a window so the hot key (size) gets map-side combine and AQE skew
   *  handling; at 100 TB a window over `size` would hash-shuffle every row
   *  into size-partitions with no partial aggregation. */
  def sizePrefilter(hashed: DataFrame): DataFrame = {
    val dupSizes = hashed.groupBy("size").count().where(col("count") > 1).select("size")
    hashed.join(dupSizes, Seq("size"), "left_semi")
  }

  /** A3 (scanner.rs:108-123): keep only rows whose xxh occurs more than once. */
  def xxhPrefilter(hashed: DataFrame): DataFrame = {
    val dupXxh = hashed.groupBy("xxh").count().where(col("count") > 1).select("xxh")
    hashed.join(dupXxh, Seq("xxh"), "left_semi")
  }

  /** A3/A4: duplicate groups — group id, member count, per-group byte totals.
   *  One shuffle; map-side combine makes the hot license-header group cheap. */
  def duplicateGroups(hashed: DataFrame): DataFrame =
    hashed.groupBy("group_id")
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("size")).as("total_bytes"),
        min(col("size")).as("member_size"),
        countDistinct(col("repo")).as("n_repos"))
      .where(col("n_members") > 1)

  /** Rows belonging to duplicate groups only (the snapshot's member set). */
  def duplicateRows(hashed: DataFrame): DataFrame = {
    // Window count over group_id instead of a join-back: dup-group membership
    // and keeper election share the same partitioning, so Catalyst plans ONE
    // exchange on group_id for both (see SnapshotSpec plan assertions).
    val w = Window.partitionBy("group_id")
    hashed
      .withColumn("n_members", count(lit(1)).over(w))
      .where(col("n_members") > 1)
  }

  /**
   * A5 keeper election + snapshot rows (snapshot/mod.rs:84-91, README.md:395-397):
   * the lexicographically-first member key of each group is the keeper
   * (action `keep`); all other members get action `symlink` with
   * `symlink_source` = keeper key — mirroring the reference's default
   * snapshot where the user then edits actions.
   */
  def snapshot(hashed: DataFrame): DataFrame = {
    val w = Window.partitionBy("group_id")
    duplicateRows(hashed)
      .withColumn("keeper", min(col("rkey")).over(w))
      .withColumn("action", when(col("rkey") === col("keeper"), lit("keep")).otherwise(lit("symlink")))
      .withColumn("symlink_source", when(col("action") === "symlink", col("keeper")))
      .select("group_id", "repo", "path", "commit", "rkey", "size", "action", "symlink_source", "n_members")
  }

  /** A7 freeable space (snapshot/mod.rs:153-162): Σ over groups of
   *  member_size × (members − 1) — bytes reclaimed if every group kept one copy. */
  def freeableSpace(hashed: DataFrame): DataFrame =
    duplicateGroups(hashed)
      .select((col("member_size") * (col("n_members") - 1)).as("freeable"))
      .agg(coalesce(sum(col("freeable")), lit(0L)).as("freeable_bytes"))
}
