package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.FileRow

/**
 * Input providers for the engine's `(repo, path, commit, lang, content)` corpus
 * (BASELINE.json input_hint shape).
 *
 * Two providers behind the same schema:
 *
 *  1. [[Corpus.fromDocuments]] — a deterministic derivation from the driver's
 *     `documents.parquet` table with *planted* exact duplicates, near-duplicates,
 *     a skewed hot-content group and empty files (the fixture recipes of
 *     FIXTURES.md, mirroring examples/fixtures/basic.sh of the reference). Every
 *     operation used is reproducible in ANSI SQL, so the driver's DuckDB oracle
 *     can rebuild the identical corpus (see [[Corpus.duckCorpusCte]]).
 *
 *  2. [[Corpus.synthetic]] — a pure seeded generator used by ScalaTest and the
 *     scaling benchmark; scales to millions of rows with no external data.
 */
object Corpus {

  /**
   * S2 exclusion predicate (scanner.rs:21-22, main.rs:88): drop rows whose
   * path lives under an excluded prefix — the `--exclude` CLI flag in table
   * form. Expressed as a conjunction of `NOT startswith` literals: over a
   * STORED corpus table (path a physical column) Catalyst pushes it into the
   * scan (excluded subtrees never leave the source, exactly like the
   * reference's pruned BFS — CorpusSpec asserts the PushedFilters), and with
   * a prefix-aligned partition layout it becomes partition pruning. Over the
   * derived test corpus (path is a computed column) it stays a post-derive
   * filter, which is still before any hash or shuffle.
   */
  def withExcludes(corpus: DataFrame, excludePrefixes: Seq[String]): DataFrame =
    excludePrefixes.foldLeft(corpus) { (df, p) =>
      df.where(!col("path").startsWith(p))
    }

  /** Fixed "vendored license header" content — plants one hot sha256 group
   *  (1 in 25 docs), the skew case called out by north_rule (cf. FIXTURES.md
   *  `hotContent`). Kept free of SQL metacharacters for oracle parity. */
  val LicenseHeader: String =
    "MIT License Copyright (c) 2026 Graft Authors. Permission is hereby granted free of charge to any person obtaining a copy of this software."

  /**
   * Deterministically derive the corpus from `documents.parquet` in `sfDir`.
   *
   * Planted structure (all paths distinct, so rows are unique by (repo,path)):
   *  - every doc        → base row            path `f<id>.txt`
   *  - doc_id % 5 == 0  → exact copy          path `copy/f<id>.txt`
   *  - doc_id % 10 == 0 → second exact copy   path `copy2/f<id>.txt`  (groups of 3)
   *  - doc_id % 7 == 0 && n_chars >= 120
   *                     → near-dup            path `near/f<id>.txt`, content with the
   *                       first 30 chars dropped (Jaccard vs base ≈ 0.9 ≥ threshold)
   *  - doc_id % 25 == 0 → hot license header  path `lic/f<id>.txt`   (skewed group)
   *  - doc_id % 100 == 0→ empty file          path `empty/f<id>.txt` (empty-content group)
   *
   * `commit` is the first 40 hex chars of sha256(content) — a deterministic
   * 40-char "commit hash" derivable in both engines.
   */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def sha40(c: org.apache.spark.sql.Column) =
      substring(sha2(c.cast("binary"), 256), 1, 40)
    def rows(pathPrefix: String, contentCol: org.apache.spark.sql.Column) =
      docs.select(
        col("source").as("repo"),
        concat(lit(pathPrefix + "f"), col("doc_id"), lit(".txt")).as("path"),
        sha40(contentCol).as("commit"),
        col("lang"),
        contentCol.as("content"),
        col("doc_id"),
        col("n_chars"))

    val base   = rows("", col("text"))
    val copy1  = rows("copy/", col("text")).where(col("doc_id") % 5 === 0)
    val copy2  = rows("copy2/", col("text")).where(col("doc_id") % 10 === 0)
    val near   = rows("near/", substring(col("text"), 31, Int.MaxValue))
      .where(col("doc_id") % 7 === 0 && col("n_chars") >= 120)
    val lic    = rows("lic/", lit(LicenseHeader)).where(col("doc_id") % 25 === 0)
    val empty  = rows("empty/", lit("")).where(col("doc_id") % 100 === 0)

    base.unionAll(copy1).unionAll(copy2).unionAll(near).unionAll(lic).unionAll(empty)
      .drop("doc_id", "n_chars")
  }

  /** The DuckDB CTE that rebuilds [[fromDocuments]] byte-for-byte on the same
   *  parquet table — prefix for every oracle SQL. Column `commit` is renamed
   *  `commit_id` (reserved word in some dialects). */
  val duckCorpusCte: String = {
    val lic = LicenseHeader
    s"""corpus AS (
  SELECT source AS repo, 'f' || doc_id || '.txt' AS path, substr(sha256(text),1,40) AS commit_id, lang, text AS content FROM documents
  UNION ALL SELECT source, 'copy/f' || doc_id || '.txt', substr(sha256(text),1,40), lang, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL SELECT source, 'copy2/f' || doc_id || '.txt', substr(sha256(text),1,40), lang, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT source, 'near/f' || doc_id || '.txt', substr(sha256(substr(text,31)),1,40), lang, substr(text,31) FROM documents WHERE doc_id % 7 = 0 AND n_chars >= 120
  UNION ALL SELECT source, 'lic/f' || doc_id || '.txt', substr(sha256('$lic'),1,40), lang, '$lic' FROM documents WHERE doc_id % 25 = 0
  UNION ALL SELECT source, 'empty/f' || doc_id || '.txt', substr(sha256(''),1,40), lang, '' FROM documents WHERE doc_id % 100 = 0
)"""
  }

  /** Hashed-corpus CTE: corpus + size + sha256 group id + the engine's row key
   *  `rkey` (= repo || '/' || path; binary collation in both engines). */
  val duckHashedCte: String =
    duckCorpusCte + """,
hashed AS (
  SELECT repo, path, commit_id, lang, content,
         repo || '/' || path AS rkey,
         CAST(length(content) AS BIGINT) AS size,
         sha256(content) AS group_id
  FROM corpus
)"""

  // -------------------------------------------------------------------------
  // Synthetic generator (tests + scaling bench): FIXTURES.md recipes.
  // -------------------------------------------------------------------------

  /** Deterministic token vocabulary for source-like content. */
  private val Vocab: Array[String] = Array(
    "def", "val", "var", "class", "object", "import", "return", "match", "case",
    "if", "else", "for", "while", "try", "catch", "map", "filter", "reduce",
    "spark", "dataset", "column", "row", "hash", "join", "group", "agg",
    "partition", "shuffle", "broadcast", "cache", "x", "y", "z", "acc", "buf",
    "idx", "key", "value", "result", "tmp", "count", "size", "offset", "window")

  private def contentFor(id: Long, nTokens: Int, seed: Long): String = {
    val rnd = new java.util.SplittableRandom(seed * 1000003L + id)
    val sb = new StringBuilder(nTokens * 6)
    var i = 0
    while (i < nTokens) {
      if (i > 0) sb.append(if (i % 12 == 0) "\n" else " ")
      sb.append(Vocab(rnd.nextInt(Vocab.length)))
      i += 1
    }
    sb.toString
  }

  private val Langs = Array("scala", "java", "py", "rs", "txt")

  /**
   * Seeded synthetic corpus of ~`nDocs` base files plus planted structure
   * (FIXTURES.md recipes: exactDup, nearDup, sharedSubstring, hotContent,
   * uniqueFiller are the base rows themselves). Generated distributed via
   * `spark.range` — no driver-side materialization, scales to bench sizes.
   */
  def synthetic(spark: SparkSession, nDocs: Long, seed: Long = 42L): Dataset[FileRow] = {
    import spark.implicits._
    val lic = LicenseHeader
    spark.range(0, nDocs, 1, spark.sparkContext.defaultParallelism)
      .flatMap { id =>
        val rnd = new java.util.SplittableRandom(seed * 7777779L + id)
        val nTokens = 40 + rnd.nextInt(160)
        val body = contentFor(id, nTokens, seed)
        val repo = s"org${id % 97}/repo${id % 13}"
        val lang = Langs((id % Langs.length).toInt)
        def commitOf(c: String) = {
          val h = XxhHex.sha40(c)
          h
        }
        val out = scala.collection.mutable.ArrayBuffer[FileRow]()
        out += FileRow(repo, s"src/f$id.$lang", commitOf(body), lang, body)
        if (id % 5 == 0)   // exactDup
          out += FileRow(repo, s"copy/f$id.$lang", commitOf(body), lang, body)
        if (id % 7 == 0) { // nearDup: drop first 8 tokens
          val near = body.split("[ \n]+", -1).drop(8).mkString(" ")
          out += FileRow(repo, s"near/f$id.$lang", commitOf(near), lang, near)
        }
        if (id % 11 == 0) { // sharedSubstring: unique prefix + long shared block
          // block pool scales with corpus size so each block is shared by
          // ~15 files regardless of nDocs (pair count stays linear)
          val nBlocks = math.max(8L, nDocs / 150L)
          val shared = contentFor(900 + (id / 11) % nBlocks, 60, seed + 999)
          val mixed = contentFor(id, 30, seed + 5) + " " + shared
          out += FileRow(repo, s"sub/f$id.$lang", commitOf(mixed), lang, mixed)
        }
        if (id % 23 == 0)  // hotContent (skewed group)
          out += FileRow(repo, s"lic/f$id.$lang", commitOf(lic), lang, lic)
        if (id % 101 == 0) // empty files
          out += FileRow(repo, s"empty/f$id.$lang", commitOf(""), lang, "")
        out
      }
  }
}

/** Small helper kept serializable-free of SparkSession capture. */
object XxhHex {
  def sha40(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(40)
    var i = 0
    while (sb.length < 40) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString.substring(0, 40)
  }
}
