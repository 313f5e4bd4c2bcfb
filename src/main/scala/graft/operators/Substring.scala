package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.XXHash64
import graft.model.DedupConfig

/**
 * Stage 4 — long-exact-substring detection (north_star "distributed
 * suffix-array pass"), realized as a content-defined fingerprint index: a
 * scalable stand-in with the same capability (find pairs of files sharing a
 * long verbatim block) and a narrow interface a true distributed
 * prefix-doubling suffix array could drop behind (SURVEY.md §7.4).
 *
 * Two gram samplers, same downstream pipeline:
 *
 *  - [[md5SampledGrams]]: every w-char window hashed with md5, windows kept
 *    when the hex digest ends in '0' (1/16 sampling). Content-defined, so the
 *    sample is *shift-invariant* — a block shared at different offsets in two
 *    files selects the same grams. Reproducible in ANSI SQL (the DuckDB
 *    oracle replays it literally); used by the oracle-checked query.
 *
 *  - [[rollingFingerprints]]: one-pass Rabin-Karp polynomial rolling hash
 *    (base 257, mod 2⁶⁴ by natural overflow) mixed through XXH64, sampled at
 *    (mixed & sampleMask) == 0. O(n) per document with zero substring
 *    allocation — the 100 TB path (md5-per-offset costs ~50× more CPU).
 *
 * Pair generation mirrors the LSH stage: explode grams → bucket count
 * (map-side combinable) → drop buckets over the cap (hot grams = boilerplate;
 * reported, not silent) → self-join within buckets → count shared grams per
 * pair.
 */
object Substring {

  /** Distinct md5 hexes of all `w`-char windows whose digest ends in '0'. */
  def md5SampledGrams(content: String, w: Int): Array[String] = {
    if (content == null || content.length < w) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.SortedSet[String]()
    var i = 0
    while (i + w <= content.length) {
      val d = md.digest(content.substring(i, i + w).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new java.lang.StringBuilder(32)
      d.foreach(b => hex.append(f"${b & 0xff}%02x"))
      val h = hex.toString
      if (h.charAt(31) == '0') out += h
      i += 1
    }
    out.toArray
  }

  /** One-pass rolling-hash fingerprints: distinct sorted mixed hashes of the
   *  sampled `w`-char windows. */
  def rollingFingerprints(content: String, w: Int, sampleMask: Long): Array[Long] = {
    if (content == null || content.length < w) return Array.empty
    val B = 257L
    var pow = 1L // B^(w-1)
    var k = 1
    while (k < w) { pow *= B; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * B + content.charAt(i); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var pos = 0
    while (true) {
      val mixed = XXHash64.hashLong(h, 7L)
      if ((mixed & sampleMask) == 0L) out += mixed
      if (pos + w >= content.length) {
        return graft.functions.Shingles.distinctSorted(out.toArray)
      }
      h = (h - content.charAt(pos) * pow) * B + content.charAt(pos + w)
      pos += 1
    }
    Array.empty // unreachable
  }

  private val md5GramsUdf = udf((c: String, w: Int) => md5SampledGrams(c, w))
  private val rollingUdf = udf((c: String, w: Int, m: Long) => rollingFingerprints(c, w, m))

  /** `(rkey, gram)` — exploded sampled md5 grams (oracle-parity sampler). */
  def sampledGramTable(corpus: DataFrame, w: Int): DataFrame =
    corpus.select(col("rkey"), explode(md5GramsUdf(col("content"), lit(w))).as("gram"))

  /** `(rkey, gram)` — exploded rolling-hash fingerprints (scale sampler). */
  def rollingGramTable(corpus: DataFrame, cfg: DedupConfig): DataFrame =
    corpus.select(col("rkey"),
      explode(rollingUdf(col("content"), lit(cfg.gramWidth), lit(cfg.sampleMask))).as("gram"))

  /** Grams shared by too many documents (vendored boilerplate) — dropped from
   *  pair generation and surfaced as metrics. */
  def hotGrams(grams: DataFrame, cap: Int): DataFrame =
    grams.groupBy("gram").count().where(col("count") > cap)

  /**
   * Pairs of documents sharing ≥ `minShared` sampled grams:
   * `(a_key, b_key, n_shared)`. `cap` bounds the per-gram bucket size
   * (quadratic pair blowup guard); `Int.MaxValue` disables it for
   * oracle-parity runs.
   */
  def gramPairs(grams: DataFrame, minShared: Int, cap: Int): DataFrame = {
    val spark = grams.sparkSession
    import spark.implicits._
    // same shape as the LSH candidate stage: 16-byte (bucket, id) rows, ONE
    // co-locating exchange, local sorted run-scan with in-stream cap (see
    // NearDup.candidatePairs), then count shared grams per id-pair
    val g = grams.select(xxhash64(col("gram")).as("bucket"), xxhash64(col("rkey")).as("id"))
    val idPairs = g
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .as[(Long, Long)]
      .mapPartitions(it => graft.functions.BucketScan.pairs(it, cap))
      .toDF("a_id", "b_id")
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    val keys = grams.select("rkey").distinct()
    val ka = keys.select(xxhash64(col("rkey")).as("a_id"), col("rkey").as("ka"))
    val kb = keys.select(xxhash64(col("rkey")).as("b_id"), col("rkey").as("kb"))
    idPairs.join(ka, "a_id").join(kb, "b_id")
      .select(least(col("ka"), col("kb")).as("a_key"),
        greatest(col("ka"), col("kb")).as("b_key"),
        col("n_shared"))
  }

  /** Substring-pair edges with the scale sampler — feeds Stage 3 clustering. */
  def substringPairs(corpus: DataFrame, cfg: DedupConfig): DataFrame =
    gramPairs(rollingGramTable(corpus, cfg), cfg.minSharedGrams, cfg.maxBucketSize)
}
