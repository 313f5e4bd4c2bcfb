package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.XXHash64

/**
 * Embedding similarity search: brute-force cosine top-k as the correctness
 * baseline and a random-hyperplane LSH-bucketed ANN as the scale path.
 *
 * Determinism note: the oracle-checked top-k works on embeddings *quantized*
 * to integers (`floor(x·1000)`), so dot products and norms are exact 64-bit
 * integer aggregations — order-independent and bit-identical across engines;
 * the one floating-point step (`dot / (√ssa·√ssb)`) is a fixed scalar
 * expression over those exact ints. The float-path `cosine` column function
 * is the production variant (deterministic left-fold, no quantization).
 *
 * Scale design: brute force is O(n²·d) — fine for a broadcast-side probe set,
 * wrong for all-pairs at 10⁹ vectors. The ANN path buckets each vector into
 * `tables` independent sign-bit sketches; candidate generation is an
 * equi-join on `(table, bucket)` (same shuffle shape as the MinHash LSH
 * stage, same skew guard applies), verification is exact cosine within
 * buckets, and top-k is a per-key window over candidates only.
 */
object Similarity {

  /** Quantized vector + exact integer norm: `(…, q: array<long>, ss: long)`. */
  def quantized(embeddings: DataFrame, scale: Int = 1000): DataFrame =
    embeddings
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * scale).cast("long")))
      .withColumn("ss", aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))

  /** Exact integer dot product of two quantized vectors (left fold — ANSI-safe
   *  at |x|·scale ≤ ~3e4 per component). */
  private def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Float cosine of two `array<float>` columns (production path): a single
   *  deterministic left-to-right fold per component. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  /**
   * Brute-force cosine top-k over the quantized metric:
   * `(vec_id, neighbor_id, rank, cosq)`. The self-join is a cartesian
   * product — the *baseline*; use [[annTopK]] beyond probe-set scale.
   */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val q = quantized(embeddings).select("vec_id", "q", "ss")
    val a = q.select(col("vec_id"), col("q").as("qa"), col("ss").as("ssa"))
    val b = q.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("ss").as("ssb"))
    val cosq = dotQ(col("qa"), col("qb")).cast("double") /
      (sqrt(col("ssa").cast("double")) * sqrt(col("ssb").cast("double")))
    val w = Window.partitionBy("vec_id").orderBy(col("cosq").desc, col("neighbor_id"))
    a.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosq", cosq)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "rank", "cosq")
  }

  /**
   * Embedding-cosine near-duplicate pairs: all pairs at/above `minCos` on
   * the quantized metric — the exact baseline for embedding-based dedup
   * (`(a_id, b_id, cosq)`; `a_id < b_id`). O(n²·d): correct at probe-set /
   * verification scale; the 10⁹-vector path generates candidates with the
   * [[annTopK]] bucket index and verifies them with this same exact cosine.
   */
  def cosinePairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    val q = quantized(embeddings).select("vec_id", "q", "ss")
    val a = q.select(col("vec_id").as("a_id"), col("q").as("qa"), col("ss").as("ssa"))
    val b = q.select(col("vec_id").as("b_id"), col("q").as("qb"), col("ss").as("ssb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosq", dotQ(col("qa"), col("qb")).cast("double") /
        (sqrt(col("ssa").cast("double")) * sqrt(col("ssb").cast("double"))))
      .where(col("cosq") >= minCos)
      .select("a_id", "b_id", "cosq")
  }

  /** Deterministic pseudo-random hyperplane component for (table, bit, dim):
   *  a signed 64-bit hash scaled to [-1, 1] — no RNG state to ship. */
  private def plane(table: Int, bit: Int, dim: Int): Double =
    XXHash64.hashLong((table.toLong << 32) | (bit.toLong << 16) | dim.toLong, 4242L).toDouble / Long.MaxValue.toDouble

  /** Sign-bit sketch UDF: for each of `tables`, a `bits`-bit bucket id. */
  private def bucketsUdf(tables: Int, bits: Int) =
    udf((v: Seq[Float]) => {
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += v(i) * plane(t, b, i); i += 1 }
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
      out
    })

  /** `(vec_id, table, bucket)` — the LSH index table. */
  def annIndex(embeddings: DataFrame, tables: Int = 16, bits: Int = 8): DataFrame =
    embeddings.select(col("vec_id"),
      posexplode(bucketsUdf(tables, bits)(col("embedding"))).as(Seq("table", "bucket")))

  /** Multi-probe query buckets: the exact bucket plus every 1-bit flip
   *  (Lv et al., VLDB'07 multi-probe LSH) — `(bits + 1) · tables` probe rows
   *  per vector, recovering the recall that higher `bits` (smaller buckets)
   *  would otherwise cost. */
  def annProbes(embeddings: DataFrame, tables: Int = 16, bits: Int = 8): DataFrame = {
    val probesUdf = udf((v: Seq[Float]) => {
      val base = new Array[Long](tables)
      // same sketch as bucketsUdf
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += v(i) * plane(t, b, i); i += 1 }
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        base(t) = bucket
        t += 1
      }
      val out = new Array[Long](tables * (bits + 1))
      t = 0
      while (t < tables) {
        val o = t * (bits + 1)
        out(o) = base(t)
        var j = 0
        while (j < bits) { out(o + 1 + j) = base(t) ^ (1L << j); j += 1 }
        t += 1
      }
      out
    })
    embeddings.select(col("vec_id"),
        posexplode(probesUdf(col("embedding"))).as(Seq("pos", "bucket")))
      .select(col("vec_id"), (col("pos") / (bits + 1)).cast("int").as("table"), col("bucket"))
  }

  /** Buckets over the skew cap — dropped from candidate generation and
   *  reported (same stop-bucket rule as the MinHash LSH stage). */
  def annHotBuckets(idx: DataFrame, maxBucketSize: Int): DataFrame =
    idx.groupBy("table", "bucket").count().where(col("count") > maxBucketSize)

  /**
   * ANN top-k: candidates from capped bucket collisions across tables
   * (multi-probe on the query side), verified with exact quantized cosine,
   * ranked per vector. Candidates per query are bounded by
   * `tables · (bits+1) · maxBucketSize` — a hot bucket (duplicate or
   * degenerate embeddings) cannot explode the join; its members still rank
   * via the remaining tables or, at worst, are reported via
   * [[annHotBuckets]]. Recall is measured in SimilaritySpec against
   * [[bruteForceTopK]] (near-uniform random vectors — hyperplane LSH's worst
   * case; structured/clustered embeddings only do better).
   */
  def annTopK(embeddings: DataFrame, k: Int = 5, tables: Int = 16, bits: Int = 8,
              maxBucketSize: Int = 4096): DataFrame = {
    val idx = annIndex(embeddings, tables, bits)
    val hot = broadcast(annHotBuckets(idx, maxBucketSize).select("table", "bucket"))
    val idxOk = idx.join(hot, Seq("table", "bucket"), "left_anti")
      .repartition(col("table"), col("bucket"))
    val probes = annProbes(embeddings, tables, bits)
      .join(hot, Seq("table", "bucket"), "left_anti")
    val cand = probes.as("a").join(idxOk.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"))
      .distinct()
    val q = quantized(embeddings).select("vec_id", "q", "ss")
    val a = q.select(col("vec_id"), col("q").as("qa"), col("ss").as("ssa"))
    val b = q.select(col("vec_id").as("neighbor_id"), col("q").as("qb"), col("ss").as("ssb"))
    val cosq = dotQ(col("qa"), col("qb")).cast("double") /
      (sqrt(col("ssa").cast("double")) * sqrt(col("ssb").cast("double")))
    val w = Window.partitionBy("vec_id").orderBy(col("cosq").desc, col("neighbor_id"))
    cand.join(a, "vec_id").join(b, "neighbor_id")
      .withColumn("cosq", cosq)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "rank", "cosq")
  }
}
