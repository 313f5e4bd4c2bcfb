package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}

/**
 * Seen-≥2 bitset sketch — the singleton-bucket pruner for the two hottest
 * exchanges in the pipeline (LSH band buckets, rolling-gram buckets).
 *
 * Both stages share the shape `explode → repartition(bucket) → local sort →
 * run-scan`, and on a mostly-unique corpus the overwhelming majority of
 * bucket values occur exactly ONCE — rows that can never form a pair yet pay
 * full freight through the co-locating exchange, the measured scaling
 * limiter at 16 cores (BENCH/PROFILE_r03.md: `candidates` 190M-row sort,
 * t4/t16 = 1.86, the most bandwidth-bound stage). This sketch removes them
 * BEFORE the exchange with one extra map-side pass:
 *
 *  1. Per partition, build two bitsets over `slot(hash)`: `once` (slot seen)
 *     and `twice` (slot seen again).
 *  2. Merge partials associatively: `twice' = t₁|t₂|(o₁&o₂)`, `once' = o₁|o₂`
 *     (a slot is ≥2 iff some partial saw it twice or two partials saw it).
 *  3. Broadcast `twice`; keep a row iff its slot is marked.
 *
 * EXACT by construction: every bucket with ≥ 2 members marks its slot in
 * every merge order, so no pair-producing row is ever dropped — hash
 * collisions only over-mark (a false positive KEEPS a singleton; the
 * run-scan then emits nothing for it, exactly as before). The sketch trades
 * a perfectly-parallel extra scan (compute, scales ~4× on this VM's probes)
 * for exchange bytes (bandwidth, pinned at ~2× on the same probes) — the
 * direction the 4→16-core profile says to move work.
 *
 * Sizing: `log2m` bits per bitset. At load α = rows/2^log2m the singleton
 * false-positive (kept-anyway) rate is ≈ 1 − e^(−α); [[autoLog2m]] targets
 * α ≈ 0.25 (FP ≈ 22%) capped at 2^29 bits = 64 MB per bitset — the
 * broadcast stays executor-comfortable and partials merge through a
 * bounded-depth treeReduce. At 10⁹ docs × 64 bands the cap yields α ≈ 120:
 * the sketch saturates and prunes nothing, so [[prune]] becomes a no-op
 * pass-through — callers gate it on `rows ≤ pruneMaxRows` instead of
 * shipping a saturated filter (the cap is a small-end optimization with a
 * clean large-end degradation, never a correctness cliff).
 */
object SeenTwice {

  /** Fibonacci-mix the (already hashed) 64-bit value into a slot — band/gram
   *  values are xxhash64/Rabin outputs, but low-bit regularity is free to
   *  guard against. */
  @inline def slot(h: Long, log2m: Int): Int =
    ((h * 0x9E3779B97F4A7C15L) >>> (64 - log2m)).toInt

  /** True iff `h`'s slot is marked in the sketch. */
  def contains(bits: Array[Long], log2m: Int, h: Long): Boolean = {
    val s = slot(h, log2m)
    ((bits(s >>> 6) >>> (s & 63)) & 1L) == 1L
  }

  /** Smallest `log2m` with load ≤ 0.25 at `rows`, clamped to [20, 29]. */
  def autoLog2m(rows: Long): Int = {
    var l = 20
    while (l < 29 && (rows << 2) > (1L << l)) l += 1
    l
  }

  /** Build the seen-≥2 bitset over `df(colName)` (a LONG column). One
   *  map-side pass, no row exchange: partials merge via treeReduce (the only
   *  shuffled bytes are ≤ `mergeWidth` bitset pairs). */
  def sketch(df: DataFrame, colName: String, log2m: Int,
             mergeWidth: Int = 16): Array[Long] = {
    val nWords = 1 << (log2m - 6)
    // internal-row RDD: getLong(0) straight off the UnsafeRow, no Row boxing
    // on what is deliberately a 10⁸-row scan
    val rdd0 = df.select(org.apache.spark.sql.functions.col(colName))
      .queryExecution.toRdd
    val rdd = if (rdd0.getNumPartitions > mergeWidth)
      rdd0.coalesce(mergeWidth, shuffle = false) else rdd0
    val partials = rdd.mapPartitions { it =>
      val once = new Array[Long](nWords)
      val twice = new Array[Long](nWords)
      while (it.hasNext) {
        val s = slot(it.next().getLong(0), log2m)
        val w = s >>> 6
        val b = 1L << (s & 63)
        if ((once(w) & b) != 0L) twice(w) |= b else once(w) |= b
      }
      Iterator.single((once, twice))
    }
    if (partials.getNumPartitions == 0) return new Array[Long](nWords)
    partials.treeReduce({ case ((o1, t1), (o2, t2)) =>
      // partials are task-owned deserialized copies: merge in place
      var i = 0
      while (i < nWords) {
        t1(i) = t1(i) | t2(i) | (o1(i) & o2(i))
        o1(i) = o1(i) | o2(i)
        i += 1
      }
      (o1, t1)
    }, depth = 2)._2
  }

  /** `graft_seen_twice(h)` — codegen'd bitset membership against a broadcast
   *  sketch; the filter stays inside whole-stage codegen (no ScalaUDF boxing
   *  on a 10⁸-row scan). */
  case class BitsetContainsExpr(child: Expression, bits: Broadcast[Array[Long]],
                                log2m: Int) extends UnaryExpression with Predicate {
    override def prettyName: String = "graft_seen_twice"
    override def nullSafeEval(input: Any): Any =
      contains(bits.value, log2m, input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftSeenTwiceBc", bits,
        classOf[Broadcast[Array[Long]]].getName)
      val arr = ctx.addMutableState("long[]", "graftSeenTwiceBits",
        v => s"$v = (long[]) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SeenTwice.contains($arr, $log2m, $c);")
    }
    override protected def withNewChildInternal(newChild: Expression): BitsetContainsExpr =
      copy(child = newChild)
  }

  /** Filter `df` to rows whose `colName` value hashes to a seen-≥2 slot —
   *  i.e. drop rows provably alone in their bucket. Builds the sketch (one
   *  extra scan of `df`), broadcasts it, filters codegen-natively. */
  def prune(df: DataFrame, colName: String, log2m: Int): DataFrame = {
    val spark = df.sparkSession
    val bits = sketch(df, colName, log2m)
    var marked = 0L
    var i = 0
    while (i < bits.length) { marked += java.lang.Long.bitCount(bits(i)); i += 1 }
    System.err.println(f"[graft.prune] $colName: $marked of ${1L << log2m} " +
      f"slots marked >=2 (${100.0 * marked / (1L << log2m)}%.2f%%)")
    val bc = spark.sparkContext.broadcast(bits)
    df.filter(org.apache.spark.sql.GraftColumnBridge.column(
      BitsetContainsExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(df(colName)), bc, log2m)))
  }
}
