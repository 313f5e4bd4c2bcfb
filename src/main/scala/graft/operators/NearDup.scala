package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Shingles
import graft.model.DedupConfig

/**
 * Stage 2 — near-duplicate candidate generation + verification (north_star):
 * 5-gram shingles → MinHash signatures → LSH band buckets → salted,
 * repartitioned candidate self-join → exact-Jaccard verify.
 *
 * Scale design (10⁹ rows):
 *  - shingle strings are hashed to 64-bit inside the scan projection — no
 *    string ever shuffles; a document's wire footprint is
 *    `k·8 (signature) + |shingles|·8` bytes;
 *  - the candidate join is an equi-join on `(band, band_hash)` after an
 *    explicit `repartition` on those keys (north_rule requirement);
 *  - hot buckets (empty files, license headers, boilerplate) are the skew
 *    killer: any bucket with more than `cfg.maxBucketSize` members would
 *    contribute O(m²) pairs, so they are counted first (map-side combinable
 *    aggregation — skew-immune) and dropped as "stop buckets", the standard
 *    stop-shingle practice. Dropped buckets are reported via
 *    [[droppedBuckets]], never silently. Identical-content members of such
 *    buckets are still clustered by the exact stage, which is why dropping is
 *    safe for recall at the configured threshold;
 *  - per-pair verification re-checks exact Jaccard on the shingle sets, so
 *    LSH false positives never reach the cluster stage (precision 1.0; recall
 *    is controlled by (bands, rowsPerBand) — (64,2) puts the miss probability
 *    at threshold 0.6 below 1e-12).
 *
 * Expected input: a corpus DataFrame with `rkey` and `content` columns.
 */
object NearDup {

  /**
   * Content dedup in front of the similarity stages: one representative row
   * (minimum `rkey`) per distinct content. This is the structural skew fix —
   * a group of m identical files (license headers, empty files, vendored
   * code) would otherwise put m copies of the *same* signature into every
   * LSH band bucket, turning the bucket self-join into an O(m²) single-task
   * hotspot. After dedup the group is ONE row; exact-dup edges (stage 1)
   * restore full-cluster connectivity in stage 3. Pair outputs of the
   * similarity stages are therefore *content-representative* pairs.
   *
   * Scale note: the representative-key aggregation is **narrow** —
   * `(cid, rkey)` only, ~100 bytes/row with map-side combine — so the hot
   * groups collapse before the exchange. Content itself crosses at most one
   * exchange (the probe side of the semi-join; never aggregated, never
   * sorted — SHUFFLE_HASH build side is the narrow key set). Where the
   * similarity stage only needs a *projection* of content (shingles, grams,
   * sketches), prefer [[uniqShingleSets]]-style project-then-dedup, which
   * never moves content at all.
   */
  def dedupedByContent(corpusK: DataFrame): DataFrame =
    corpusK.join(representativeKeys(corpusK).hint("SHUFFLE_HASH"), Seq("rkey"), "left_semi")

  /** [[dedupedByContent]] with the representative key set BROADCAST: the
   *  corpus side then never enters an exchange at all — the semi-filter and
   *  any downstream per-row projection stay in the scan stage, which is the
   *  shape that scales with cores (a shuffled semi-join moves the full
   *  content through the memory system once, and that bandwidth is shared
   *  across all cores of a local/executor host). Only valid while the key
   *  set fits the broadcast budget (`cfg.repBroadcastMaxRows` gates this in
   *  the pipeline); the aggregation producing the key set is narrow
   *  `(cid, min rkey)` with map-side combine either way. */
  def dedupedByContentBroadcast(corpusK: DataFrame): DataFrame =
    corpusK.join(broadcast(representativeKeys(corpusK)), Seq("rkey"), "left_semi")

  /** Minimum `rkey` per distinct content — narrow columns only. */
  def representativeKeys(corpusK: DataFrame): DataFrame =
    corpusK
      .select(sha2(col("content").cast("binary"), 256).as("cid"), col("rkey"))
      .groupBy("cid").agg(min(col("rkey")).as("rkey"))
      .select("rkey")

  /**
   * Content-dedup *after* a per-row projection: `payload` is computed in the
   * scan stage for every row, then one row per distinct content survives
   * (representative = min rkey, payload taken from any member — they are
   * identical by construction). The shuffle carries `(cid, rkey, payload)`
   * with map-side partial aggregation, so a hot group (m identical license
   * headers) contributes ONE payload per map partition to the exchange and
   * raw content never leaves the scan — the 100 TB-safe shape of
   * "dedup then project".
   */
  def uniqProjected(corpusK: DataFrame, payload: Column): DataFrame =
    corpusK
      .select(sha2(col("content").cast("binary"), 256).as("cid"), col("rkey"),
        payload.as("payload"))
      .groupBy("cid")
      .agg(min(col("rkey")).as("rkey"), first(col("payload")).as("payload"))
      .select("rkey", "payload")

  /** Shingle-hash projection as a column (public so the pipeline can fuse it
   *  with other per-row projections into ONE dedup pass). Backed by the
   *  native codegen expression — same static function as [[shingleUdf]]
   *  (bit-identical), but it stays inside whole-stage codegen with no UDF
   *  encoder boundary. */
  def shingleCol(content: Column, n: Int): Column =
    graft.functions.NativeExprs.shingleHashes(content, n)

  private val shingleUdf =
    udf((content: String, n: Int) => Shingles.shingleHashes(content, n))

  /** Per-document shingle sets: `(rkey, shingles: array<long>, n_shingles)`.
   *  Documents with no shingles (< n tokens) are dropped here — they cannot
   *  participate in Jaccard similarity. */
  def shingleSets(corpus: DataFrame, cfg: DedupConfig): DataFrame =
    corpus
      .withColumn("shingles", shingleUdf(col("content"), lit(cfg.shingleN)))
      .withColumn("n_shingles", size(col("shingles")))
      .where(col("n_shingles") > 0)
      .select("rkey", "shingles", "n_shingles")

  /** [[shingleSets]] over the content-distinct representatives, computed as
   *  project-then-dedup (see [[uniqProjected]]): identical result to
   *  `shingleSets(dedupedByContent(corpusK))` with no content exchange.
   *  The shingle projection is the NATIVE codegen expression (bit-identical
   *  to the UDF — NativeExprSpec), so the hot per-row hash work stays inside
   *  whole-stage codegen with no encoder boundary (guide §1.2 step 2). */
  def uniqShingleSets(corpusK: DataFrame, cfg: DedupConfig): DataFrame =
    uniqProjected(corpusK, shingleCol(col("content"), cfg.shingleN))
      .select(col("rkey"), col("payload").as("shingles"))
      .withColumn("n_shingles", size(col("shingles")))
      .where(col("n_shingles") > 0)

  /** MinHash signatures `(rkey, sig: array<long>[k])` — native codegen
   *  expression (bit-identical to the retained UDF; NativeExprSpec). */
  def signatures(shingles: DataFrame, cfg: DedupConfig): DataFrame =
    shingles.select(
      col("rkey"),
      graft.functions.NativeExprs.minhash(col("shingles"), cfg.minhashK).as("sig"))

  /** [[signatures]] keyed by the 64-bit node id (`id` column) instead of the
   *  row-key string — the pipeline-internal form (see [[candidateIdPairs]]). */
  def signaturesById(shingles: DataFrame, cfg: DedupConfig): DataFrame =
    shingles.select(
      col("id"),
      graft.functions.NativeExprs.minhash(col("shingles"), cfg.minhashK).as("sig"))

  /**
   * Exploded LSH buckets `(band_hash, id, rkey)` — one row per (doc, band).
   * The band index is folded INTO the bucket hash (bandHashes seeds each
   * band's chain with its index), and the doc is carried as a 64-bit
   * `xxhash64(rkey)` id: a bucket row is 16 bytes on the wire instead of a
   * 50+-byte (band, hash, key-string) triple — at 10⁹ docs × 64 bands that
   * is the difference between a 1 TB and a 4 TB shuffle. Keys are joined
   * back once, after pair dedup (an id collision can only *add* a candidate
   * pair, which the exact-Jaccard verify then discards).
   */
  def banded(signatures: DataFrame, cfg: DedupConfig): DataFrame =
    signatures.select(
      xxhash64(col("rkey")).as("id"),
      explode(graft.functions.NativeExprs.bandHashes(
        col("sig"), cfg.bands, cfg.rowsPerBand)).as("band_hash"))

  /** [[banded]] over [[signaturesById]] output — the id column passes through
   *  instead of being derived from the key string. */
  def bandedById(signatures: DataFrame, cfg: DedupConfig): DataFrame =
    signatures.select(
      col("id"),
      explode(graft.functions.NativeExprs.bandHashes(
        col("sig"), cfg.bands, cfg.rowsPerBand)).as("band_hash"))

  /** [[bandedById]] restricted to the contiguous band range `[bandLo, bandHi)`
   *  — a `slice` of the per-band hash array before the explode. Each band's
   *  index is folded into its hash (`Shingles.bandHashes` seeds every band's
   *  chain with its index), so slicing by position preserves the hashes:
   *  ranges PARTITION the exploded rows exactly, and no pair can span two
   *  ranges (a pair needs two rows in the SAME bucket, hence the same band). */
  def bandedByIdRange(signatures: DataFrame, cfg: DedupConfig,
                      bandLo: Int, bandHi: Int): DataFrame =
    signatures.select(
      col("id"),
      explode(slice(graft.functions.NativeExprs.bandHashes(
          col("sig"), cfg.bands, cfg.rowsPerBand),
        bandLo + 1, bandHi - bandLo)).as("band_hash"))

  /** Buckets dropped by the skew guard, with sizes — the lineage/metrics view
   *  required by north_rule ("cap skewed buckets, report them"). */
  def droppedBuckets(banded: DataFrame, cfg: DedupConfig): DataFrame =
    banded.groupBy("band_hash").count()
      .where(col("count") > cfg.maxBucketSize)

  /**
   * Candidate pairs `(a_key, b_key)` — distinct over all bands. Buckets of
   * size 1 carry no pairs; buckets over the cap are dropped (see class doc).
   * `keys` maps ids back to row keys (from the same signatures table).
   */
  /**
   * Distinct candidate id pairs `(a_id, b_id)` — the pipeline-internal form.
   * ONE exchange: co-locate each bucket (north_rule repartition), sort
   * locally, scan runs of equal bucket hash. A groupBy-count prepass would
   * hash-aggregate ~docs×bands nearly-all-distinct keys — no map-side
   * combine benefit, giant spilling hash maps; the sorted run-scan replaces
   * three full-width exchanges with this single one. The cap is enforced
   * in-stream with bounded buffering (a mega-bucket buffers cap+1 ids,
   * then drains without emitting).
   *
   * The ids are `xxhash64(rkey)` — the SAME 64-bit node ids the cluster
   * stage keys its component graph by — so downstream verification and CC
   * consume these pairs with **no key join-back and no string shuffles**
   * (at 16 parallel cores the shuffle-write path is the measured scaling
   * limiter; every byte through it is shared-memory-system traffic). An id
   * collision can only *add* a candidate pair, which verification then
   * discards or, at worst, merges exactly as the hash-node cluster graph
   * would — the documented trade of the 64-bit node id space.
   */
  def candidateIdPairs(banded: DataFrame, cfg: DedupConfig,
                       onDrop: Long => Unit = _ => ()): DataFrame =
    candidateIdPairsRaw(banded, cfg, onDrop).distinct()

  /** [[candidateIdPairs]] WITHOUT the final distinct — the band-range driver
   *  unions its ranges' raw pair streams first and dedups ONCE (a pair found
   *  by bands in two different ranges would otherwise survive per-range
   *  distincts and double up in the union). */
  def candidateIdPairsRaw(banded: DataFrame, cfg: DedupConfig,
                          onDrop: Long => Unit = _ => ()): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val cap = cfg.maxBucketSize
    banded
      .repartition(col("band_hash"))
      .sortWithinPartitions("band_hash", "id")
      .select(col("band_hash"), col("id")).as[(Long, Long)]
      .mapPartitions(it => graft.functions.BucketScan.pairs(it, cap, onDrop))
      .toDF("a_id", "b_id")
  }

  /**
   * [[candidateIdPairs]] at the 10⁹-doc shape: bands processed in contiguous
   * RANGES so the singleton prune re-enters its effective-load window per
   * range (BENCH/PROFILE_r05.md §3). One pass over 10⁹ docs × 64 bands =
   * 6.4×10¹⁰ exploded rows runs even the 4 GB sharded sketch at load α ≈ 1.9
   * — cutting ~9% and rightly skipping itself as saturated; 8 ranges of 8
   * bands run α ≈ 0.23 per range and cut ~47% of EVERY range's rows before
   * its exchange. Because ranges partition the exploded rows (see
   * [[bandedByIdRange]]):
   *  - the total sketch-build scan stays ONE pass over the exploded rows
   *    (each range explodes only its slice; the signatures table is re-read
   *    per range — a narrow columnar scan, the decisive trade in PROFILE §3),
   *  - no candidate pair can span two ranges, so the per-range raw pair
   *    streams union losslessly and dedup ONCE.
   *
   * Each range's pairs MATERIALIZE to `<rangeDir>/range_<i>of<n>_b<bands>`
   * before the next range's sketch is built: exactly one sketch broadcast is
   * live at a time (released as soon as its range lands), and a killed run
   * resumes from completed ranges — the parquet `_SUCCESS` marker is the
   * done-flag, the same contract as stage checkpoints (north_rule: resumable
   * from checkpoint). The path encodes the range GEOMETRY (`nRanges` and
   * `cfg.bands`, which together determine every `lo..hi` slice), so a runDir
   * reused after a corpus-size or band-count change can never silently
   * restore a stale range covering different bands — geometry-mismatched
   * files are simply not found and the range recomputes. Note the resume
   * caveat that remains by design: `onDrop` accounting is skipped for
   * restored ranges, so dropped-bucket metrics undercount on a resumed run
   * (the pairs themselves are exact). The ranges are internal state of the
   * candidates stage; the caller still owns the stage-level checkpoint of
   * the deduped union.
   */
  def candidateIdPairsBandRanged(signatures: DataFrame, cfg: DedupConfig,
                                 rangeDir: String,
                                 onDrop: Long => Unit = _ => ()): DataFrame = {
    val spark = signatures.sparkSession
    val sigRows = signatures.count()
    val bandRows = sigRows * cfg.bands
    val nRanges = math.min(cfg.bands.toLong,
      math.max(1L, (bandRows + cfg.pruneShardedMaxRows - 1) / cfg.pruneShardedMaxRows)).toInt
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(rangeDir), spark.sparkContext.hadoopConfiguration)
    def rangePath(r: Int) = s"$rangeDir/range_${r}of${nRanges}_b${cfg.bands}"
    (0 until nRanges).foreach { r =>
      val lo = r * cfg.bands / nRanges
      val hi = (r + 1) * cfg.bands / nRanges
      val path = rangePath(r)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"))) {
        val t0 = System.nanoTime()
        val (pruned, release) = graft.functions.SeenTwice.pruneAuto(
          bandedByIdRange(signatures, cfg, lo, hi), "band_hash",
          sigRows * (hi - lo), cfg.pruneMinRows, cfg.pruneMaxRows,
          cfg.pruneShardedMaxRows)
        try candidateIdPairsRaw(pruned, cfg, onDrop)
          .write.mode("overwrite").parquet(path)
        finally release()
        System.err.println(f"[graft.stage] candidates range $r/$nRanges " +
          f"(bands $lo..${hi - 1}) ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } else System.err.println(
        s"[graft.stage] candidates range $r/$nRanges restored from checkpoint")
    }
    spark.read.parquet((0 until nRanges).map(rangePath): _*)
      .distinct()
  }

  def candidatePairs(banded: DataFrame, keys: DataFrame, cfg: DedupConfig): DataFrame = {
    val idPairs = candidateIdPairs(banded, cfg)
    val ka = keys.select(xxhash64(col("rkey")).as("a_id"), col("rkey").as("ka"))
    val kb = keys.select(xxhash64(col("rkey")).as("b_id"), col("rkey").as("kb"))
    // id order ≠ key order: normalize the pair to key order after mapping
    idPairs.join(ka, "a_id").join(kb, "b_id")
      .select(least(col("ka"), col("kb")).as("a_key"),
        greatest(col("ka"), col("kb")).as("b_key"))
  }

  /**
   * Verified near-dup pairs: exact Jaccard over the shingle sets, keeping
   * pairs at or above `cfg.jaccardThreshold`. Output:
   * `(a_key, b_key, n_intersect, n_union, jaccard)`.
   *
   * Persist scoping (round-2 leak fix): with `register = None` (the default,
   * ad-hoc/oracle use) the internal persists are SCOPED — the result is
   * materialized eagerly (localCheckpoint) and every cache entry released
   * before returning, so repeated invocations in a long session leave
   * nothing behind (PersistHygieneSpec). A caller managing its own stage
   * lifecycle (the checkpointed pipeline, plan-inspection specs) passes
   * `register = Some(f)`: persists are handed to `f` and the returned plan
   * stays lazy; the caller unpersists (RunContext.cleanup()).
   */
  def verifiedPairs(corpusK: DataFrame, cfg: DedupConfig,
                    register: Option[DataFrame => Unit] = None): DataFrame = {
    val sh = uniqShingleSets(corpusK, cfg)
      // Reused on three sides (signature build + two verify joins): cache at
      // test scale; at cluster scale this is the checkpointed shingles stage
      // (see graft.Pipeline, which passes materialized stages instead).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register match {
      case Some(reg) =>
        reg(sh)
        verifiedPairsFrom(sh, signatures(sh, cfg), cfg, register)
      case None =>
        try verifiedPairsFrom(sh, signatures(sh, cfg), cfg, register)
        finally sh.unpersist(false) // result already eager (scoped verify)
    }
  }

  /** [[verifiedPairs]] over pre-materialized shingle/signature stages
   *  (the checkpointed-pipeline entry point). */
  def verifiedPairsFrom(sh: DataFrame, sigs: DataFrame, cfg: DedupConfig,
                        register: Option[DataFrame => Unit] = None): DataFrame =
    verifyCandidates(candidatePairs(banded(sigs, cfg), sigs, cfg), sh, cfg, register)

  /** Exact-Jaccard verification of a (possibly checkpointed) candidate-pair
   *  table against the shingle sets. Persist scoping per [[verifiedPairs]]. */
  def verifyCandidates(cand0: DataFrame, sh0: DataFrame, cfg: DedupConfig,
                       register: Option[DataFrame => Unit] = None): DataFrame = {
    // Consumed three times (key set + two join sides): persist so the
    // candidate subtree executes once.
    val cand = cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register.foreach(_(cand))
    def body: DataFrame = verifyBody(cand, sh0, cfg)
    if (register.isDefined) body
    else try body.localCheckpoint() finally cand.unpersist(false)
  }

  private def verifyBody(cand: DataFrame, sh0: DataFrame, cfg: DedupConfig): DataFrame = {
    // Only candidate MEMBERS' shingle sets are needed — semi-filter the
    // (wide, array-carrying) shingle table down to the candidate key set
    // before any join, so the verify exchanges carry |members| rows, not the
    // whole corpus' shingles. The key set is bounded by 2·|candidates|
    // (bucket-capped upstream) and broadcasts.
    val keys = cand.select(col("a_key").as("rkey"))
      .union(cand.select(col("b_key").as("rkey"))).distinct()
    // Same broadcast-vs-shuffle gate as verifyCandidatesById.
    val keysH = if (cand.count() <= cfg.verifyKeyBroadcastMaxPairs) broadcast(keys)
    else keys.hint("SHUFFLE_HASH")
    val sh = sh0.join(keysH, Seq("rkey"), "left_semi")
    // SHUFFLE_HASH: sort-merge would SORT the wide shingle-array rows on a
    // string key twice; hashing the (bounded, per-partition) build side is
    // strictly cheaper here and stays skew-safe under AQE.
    val shA = sh.hint("SHUFFLE_HASH")
      .select(col("rkey").as("a_key"), col("shingles").as("sh_a"), col("n_shingles").as("n_a"))
    val shB = sh.hint("SHUFFLE_HASH")
      .select(col("rkey").as("b_key"), col("shingles").as("sh_b"), col("n_shingles").as("n_b"))
    cand.join(shA, "a_key").join(shB, "b_key")
      .withColumn("n_intersect", graft.functions.NativeExprs.longIntersect(col("sh_a"), col("sh_b")))
      .withColumn("n_union", (col("n_a") + col("n_b") - col("n_intersect")).cast("long"))
      .withColumn("jaccard", col("n_intersect").cast("double") / col("n_union"))
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select("a_key", "b_key", "n_intersect", "n_union", "jaccard")
  }

  /** [[verifyCandidates]] in id space: candidates are `(a_id, b_id)` from
   *  [[candidateIdPairs]], shingle sets are keyed by `id` — same exact-Jaccard
   *  math, no string key ever enters an exchange. Output
   *  `(a_id, b_id, n_intersect, n_union, jaccard)`. Persist scoping per
   *  [[verifiedPairs]]. */
  def verifyCandidatesById(cand0: DataFrame, sh0: DataFrame, cfg: DedupConfig,
                           register: Option[DataFrame => Unit] = None): DataFrame = {
    val cand = cand0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register.foreach(_(cand))
    def body: DataFrame = verifyByIdBody(cand, sh0, cfg)
    if (register.isDefined) body
    else try body.localCheckpoint() finally cand.unpersist(false)
  }

  private def verifyByIdBody(cand: DataFrame, sh0: DataFrame, cfg: DedupConfig): DataFrame = {
    val keys = cand.select(col("a_id").as("id"))
      .union(cand.select(col("b_id").as("id"))).distinct()
    // Member-key semi-filter: broadcast while the candidate volume fits the
    // budget (the count is cheap — cand is persisted / a materialized stage);
    // past it the key set is itself shuffle-sized and a shuffle-hash semi is
    // the scale path.
    val keysH = if (cand.count() <= cfg.verifyKeyBroadcastMaxPairs) broadcast(keys)
    else keys.hint("SHUFFLE_HASH")
    val sh = sh0.join(keysH, Seq("id"), "left_semi")
    val shA = sh.hint("SHUFFLE_HASH")
      .select(col("id").as("a_id"), col("shingles").as("sh_a"), col("n_shingles").as("n_a"))
    val shB = sh.hint("SHUFFLE_HASH")
      .select(col("id").as("b_id"), col("shingles").as("sh_b"), col("n_shingles").as("n_b"))
    cand.join(shA, "a_id").join(shB, "b_id")
      .withColumn("n_intersect", graft.functions.NativeExprs.longIntersect(col("sh_a"), col("sh_b")))
      .withColumn("n_union", (col("n_a") + col("n_b") - col("n_intersect")).cast("long"))
      .withColumn("jaccard", col("n_intersect").cast("double") / col("n_union"))
      .where(col("jaccard") >= cfg.jaccardThreshold)
      .select("a_id", "b_id", "n_intersect", "n_union", "jaccard")
  }

  /** SimHash per document (alternative near-dup sketch; 64-bit, Hamming
   *  distance ≤ 3 ≈ high similarity for token streams). */
  def simhashes(corpus: DataFrame): DataFrame = {
    val simUdf = udf((c: String) => Shingles.simhash64(c))
    corpus.select(col("rkey"), simUdf(col("content")).as("simhash"))
  }

  /** SimHash over content-distinct representatives, using the md5-derived
   *  token bits ([[Shingles.simhashMd5]]) so an ANSI-SQL oracle can replay
   *  the exact sketch (q08's DuckDB oracle). */
  def uniqSimhashesMd5(corpusK: DataFrame): DataFrame = {
    val simUdf = udf((c: String) => Shingles.simhashMd5(c))
    uniqProjected(corpusK, simUdf(col("content")))
      .select(col("rkey"), col("payload").as("simhash"))
  }

  /**
   * SimHash near-dup candidates at Hamming distance ≤ `maxDist`, found by the
   * block-permutation trick (Manku et al., WWW'07): split the 64-bit sketch
   * into `maxDist + 1` blocks — any pair within distance `maxDist` matches
   * exactly on at least one block (pigeonhole). One equi-join per block on
   * `(block_idx, block_value)`, then verify true distance with `bit_count`.
   */
  def simhashPairs(simhashes: DataFrame, maxDist: Int = 3,
                   maxBlockSize: Int = 65536): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val blocked0 = simhashes.select(
      col("rkey"), col("simhash"),
      posexplode(array((0 until blocks).map { i =>
        shiftrightunsigned(col("simhash"), i * width)
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("block", "block_value")))
    // Skew guard (same stop-bucket rule as the LSH stage): a block value
    // shared by m docs contributes O(m²) join rows; blocks over the cap are
    // dropped (they are boilerplate sketches — their members still cluster
    // via the exact stage). The hot-block list is tiny → broadcast anti-join.
    val hot = blocked0.groupBy("block", "block_value").count()
      .where(col("count") > maxBlockSize).select("block", "block_value")
    val blocked = blocked0.join(broadcast(hot), Seq("block", "block_value"), "left_anti")
    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b,
        col("a.block") === col("b.block") &&
          col("a.block_value") === col("b.block_value") &&
          col("a.rkey") < col("b.rkey"))
      .select(col("a.rkey").as("a_key"), col("b.rkey").as("b_key"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
