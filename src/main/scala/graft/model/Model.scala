package graft.model

/**
 * Core row types of the engine, mirroring the reference's data model
 * (see SURVEY.md §1) re-expressed as Spark-encodable case classes.
 *
 * Reference mapping:
 *  - [[FileRow]]        ≙ one scanned file (reference: scanner.rs:14-31 emits paths;
 *                         here content is in-table per BASELINE.json input_hint).
 *  - [[SnapshotEntry]]  ≙ snapshot/mod.rs:49-53 `FilePath {path, op}` flattened with
 *                         its group key (snapshot/mod.rs:115-119 `Snapshot.duplicates`).
 *  - [[ActionRow]]      ≙ executor.rs:11-24 `Action` (validated, executable plan row).
 *  - [[ClusterRow]]     ≙ the north-star cluster table keyed by (repo,path,commit)
 *                         with a canonical-representative column.
 */
case class FileRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** One row of the duplicate snapshot. `group_id` is the sha256 hex of content
 *  (deliberate, strictly-safer deviation from the reference's xxh3 u64 group id —
 *  see SURVEY.md §2.3 A4 and hash.rs:25-28). */
case class SnapshotEntry(
    group_id: String,
    repo: String,
    path: String,
    commit: String,
    size: Long,
    action: String,          // keep | symlink | delete
    symlink_source: String)  // nullable; keeper key for symlink rows

/** Validated, executable action (executor.rs:11-24). `valid=false` rows carry the
 *  violation in `error` — we collect all violations instead of failing fast
 *  (validation.rs:350-353), a strictly-more-informative deviation. */
case class ActionRow(
    group_id: String,
    repo: String,
    path: String,
    commit: String,
    action: String,
    symlink_source: String,
    is_no_op: Boolean,
    valid: Boolean,
    error: String)

/** Final cluster table row (north_star): each corpus file with its resolved
 *  duplicate-cluster id and canonical representative. */
case class ClusterRow(
    repo: String,
    path: String,
    commit: String,
    cluster_id: Long,
    rep_repo: String,
    rep_path: String,
    rep_commit: String,
    action: String)

/** Tuning knobs for the near-dup stages. Defaults chosen so that the
 *  false-negative probability for a pair at the Jaccard threshold is
 *  (1 - s^rows)^bands ≈ 4e-13 at s=0.6, rows=2, bands=64 — i.e. recall
 *  is 1.0 minus measurement noise (north_rule: recall ≥ 0.99). */
case class DedupConfig(
    shingleN: Int = 5,
    minhashK: Int = 128,
    bands: Int = 64,
    rowsPerBand: Int = 2,
    jaccardThreshold: Double = 0.6,
    /** LSH buckets larger than this are dropped as "stop shingles" (skew guard,
     *  north_rule). Dropped buckets are reported in metrics, never silently. */
    maxBucketSize: Int = 4096,
    /** Fingerprint gram width for the long-substring pass. */
    gramWidth: Int = 48,
    /** Keep a sampled gram when (hash & sampleMask) == 0 (1/64 sampling). */
    sampleMask: Long = 63L,
    /** Minimum shared sampled grams to emit a substring-pair edge. */
    minSharedGrams: Int = 2,
    /** Corpus row count at or under which the content-dedup representative
     *  key set broadcasts (the big side then never shuffles its content);
     *  above it, the shuffle-hash semi-join runs instead — at 10⁹ rows the
     *  key set no longer fits an executor broadcast budget. 10M ids ≈ 80 MB
     *  broadcast — the practical ceiling of a comfortable executor
     *  broadcast, and covers the 3M-row bench corpus. */
    repBroadcastMaxRows: Long = 10000000L,
    /** Candidate-pair count at or under which the verify passes broadcast
     *  the pair-member key set for the semi-filter (2·pairs ids). Above it
     *  the semi-join falls back to a shuffle — at 10⁹-scale candidate
     *  volumes the member set is itself shuffle-sized. */
    verifyKeyBroadcastMaxPairs: Long = 5000000L,
    quick: Boolean = false,
    /** Route the long-substring pass through the EXACT prefix-doubling
     *  suffix pass ([[graft.operators.SuffixArray]]) instead of the sampled
     *  rolling-fingerprint path — no hashing in the pair decision, at
     *  O(total content chars) suffix-table cost. Off by default (the
     *  sampled path is the benchmark scale path); SuffixArraySpec proves
     *  pair-set equality on the planted fixtures. */
    substringViaSuffixArray: Boolean = false,
    /** Prune provably-singleton LSH/gram buckets BEFORE their co-locating
     *  exchange ([[graft.functions.SeenTwice]] bitset sketch — exact: false
     *  positives only keep rows, never drop a pair). Skipped when the
     *  exploded row count exceeds `pruneMaxRows`: the 2^29-bit capped
     *  sketch saturates past it (load ≫ 1 marks every slot) and the filter
     *  would prune nothing for two extra scans. */
    pruneSingletons: Boolean = true,
    pruneMaxRows: Long = 1L << 29,
    /** Past `pruneMaxRows` the prune switches to the SHARDED sketch
     *  ([[graft.functions.SeenTwice.pruneSharded]]): slot space split into
     *  ≤64 MB per-shard bitsets built/merged shard-parallel, total bits
     *  capped at 2^35 (4 GB broadcast — big-executor budget). Above THIS
     *  bound even the sharded sketch saturates (load > 1 at the 4 GB cap)
     *  and the prune passes through; the 10⁹-doc recipe is band-RANGE
     *  processing (BENCH/PROFILE_r05.md), which re-enters this window
     *  per range. */
    pruneShardedMaxRows: Long = 1L << 33,
    /** Exploded-row floor below which the prune is skipped: the sketch pays
     *  a fixed second scan of the exploded table, worth it only when the
     *  sort it shrinks is big (measured: 158M band rows sort 34-65 s at 16
     *  threads, pruned 14-22 s incl. sketch; 22M gram rows sort ~11 s —
     *  the sketch's ~6 s scan tax nets negative there). */
    pruneMinRows: Long = 1L << 26,
    seed: Long = 42L) {
  require(minhashK == bands * rowsPerBand, "minhashK must equal bands*rowsPerBand")
}
