package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stage 3 — cluster resolution: iterative connected components over the
 * duplicate-pair edge set (exact + near-dup + substring edges), the
 * "union-find semantics in DataFrames" of BASELINE.json north_rule.
 *
 * Algorithm: the alternating large-star / small-star method (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14; load-balanced
 * variant surveyed in PAPERS.md "BTS", ICDE'24). Converges in O(log² n)
 * rounds on adversarial graphs, O(log n) typical; each round is two
 * aggregate+join passes — no `collect_set` anywhere, so a node with millions
 * of neighbors (the hot license-header cluster) never materializes its
 * adjacency list in one task:
 *
 *   - min-neighbor per node is a `groupBy().min()` (map-side partial agg —
 *     the hot node combines locally on every executor);
 *   - the join back on the node id is skew-handled by AQE
 *     (`spark.sql.adaptive.skewJoin`).
 *
 * Lineage is cut every round with `localCheckpoint` (or reliable
 * `checkpoint` when a checkpoint dir is set — resumability per north_rule);
 * without it the iterative plan grows exponentially in the optimizer.
 *
 * Node ids are 64-bit (`xxhash64` of the row key) so the shuffle carries
 * 16 bytes/edge; keys are joined back once at the end. A collision merges two
 * clusters with probability ~n²/2⁶⁴ (≈1e-7 at 10⁹ rows) — acceptable for the
 * candidate graph because every emitted pair was *verified* upstream; exact
 * group ids remain sha256-based.
 */
object Clustering {

  /** One large-star round: for every node u, connect every strictly-larger
   *  neighbor to u's minimum neighborhood label. Input edges are directed
   *  (src, dst); the round symmetrizes internally.
   *
   *  ONE exchange: the explicit `repartition(src)` satisfies both the
   *  aggregation and the join downstream (Catalyst reuses the exchange and
   *  the co-partitioning), so a round is one shuffle instead of three —
   *  iteration wall time is stage-count-bound, not data-bound, on every
   *  cluster size. Intermediate duplicate edges are NOT deduped here; the
   *  single `distinct` at the end of smallStar bounds the round's output. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
    val mins = sym.groupBy("src").agg(min(col("dst")).as("mn"))
    sym.join(mins, "src")
      .select(col("src"), col("dst"), least(col("mn"), col("src")).as("m"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
  }

  /** One small-star round over edges already pointing high→low; one exchange
   *  plus the round-final distinct. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val e = edges.where(col("src") =!= col("dst")).repartition(col("src"))
    val mins = e.groupBy("src").agg(min(col("dst")).as("m"))
    val relinked = e.join(mins, "src")
      .select(col("dst").as("src"), col("m").as("dst"))
    relinked.union(mins.select(col("src"), col("m").as("dst"))).distinct()
  }

  /** Edge-count bound under which [[connectedComponents]] finishes the
   *  (already contracted, deduplicated) graph with a driver-side union-find
   *  instead of star rounds. 4M edges ≈ 64 MB of longs — trivially driver-
   *  safe, while each avoided star round costs 2+ shuffles of driver-
   *  coordinated latency that a higher core count cannot shrink. */
  val DefaultLocalFinishEdges: Long =
    sys.env.get("SPARK_GRAFT_CC_LOCAL_EDGES").map(_.toLong).getOrElse(4000000L)

  /** Driver-side union-find over a collected edge list (min-id root wins —
   *  identical labeling to the converged star rounds). The input edge set is
   *  distinct + self-loop-free and BOUNDED by [[DefaultLocalFinishEdges]];
   *  at 10⁹-row corpus scale the rep-level contracted graph can exceed the
   *  bound, in which case the distributed star rounds below run instead. */
  private def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val dbg = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    def lap(what: String): Unit = if (dbg) {
      System.err.println(f"[graft.cc] local.$what ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
      }
      x
    }
    val nodes = new java.util.HashSet[Long]()
    val collected = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
    lap(s"collect(${collected.length} edges)")
    collected.foreach {
      case (a, b) =>
        nodes.add(a); nodes.add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    lap(s"unionfind(${nodes.size} nodes)")
    val out = new Array[(Long, Long)](nodes.size)
    var i = 0
    nodes.forEach(n => { out(i) = (n, find(n)); i += 1 })
    lap("flatten")
    // parallelize, NOT createDataset: a local-collection Dataset encodes
    // every row on the DRIVER at execution (LocalTableScan) — measured as a
    // scale-flat multi-second serial segment at millions of nodes;
    // parallelize ships raw tuples and encodes IN TASKS, in parallel.
    val df = spark.createDataset(
      spark.sparkContext.parallelize(out.toIndexedSeq,
        math.max(spark.sparkContext.defaultParallelism, 8)))
      .toDF("node", "component")
    lap("dataset")
    df
  }

  /**
   * Resolve components. `edges` must have two long columns (src, dst); the
   * result maps every node id appearing in `edges` to its component's minimum
   * node id (`node`, `component`).
   *
   * Hybrid two-level design: the input here is already the *contracted*
   * similarity graph (exact groups collapsed to representatives upstream);
   * when the distinct edge set fits under `localFinishEdges` the driver
   * finishes it with union-find in one collect — star rounds only run on
   * graphs too large for that, where their per-round shuffle cost is
   * amortized by real data volume.
   */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 50,
                          forceReliable: Boolean = false,
                          localFinishEdges: Long = DefaultLocalFinishEdges): DataFrame = {
    val spark = edges.sparkSession
    // Reliable (FS-backed) checkpoints auto-engage whenever a checkpoint dir
    // is configured — RunContext always sets one, so pipeline runs get them
    // by default. localCheckpoint stores blocks on EXECUTORS with truncated
    // lineage: on a real cluster an executor loss mid-iteration would fail
    // the job unrecoverably, which is exactly what north_rule's resumability
    // clause exists to prevent. Sessions without a checkpoint dir (ad-hoc
    // notebook use) keep the cheap local variant.
    val reliable = forceReliable || spark.sparkContext.getCheckpointDir.isDefined
    val cur0 = edges
      .select(col(edges.columns(0)).cast("long").as("src"), col(edges.columns(1)).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"), least(col("src"), col("dst")).as("dst"))
      .distinct()
    // EAGER checkpoint of the initial edge set: the star rounds reference
    // their input twice (join + aggregation side), and an unmaterialized
    // input subtree — potentially a whole upstream candidate pipeline —
    // would execute once per reference, inside every round-1 stage.
    val dbgT = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    var tCk = System.nanoTime()
    var cur = if (reliable) cur0.checkpoint() else cur0.localCheckpoint(true)
    if (dbgT) System.err.println(
      f"[graft.cc] input-checkpoint(reliable=$reliable) ${(System.nanoTime() - tCk) / 1e9}%.2f s")
    tCk = System.nanoTime()
    val nEdges = cur.count()
    if (dbgT) System.err.println(f"[graft.cc] count($nEdges) ${(System.nanoTime() - tCk) / 1e9}%.2f s")
    if (nEdges <= localFinishEdges) return localComponents(cur)
    var converged = false
    var it = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    val dbg = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    while (!converged && it < maxIterations) {
      val t0 = System.nanoTime()
      val next0 = smallStar(largeStar(cur))
      // LAZY local checkpoint: the convergence-signature aggregation below is
      // the action that materializes it — one job per round, not two. The
      // round-level resumability checkpoint is the *stage* parquet around the
      // whole CC call (RunContext); reliable per-round checkpoints are opt-in
      // (they cost a distributed-FS write+read per round).
      val next = if (reliable) next0.checkpoint() else next0.localCheckpoint(false)
      // Convergence: the (count, xor-of-edge-hash) signature is a fixpoint.
      // bit_xor (not sum) — overflow-free under ANSI mode, order-insensitive.
      val sig = next.agg(
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h"))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
        .head()
      converged = sig == prevSig
      prevSig = sig
      cur = next
      it += 1
      if (dbg) System.err.println(
        f"[graft.cc] iter $it ${(System.nanoTime() - t0) / 1e9}%.2f s edges=${sig._1}")
    }
    System.err.println(s"[graft.cc] converged after $it iterations")
    // After convergence every edge points member→root (a star). Roots map to
    // themselves; include them explicitly.
    cur.select(col("src").as("node"), col("dst").as("component"))
      .union(cur.select(col("dst").as("node"), col("dst").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
  }

  /**
   * Assemble the final cluster table (north_star): every corpus row with its
   * cluster id and the canonical representative — the lexicographically
   * smallest member key, generalizing the reference's keeper rule
   * (snapshot/mod.rs:84-91). Rows in no pair are singleton clusters
   * represented by themselves.
   *
   * @param members `(rkey, repo, path, commit)` for every corpus row
   * @param pairs   verified duplicate pairs `(a_key, b_key)`
   */
  /**
   * [[clusterTable]] with exact-duplicate groups pre-collapsed: `baseRep`
   * maps members of exact groups to their keeper (`(rkey, rep0)`; rows
   * absent map to themselves), and `repPairs` are similarity edges BETWEEN
   * representatives. CC then runs on the representative-level graph only —
   * the exact-group star edges (the bulk of the edge volume on a duplicate-
   * heavy corpus) never enter the iteration; members pick up their
   * component through the keeper mapping afterwards. Identical cluster
   * partition and rep_key as the star-edge formulation; only the opaque
   * cluster_id labels differ.
   */
  /** Row bound for the singleton-bypass broadcast gate. The component table
   *  is 16-byte long pairs (64 MB at the default bound); the STRING-keyed
   *  sides (keeper mapping, keeper set) get a QUARTER of the row budget
   *  (~100 B/row keys ⇒ ~100 MB broadcast worst-case — the same
   *  big-executor budget class as the sharded prune sketch). Past either
   *  gate the dense shuffle formulation below runs instead — identical
   *  output. */
  val DefaultClusterBroadcastMaxRows: Long =
    sys.env.get("SPARK_GRAFT_CLUSTER_BC_ROWS").map(_.toLong).getOrElse(4000000L)

  def clusterTableCollapsed(members: DataFrame, baseRep: DataFrame,
                            repPairs: DataFrame,
                            broadcastMaxRows: Long = DefaultClusterBroadcastMaxRows): DataFrame = {
    // Pair columns may arrive as row-key strings (hashed to node ids here)
    // or already as 64-bit node ids (the pipeline's narrow interior form —
    // xxhash64(rkey) by construction, so both spellings label identically).
    val edges = repPairs.schema(repPairs.columns(0)).dataType match {
      case org.apache.spark.sql.types.LongType =>
        repPairs.select(col(repPairs.columns(0)).as("src"),
          col(repPairs.columns(1)).as("dst"))
      case _ => repPairs.select(
        xxhash64(col(repPairs.columns(0))).as("src"),
        xxhash64(col(repPairs.columns(1))).as("dst"))
    }
    // Multi-member components arise from exactly two sources: exact-dup
    // groups (a NON-TRIVIAL keeper mapping row, or BEING a keeper) and
    // similarity pairs (a cc row). Every other row is a singleton cluster —
    // on a mostly-unique corpus the large majority — whose label, rep and
    // action are its own: it never needs the rep aggregation or the join
    // back. Trivial `rep0 == rkey` mapping rows are dropped up front (the
    // left_outer + coalesce below reconstructs them exactly).
    val baseRepNT = baseRep.where(col("rep0") =!= col("rkey"))
    val nMap = baseRepNT.count()
    // cc rows = distinct pair nodes ≤ 2 × pair rows: gate on the CHEAP
    // count (pairs are materialized stages) instead of counting cc itself,
    // which on the star-round path would re-execute its final aggregation
    // only to learn it is too big.
    val nCcUpper = 2L * repPairs.count()
    val cc = connectedComponents(edges)
    if (nMap <= broadcastMaxRows / 4 && nCcUpper <= broadcastMaxRows) {
      // Singleton-bypass formulation: all three lookup sides broadcast, so
      // `labeled` stays IN THE SCAN STAGE (zero exchange); only the bounded
      // "involved" subset (exact-group members + keepers + pair nodes) pays
      // the rep aggregation and join-back, and singleton rows flow scan →
      // output untouched. Identical rows to the dense path (spec-asserted).
      val keepers = baseRepNT.select(col("rep0").as("rkey")).distinct()
        .withColumn("is_keeper", lit(true))
      val labeled = members
        .join(broadcast(baseRepNT), Seq("rkey"), "left_outer")
        .join(broadcast(keepers), Seq("rkey"), "left_outer")
        .withColumn("rep0", coalesce(col("rep0"), col("rkey")))
        .withColumn("node", xxhash64(col("rep0")))
        .join(broadcast(cc), Seq("node"), "left_outer")
      // rep0/rkey are never null and the isNotNull tests are two-valued, so
      // `inv` is a real boolean — `!inv` below cannot swallow rows.
      val inv = col("component").isNotNull ||
        col("rep0") =!= col("rkey") || col("is_keeper").isNotNull
      val involved = labeled.where(inv)
        .withColumn("component", coalesce(col("component"), col("node")))
      val reps = involved.groupBy("component").agg(min(col("rkey")).as("rep_key"))
      val multi = involved.join(reps, "component")
        .withColumn("action",
          when(col("rkey") === col("rep_key"), lit("keep")).otherwise(lit("symlink")))
        .select(col("rkey"), col("repo"), col("path"), col("commit"),
          col("component").as("cluster_id"), col("rep_key"), col("action"))
      val singles = labeled.where(!inv)
        .select(col("rkey"), col("repo"), col("path"), col("commit"),
          col("node").as("cluster_id"), col("rkey").as("rep_key"),
          lit("keep").as("action"))
      multi.union(singles)
    } else {
      // Dense formulation (the at-scale fallback): mapping or component
      // table past the broadcast budget — shuffle joins over the full
      // member table, AQE handling skew.
      val labeled = members
        .join(baseRepNT, Seq("rkey"), "left_outer")
        .withColumn("rep0", coalesce(col("rep0"), col("rkey")))
        .withColumn("node", xxhash64(col("rep0")))
        .join(cc, Seq("node"), "left_outer")
        .withColumn("component", coalesce(col("component"), col("node")))
      val reps = labeled.groupBy("component").agg(min(col("rkey")).as("rep_key"))
      labeled.join(reps, "component")
        .withColumn("action", when(col("rkey") === col("rep_key"), lit("keep")).otherwise(lit("symlink")))
        .select(col("rkey"), col("repo"), col("path"), col("commit"),
          col("component").as("cluster_id"), col("rep_key"), col("action"))
    }
  }

  def clusterTable(members: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = members.sparkSession
    val dbg = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    val t0 = System.nanoTime()
    val m = members.withColumn("node", xxhash64(col("rkey")))
    val edges = pairs.select(
      xxhash64(col(pairs.columns(0))).as("src"),
      xxhash64(col(pairs.columns(1))).as("dst"))
    val cc = connectedComponents(edges)
    if (dbg) System.err.println(f"[graft.cc] cc-total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val labeled = m.join(cc, Seq("node"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("node")))
    // Representative = min rkey per component; broadcast-sized only per-group,
    // so use an aggregation + join on the component id (AQE handles the skew
    // of giant clusters).
    val reps = labeled.groupBy("component").agg(min(col("rkey")).as("rep_key"))
    labeled.join(reps, "component")
      .withColumn("action", when(col("rkey") === col("rep_key"), lit("keep")).otherwise(lit("symlink")))
      .select(col("rkey"), col("repo"), col("path"), col("commit"),
        col("component").as("cluster_id"), col("rep_key"), col("action"))
  }
}
