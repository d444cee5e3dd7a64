package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

/** Generic distributed graph algorithms over (src, dst) edge frames —
  * type-agnostic in the node id (string node ids, long doc ids, ...).
  */
object GraphAlgo {

  /** Serializes the AQE-off scopes below: the iterative algorithms
    * (PageRank, triangle count, LPA) measured faster with AQE's
    * per-stage re-planning disabled, which requires a session-conf
    * toggle — Spark has no per-query AQE switch. The JVM-wide lock
    * makes overlapping scoped calls impossible (no stale-value
    * restore race); an UNRELATED query racing on the same session
    * can still plan one stage with AQE off — harmless for
    * correctness, documented here for the perf-curious. Each scope
    * materializes its result eagerly inside the lock. */
  private val aqeScopeLock = new Object
  private def withAqeOff[T](spark: org.apache.spark.sql.SparkSession)
      (body: => T): T = aqeScopeLock.synchronized {
    val saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  /** Rows per task for the CPU-bound iterative loops below (r16).
    * AQE's coalescing is BYTE-based (parallelismFirst targets
    * max(bytes/parallelism, 1 MB)): a graph round's few MB of shuffle
    * coalesces to ONE partition, serializing the whole round's window
    * sort / hash build on a single core (measured: every b14 CC round
    * ran at parts=1 on local[32], 1.1-1.4 s per round of 92.5k
    * edges). Per-ROW cost is what dominates these rounds, so the loop
    * partition count derives from the round's row count instead:
    * ceil(rows / 8k), clamped to the session shuffle parallelism — at
    * cluster scale rows/8k exceeds the session setting, the clamp
    * returns the session value, and behavior is unchanged (this is a
    * size-derived floor on parallelism, not a local[32] constant). */
  /** Default rows/task for the WINDOW-SORT loop family (CC's
    * alternating stars, k-core's degree rounds): per-row work is a
    * per-center sort, heavy enough that ~32k-row tasks amortize their
    * scheduling cost (r16 partition sweep on b14's 185k-row rounds:
    * 6 parts = 0.52 s/round, 1 part = 1.1-1.4, 23 parts = 2.3-5.4;
    * re-confirmed r17: b14 at 32768 = 4.35 s vs 5.15 at 131072). */
  private val SortLoopRowsPerTask = 32768L
  /** Default rows/task for the JOIN/AGG loop family (PageRank, LPA,
    * path centrality, shortest paths): per-row work is a codegen'd
    * hash probe + partial agg — far cheaper per row, so tasks need
    * ~4x more rows before parallelism beats scheduling overhead (r17
    * isolated 3-pass sweep at CPUS=32, sf0.1: rowsPerTask
    * 32768→131072→524288 gives b18 5.46→4.25→5.26 s, b15
    * 4.43→3.33→4.46, b21 2.93→2.58→3.03, b28 6.74→5.53→8.25 — the
    * mid setting wins every join/agg loop). The r16 default (32768
    * everywhere) fanned b18's 1.9M-row loop to the full 32-way
    * session width, which the driver's loaded-box window punished
    * ~4x (r16 verdict #1); 131072 halves the fan-out (15 parts) AND
    * is faster on a quiet box. */
  private val JoinLoopRowsPerTask = 131072L

  private def loopParts(spark: org.apache.spark.sql.SparkSession,
                        rows: Long, ceiling: Int,
                        dfltRowsPerTask: Long): Int = {
    val rowsPerTask = spark.conf
      .getOption("spark.graft.loop.rowsPerTask")
      .map { v =>
        try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.loop.rowsPerTask must be a positive long, got '$v'")
        }
      }.getOrElse(dfltRowsPerTask)
    math.max(1L, math.min(ceiling.toLong,
      (rows + rowsPerTask - 1) / rowsPerTask)).toInt
  }

  /** Scoped (set/restore, under [[aqeScopeLock]]) shuffle parallelism
    * + AQE byte-coalescing override for an iterative loop's plans and
    * actions. `body` receives a setter the loop calls per round with
    * the round's input row count. The clamp CEILING is the session
    * shuffle width captured ONCE at scope entry (r16 advice: reading
    * the live conf inside the loop re-read the previous round's own
    * setting, so per-round parallelism could only ratchet down). At
    * cluster scale rows/rowsPerTask far exceeds any session width, so
    * the clamp returns the session value and the scope is a no-op —
    * the sizing only bites where data is small relative to width. */
  private def withLoopParts[T](spark: org.apache.spark.sql.SparkSession,
                               dfltRowsPerTask: Long = SortLoopRowsPerTask)
      (body: (Long => Unit) => T): T = aqeScopeLock.synchronized {
    val ceiling = spark.sessionState.conf.numShufflePartitions
    val savedP = spark.conf.get("spark.sql.shuffle.partitions",
      ceiling.toString)
    val savedC = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    def set(rows: Long): Unit = spark.conf.set(
      "spark.sql.shuffle.partitions",
      loopParts(spark, rows, ceiling, dfltRowsPerTask).toString)
    try body(set)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", savedP)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        savedC)
    }
  }

  /** Scoped size-derived loop parallelism for bounded-round join/agg
    * dataflows OUTSIDE this file (b15 path centrality, b21 shortest
    * paths): plans built and actions run inside `body` use
    * [[loopParts]](rows) shuffle partitions with AQE byte-coalescing
    * disabled — at cluster scale the clamp returns the session width
    * and the scope is a no-op. */
  def withSizedLoop[T](spark: org.apache.spark.sql.SparkSession,
                       rows: Long)(body: => T): T =
    withLoopParts(spark, JoinLoopRowsPerTask) { set => set(rows); body }

  /** [[connectedComponents]] with per-round stderr timing (scratch). */
  def connectedComponentsDebug(edgesIn: DataFrame, maxIter: Int = 20): DataFrame =
    connectedComponents(edgesIn, maxIter, debug = true)

  /** Undirected connected components via alternating large-star /
    * small-star contraction (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public literature; also the
    * GraphFrames strategy). Unlike label propagation, each round
    * rewrites the EDGE SET toward a star forest, so the data a round
    * touches shrinks as components collapse; rounds are O(log n) and
    * each is two groupBy+join passes over the current edges. Component
    * id = the smallest member under the id type's ordering. Returns
    * (node, component) for every node incident to an edge. */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 30,
                          debug: Boolean = false): DataFrame = {
    // precondition (r16 advice): with zero rounds the initial
    // orientation is returned un-deduplicated — every caller runs at
    // least one round, which small-star's distinct bounds.
    require(maxIter > 0, s"connectedComponents needs maxIter > 0 " +
      s"(got $maxIter): round 1's small-star dedup is what bounds " +
      "duplicated input edges")
    // ONE materialization of the input edge frame: both the node set
    // (needed only by the final join) and the oriented edge set
    // derive from this checkpoint, so an expensive upstream (c16's
    // LSH-verify candidate pipeline feeds CC directly) runs once —
    // two separate barriers here used to evaluate it twice. The
    // derived frames are each consumed once, so they need no
    // barriers of their own.
    val dir = edgesIn.toDF("src", "dst").barrier(true)
    val nodes = dir.select(col("src").as("node"))
      .unionAll(dir.select(col("dst").as("node")))
      .distinct()
    // orient every edge large→small; drop loops. NO initial distinct
    // (r16, guide §2.4 "a distinct on data that is already unique"):
    // every duplicate/reverse edge flows through round 1 unchanged —
    // large-star's per-center window MIN is duplicate-insensitive and
    // small-star's trailing distinct bounds the round's output — so
    // round 1's OUTPUT SET (and every later round, and the
    // convergence signature, which only ever hashes round outputs) is
    // identical with or without the dedup, while the dedup itself
    // cost a full |E|-row exchange in the round-1 job. Callers feed
    // already-unique relations (verified pairs are id_a<id_b distinct,
    // b14's invalidates edges are one row per event pair), so the
    // exchange bought nothing; an input WITH duplicates just carries
    // ≤2x rows through one round instead of paying the shuffle.
    var e = dir.where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))

    // Each phase is one min-window over the phase's center column;
    // duplicates flow through large-star untouched (window mins are
    // duplicate-insensitive) and the round's output is bounded by
    // small-star's single distinct — two exchanges per phase pair.
    // (The in-exchange row_number-dedup alternative was measured
    // SLOWER on this shape — see the round-5 numbers at the
    // convergence loop below — so it was rejected.)
    import org.apache.spark.sql.expressions.Window

    // `spark.graft.cc.aggstars=true` swaps both stars' per-center min
    // from the window shape to groupBy(center).agg(min) + join-back —
    // same two exchanges per phase (the join's both sides land on the
    // center key the window would shuffle to anyway), but the min
    // combines MAP-SIDE and the probe join is AQE-skew-splittable, so
    // a web-crawl hub with 1e8 neighbors costs one combined row per
    // map task instead of one sorted WindowExec task. Default stays
    // windowed: on the max-degree-3k testdata graphs the shapes tie
    // (CcAB, SURVEY §8l) and the window saves a join operator; the
    // flag is the documented escape hatch for hub-degree graphs.
    val aggStars = edgesIn.sparkSession.conf
      .getOption("spark.graft.cc.aggstars").contains("true")
    // large-star: around each center c, link every LARGER neighbor to
    // the minimum of N(c) ∪ {c} (keeps orientation, halves path reach)
    def largeStar(E: DataFrame): DataFrame = {
      val bid = E.select(col("u").as("c"), col("v").as("n"))
        .unionAll(E.select(col("v").as("c"), col("u").as("n")))
      val withMin =
        if (aggStars)
          bid.join(bid.groupBy(col("c")).agg(min(col("n")).as("__mn")),
              Seq("c"))
            .withColumn("m", least(col("__mn"), col("c")))
        else bid.withColumn("m",
          least(min(col("n")).over(Window.partitionBy(col("c"))), col("c")))
      withMin
        .where(col("n") > col("c") && col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
      // no distinct here: both shapes' mins are duplicate-
      // insensitive and small-star's distinct bounds the round's
      // output — saves one shuffle per phase
    }
    // small-star: around each center u (over the oriented edges), link
    // every smaller neighbor and u itself to min(N(u) ∪ {u}) (edges
    // are oriented u>v, so min(N(u) ∪ {u}) = min(v))
    def smallStar(E: DataFrame): DataFrame = {
      val withMin =
        if (aggStars)
          E.join(E.groupBy(col("u")).agg(min(col("v")).as("m")), Seq("u"))
        else
          E.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
      withMin
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"),
          least(col("n"), col("m")).as("v"))
        .distinct()
    }

    var iter = 0
    var prev: (Long, BigDecimal) = (-1L, BigDecimal(-1))
    var done = false
    // current edge count drives the loop's partition sizing (see
    // loopParts — AQE's byte-based coalescing serialized every round
    // onto one task): the input count is one cheap job over the
    // already-materialized barrier blocks; each later round's count
    // rides the convergence aggregate for free.
    var curEdges = dir.count()
    withLoopParts(edgesIn.sparkSession) { setParts =>
    while (iter < maxIter && !done) {
      val t0 = System.nanoTime()
      setParts(2L * curEdges) // bid = both directions of the edge set
      // lazy checkpoint: the convergence agg below is the action that
      // materializes the blocks — one job per round, not two.
      // Measured round-5 alternatives, all SLOWER here than this
      // minimal-lineage single alternation (92.5k-edge chains,
      // local[32], warm): (a) two alternations per checkpoint 13.5 s,
      // (b) in-exchange row_number dedup replacing the distinct
      // (2 exchanges/round) 11.7-13.5 s even with count-adaptive
      // partition sizing, (c) double large-star per round (4 rounds)
      // 12.7 s — vs 10.3 s for this shape. Per-stage scheduling
      // overhead dominates at bench scale; at cluster scale AQE sizes
      // these same exchanges, so the shape holds there too.
      val next = smallStar(largeStar(e)).barrier(false)
      // convergence = edge set is a fixed point: same count and same
      // order-independent hash — one agg over the just-materialized
      // blocks, no extra join
      val row = next.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).first()
      val sig = (row.getLong(0),
        if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
      if (debug) System.err.println(
        f"[cc] round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"edges=${sig._1}, parts=${next.rdd.getNumPartitions}")
      done = sig == prev
      prev = sig
      curEdges = sig._1
      e = next
      iter += 1
    }
    }
    // fixed point is a star forest u→root; roots map to themselves
    nodes.join(e, col("node") === col("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  /** PageRank with a FIXED iteration count, fully deterministic and
    * oracle-reproducible via INTEGER fixed-point arithmetic: ranks are
    * bigints scaled by 10^12, contributions are `r div outdeg`
    * (truncating integer division), the per-target reduction is a
    * plain decimal(38,0) SUM — exact, order-independent, map-side
    * combinable — and damping is `(s * d%) div 100`. No floating point
    * until the final unscale, and no double→decimal cast anywhere, so
    * the distributed plan is bit-identical to the single-threaded SQL
    * replay regardless of partitioning or skew. Unnormalized form
    * r' = (1-d) + d * Σ r_src/outdeg_src over in-edges, quantized at
    * 1e-12 per step. (Round 2 used a per-destination
    * sort_array(collect_list) sequential fold for determinism; that
    * materialized a hub's whole in-neighborhood as one row — an OOM
    * bomb on skewed keys at scale. The fixed-point sum keeps the
    * determinism and restores partial aggregation.)
    *
    * Plan shape per iteration: edges ⋈ ranks (shuffle on src) →
    * groupBy dst (partial agg + shuffle on dst) → left join back to
    * the node set — the standard dataflow PageRank (Pregelix
    * re-expressed as joins); ranks materialize once per iteration. */
  def pageRank(edgesIn: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fixed-point scale: 1e12 keeps hub ranks (≤ ~n) in bigint range
    // at any realistic node count while quantizing far below the
    // round-6 output precision
    val Scale = 1000000000000L
    val dPct = math.round(damping * 100).toInt
    val base = Scale / 100 * (100 - dPct)
    // AQE off for the whole chain, which the final eager barrier
    // below executes inside this scope: the lazy iteration chain is
    // dozens of tiny stages whose per-stage AQE re-planning costs
    // more than it saves (GraphAB interleaved A/B at sf0.1: 4.51 s
    // AQE vs 3.36 s without — the same finding as the b28 LPA loop;
    // CC and k-core measured the OPPOSITE, their edge sets shrink
    // per round and AQE's coalescing wins, so they keep it).
    val spark = edgesIn.sparkSession
    withAqeOff(spark) {
    val dir = edgesIn.toDF("src", "dst")
    // r16: the whole chain (weighted edges, node set, every
    // iteration) runs at a size-derived partition count instead of
    // the static session width — with AQE off nothing coalesces, so
    // 32 session partitions meant 32 tasks per stage for |V|-sized
    // frames whose per-task row counts were in the low thousands
    // (pure scheduling overhead; see loopParts). One cheap count of
    // the edge input sizes the scope; at cluster scale the clamp
    // returns the session width unchanged. Everything inside still
    // materializes eagerly inside the AQE-off scope, and the
    // per-iteration shapes are untouched.
    withLoopParts(spark, JoinLoopRowsPerTask) { setParts =>
    setParts(2L * dir.count())
    // out-degree folded into the edge relation via a window count —
    // ONE shuffle on src, and the materialized result STAYS
    // hash-partitioned on src, so the per-iteration rank join never
    // re-shuffles the (large) edge side
    val weighted = dir
      .withColumn("od", count(lit(1)).over(Window.partitionBy(col("src"))))
      .barrier(true)
    // node set hash-partitioned on node: co-located with both the
    // contribution sums (partitioned on dst) and the next rank
    val nodes = dir.select(col("src").as("node"))
      .unionAll(dir.select(col("dst").as("node")))
      .distinct().barrier(true)
    var rank = nodes.select(col("node").as("id"), lit(Scale).as("r"))
    for (i <- 1 to iters) {
      // ITERATION-1 CLOSED FORM: rank is the uniform constant Scale,
      // so the edge⋈rank join is the identity — contributions are
      // `Scale div od` straight off the weighted edge frame (same
      // truncating integer division, bit-identical), skipping one
      // |E|-row join evaluation (r15 same-session isolated 5-pass
      // A/B at sf0.1: 2.42→2.24 s median, 3-SF oracle re-gate green).
      rank =
        if (i == 1) {
          val contrib = weighted
            .select(col("dst"), expr(s"$Scale div od").as("c"))
          val sums = contrib.groupBy(col("dst"))
            .agg(sum(col("c").cast("decimal(38,0)")).as("s"))
          nodes.join(sums.hint("shuffle_hash"),
              col("node") === col("dst"), "left")
            .select(col("node").as("id"),
              (lit(base) + coalesce(expr(s"(s * $dPct) div 100"),
                lit(0L))).as("r"))
        } else pageRankStep(weighted, nodes, rank, dPct, base)
      // EAGER barrier per iteration (r14 GraphIterAB, interleaved
      // 4-rep A/B at sf0.1: eager-each 3.83 s median / 3.34 min vs
      // the previous lazy chain 4.32 / 4.03, every rep faster,
      // bit-identical ranks): with AQE off the lazy chain compiles
      // one deep many-stage job whose scheduling overhead exceeds the
      // per-iteration checkpoint cost, and the eager shape also
      // bounds lineage at any iteration count. Correctness never
      // needed the barrier — fixed-point arithmetic is partition- and
      // order-independent (round 2 checkpointed to pin fold order;
      // r7-r13 ran lazy with cadence-8 lineage relief).
      if (i < iters) rank = rank.barrier(true)
    }
    // eager: the full chain materializes here, inside the AQE-off
    // scope; the consumer reads the checkpointed per-node ranks
    rank.barrier(true).select(col("id"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
    }
    }
  }

  /** One fixed-point PageRank iteration (exposed for plan-shape
    * specs: the reduction must stay a plain partial-aggregable sum —
    * never a per-destination array materialization). Joins carry
    * shuffle_hash hints: rank and the contribution sums are per-NODE
    * relations — broadcasting them is wrong at scale (and locally it
    * serializes every iteration through the driver); with the inputs
    * pre-partitioned on the join keys the hash joins are exchange-free
    * and the iteration pays exactly one shuffle (the groupBy dst). */
  private[graft] def pageRankStep(weighted: DataFrame, nodes: DataFrame,
                                  rank: DataFrame, dPct: Int,
                                  base: Long): DataFrame = {
    val contrib = weighted
      .join(rank.hint("shuffle_hash"), weighted("src") === rank("id"))
      .select(col("dst"), expr("r div od").as("c"))
    val sums = contrib.groupBy(col("dst"))
      .agg(sum(col("c").cast("decimal(38,0)")).as("s"))
    nodes.join(sums.hint("shuffle_hash"), col("node") === col("dst"), "left")
      .select(col("node").as("id"),
        (lit(base) + coalesce(expr(s"(s * $dPct) div 100"), lit(0L)))
          .as("r"))
  }

  /** Exact triangle count over the undirected simple graph induced by
    * a (src, dst) edge frame (loops dropped, parallel/reverse edges
    * collapsed).
    *
    * Scale shape — degree orientation (Cohen, "Graph Twiddling in a
    * MapReduce World", CiSE'09; the standard distributed layout):
    * every edge is oriented from its lower endpoint to its higher
    * endpoint under the total order (degree, id). Wedges are then
    * enumerated at each edge's TAIL — a node's wedge count is
    * C(out_deg, 2) and out-degree under this orientation is bounded
    * by O(sqrt(|E|)) for any graph, so a degree-10^6 hub contributes
    * ~|E| oriented wedges instead of 10^12 raw ones. The closing
    * check is an equi-join against the oriented edge set (each
    * triangle's π-smallest vertex owns it: counted exactly once).
    * Three shuffles total: degree groupBy, wedge self-join on the
    * tail, existence semi-join on the closing edge. */
  def triangleCount(edges: DataFrame): DataFrame =
    triangleCountUnd(undirected(edges))

  /** [[triangleCount]] over a pre-built [[undirectedSimple]] view.
    * Runs with AQE disabled for its scope (GraphAB A/B at sf0.1:
    * 3.23 s AQE vs 2.50 s without — the oriented wedge join is a few
    * well-sized stages and re-planning only adds latency); the final
    * one-row count materializes eagerly inside the scope. */
  def triangleCountUnd(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    withAqeOff(spark) {
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    // orient lower (deg, id) -> higher; a < b already, so a degree tie
    // keeps a first
    val aFirst = col("da") < col("db") || (col("da") === col("db"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .barrier(true)
    val wedges = o.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
      .join(o.select(col("u").as("u2"), col("v").as("v2"),
        col("dv").as("dv2")),
        col("u") === col("u2") &&
          (col("dv1") < col("dv2") ||
            (col("dv1") === col("dv2") && col("v1") < col("v2"))))
      .select(col("v1"), col("v2"))
    wedges.join(o.select(col("u").as("v1"), col("v").as("v2")),
        Seq("v1", "v2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
      .barrier(true)
    }
  }

  /** Undirected simple-graph view of a (src, dst) edge frame: loops
    * dropped, parallel/reverse edges collapsed, endpoints ordered
    * a < b. The shared input of the whole-graph analytics family
    * (triangles, k-core, node similarity) — build it once per graph
    * (see MemoryGraph.undirectedView for the persisted variant) and
    * pass it to the *Und entry points. */
  def undirectedSimple(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  private def undirected(edges: DataFrame): DataFrame =
    undirectedSimple(edges).barrier(true)

  private def undDegrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Bounded-round k-core peel: `rounds` iterations of (degree count,
    * drop nodes with deg < k, induce the subgraph on the survivors).
    * Converges to the exact k-core when `rounds` reaches the peel
    * depth; with a FIXED round count the result is deterministic and
    * oracle-replayable as an unrolled CTE either way (the contract the
    * driver's hash compare needs — same trade as pageRank's fixed
    * iterations). Per round: one partial-aggregable degree groupBy
    * plus two anti joins against the round's DROPPED frontier
    * (deg < k — the complement of the keep-set over exactly the nodes
    * in the edge frame, so the survivor set is identical to the
    * keep-semi-join formulation): the frontier after round 1 is the
    * handful of nodes that just fell below k (Σ over all rounds ≤
    * |V|), AQE broadcasts it from its runtime size, and the big edge
    * side is never re-exchanged; the edge set only shrinks, so round
    * cost is monotonically non-increasing — the 1000-executor shape
    * for the standard peeling algorithm.
    * Early exit: each round's barrier already materializes the edge
    * set, so its count is free — an unchanged count means no node
    * fell below k, every remaining round is the identity, and the
    * result equals the full `rounds`-deep unrolled oracle exactly.
    * Returns (node, deg) of the round-`rounds` induced subgraph. */
  def kCore(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame =
    kCoreUnd(undirected(edgesIn), k, rounds)

  /** [[kCore]] over a pre-built [[undirectedSimple]] view. */
  def kCoreUnd(und0: DataFrame, k: Int, rounds: Int): DataFrame = {
    var und = und0.barrier(true)
    // input count: one cheap job over the just-materialized blocks —
    // it sizes the loop's partitions (see loopParts) and seeds the
    // early-exit comparison, so a graph that is already a k-core
    // exits after round 1 instead of round 2 (identical output: an
    // unchanged count means the round was the identity either way).
    var prevCount = und.count()
    var r = 0
    var done = false
    withLoopParts(und0.sparkSession) { setParts =>
    while (r < rounds && !done) {
      setParts(2L * prevCount)
      // r16 FRONTIER reshape (guide §3.1): filter against the DROPPED
      // set (deg < k) with anti joins instead of semi joins against
      // the |V|-sized keep-set. Identical survivor set (keep is the
      // complement of dropped over exactly the nodes present in und),
      // but the build side is now the PEEL FRONTIER — after round 1
      // it is the handful of nodes that just fell below k (Σ over all
      // rounds ≤ |V|), which AQE broadcasts at runtime, so the big
      // edge side is never re-exchanged; a heavy-tailed round-1
      // frontier falls back to the shuffled join AQE picks from the
      // REAL size (no hint — the old shuffle_hash hint pinned the
      // worst case on every round).
      val dropped = undDegrees(und).where(col("deg") < k)
        .select(col("node"))
      // LAZY barrier (r15 GraphIterAB, 8-rep RANDOMIZED-order A/B at
      // sf0.1 — the r14 alternating-order arms tied on pure order
      // effects): the early-exit count below is the action that
      // materializes the round's blocks, one job per round instead of
      // two. lazy 3.24 s median / 3.09 min vs eager 3.46 / 3.17,
      // lazy ahead in 6 of 8 reps, bit-identical output (parity gate).
      und = und
        .join(dropped.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(dropped.select(col("node").as("b")), Seq("b"), "left_anti")
        .barrier(false)
      val c = und.count()
      done = c == prevCount
      prevCount = c
      r += 1
    }
    }
    undDegrees(und)
  }

  /** Neighborhood-similarity top pairs: Jaccard over undirected
    * adjacency sets, common neighbors counted by a wedge join at the
    * shared neighbor. Centers with degree > `maxCenterDeg` are
    * EXCLUDED from wedge generation — a hub center contributes
    * deg² wedge rows and (being shared by everything) no similarity
    * signal, so the cap is both the scale bound (intermediate size
    * ≤ Σ_{deg≤D} deg² ≤ D·|E|) and standard practice for
    * common-neighbor scoring; the cap is part of the operator's
    * documented semantics and mirrored exactly in the oracle.
    * Degrees in the Jaccard denominator stay UNcapped. Output: the
    * global top-`topN` pairs by (jaccard, p, q) — a
    * TakeOrderedAndProject, no full sort. */
  def nodeSimilarity(edgesIn: DataFrame, maxCenterDeg: Int,
                     topN: Int): DataFrame =
    nodeSimilarityUnd(undirected(edgesIn), maxCenterDeg, topN)

  /** [[nodeSimilarity]] over a pre-built [[undirectedSimple]] view.
    * Dispatches to [[nodeSimilarityApproxUnd]] when
    * `spark.graft.approx.nodesim=true` (opt-in, same contract as
    * `spark.graft.approx.simjoin`): the exact wedge join stays the
    * default and the oracle — MEASURED FASTER at this graph size
    * (round-8 regenerated sf0.1, tools/NodeSimAB interleaved: exact
    * 12.7 s vs approx 27.7 s median; 4.5 s after the
    * degree-carrying rewrite below): with
    * bounded degrees the wedge intermediate is D·|E|-flat and the
    * top-similar pairs are identical-neighborhood leaf siblings that
    * banding cannot prune (identical signatures collide by design).
    * The approximate path trades bounded recall loss in CANDIDATE
    * GENERATION (scores of returned pairs stay exact, top-20 recall
    * 1.0 at sf0.1 — ApproxNodeSimSpec) for k·|E|-linear scaling in
    * the opposite regime: large diverse neighborhoods where
    * Σ_{deg≤D} deg² ≫ k·|E|. */
  def nodeSimilarityUnd(und0: DataFrame, maxCenterDeg: Int,
                        topN: Int): DataFrame = {
    if (und0.sparkSession.conf
        .getOption("spark.graft.approx.nodesim").contains("true"))
      return nodeSimilarityApproxUnd(und0, maxCenterDeg, topN)
    // the view feeds three consumers (degrees, both wedge sides):
    // materialize once so the self-join reuses one exchange instead
    // of re-scanning the source per reference
    // r17: no re-barrier of the input (see kCoreUnd — the *Und
    // contract is a pre-materialized view; the old barrier(true)
    // copied |E| rows per invocation).
    val und = und0
    val deg = undDegrees(und).barrier(true)
    // the NEIGHBOR's degree rides the adjacency INTO the wedge join
    // and out through the pair aggregation as max(dp)/max(dq) —
    // functionally dependent on the group key, so max is just "the"
    // value — which deletes the two pair-table degree joins
    // scoreCommon would pay: at sf0.1 that was 2 × 12.5M-row shuffles
    // for a 1.9M-row join instead (SizeProbe A/B: cold 15.2 s → 6.4 s,
    // warm parity).
    // r17: BOTH endpoint degrees attach at the EDGE level (|E| rows,
    // two shuffle-hash joins — per-node relations never broadcast at
    // scale), then a 2-element posexplode emits the two orientations
    // and the center cap is a plain FILTER on the carried center
    // degree. This replaces the r16 shape's degree join + center
    // semi-join over the 2|E|-row bidirectional union — half the join
    // probe rows, one fewer exchange, and no shared subtree to
    // re-inline (the explode is the union's single-consumer twin).
    // Row set is identical: edge (a,b) contributes (node=a, nb=b,
    // dnb=deg(b)) iff deg(a) <= cap and (node=b, nb=a, dnb=deg(a))
    // iff deg(b) <= cap — exactly the old centers semi-join.
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da"))
        .hint("shuffle_hash"), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db"))
        .hint("shuffle_hash"), Seq("b"))
    // r16 precedent kept: the capped adjacency is BARRIERED before
    // the wedge self-join — without the materialization each
    // self-join side recompiled the whole upstream (no ReusedExchange
    // fires because the two sides carry different attribute ids).
    val cadj = withDeg
      .select(explode(array(
        struct(col("a").as("node"), col("da").as("dn"),
          col("b").as("nb"), col("db").as("dnb")),
        struct(col("b").as("node"), col("db").as("dn"),
          col("a").as("nb"), col("da").as("dnb")))).as("e"))
      .where(col("e.dn") <= maxCenterDeg)
      .select(col("e.node").as("node"), col("e.nb").as("nb"),
        col("e.dnb").as("dnb"))
      .barrier(true)
    cadj.select(col("node"), col("nb").as("p"), col("dnb").as("dp"))
      .join(cadj.select(col("node"), col("nb").as("q"),
        col("dnb").as("dq")), Seq("node"))
      .where(col("p") < col("q"))
      .groupBy(col("p"), col("q"))
      .agg(count(lit(1)).as("n_common"),
        max(col("dp")).as("dp"), max(col("dq")).as("dq"))
      .select(col("p"), col("q"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("dp") + col("dq") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("p"), col("q"))
      .limit(topN)
  }

  /** Shared scoring tail: exact Jaccard from common-neighbor counts +
    * UNcapped degrees, global top-`topN` via TakeOrderedAndProject. */
  private def scoreCommon(common: DataFrame, deg: DataFrame,
                          topN: Int): DataFrame =
    common
      .join(deg.select(col("node").as("p"), col("deg").as("dp"))
        .hint("shuffle_hash"), Seq("p"))
      .join(deg.select(col("node").as("q"), col("deg").as("dq"))
        .hint("shuffle_hash"), Seq("q"))
      .select(col("p"), col("q"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("dp") + col("dq") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("p"), col("q"))
      .limit(topN)

  /** MinHash-of-neighborhoods node similarity — the conf-gated
    * scale path behind [[nodeSimilarityUnd]] (the r6-verdict b25
    * lever). Semantics preserved exactly except candidate RECALL:
    * each node's CAPPED neighborhood (members with deg ≤
    * `maxCenterDeg`, i.e. the same centers the wedge join counts) is
    * MinHash-signed with `k` affine permutations and banded into
    * `bands` buckets; only band-colliding pairs are verified — and
    * the verify recomputes the EXACT common-center count and Jaccard
    * (capped intersection / uncapped degrees), so any returned pair
    * scores identically to the exact operator; only pairs whose
    * bands never collide can be missed (P(miss) = (1−J²)^bands at
    * r=2 rows/band — 1e-8 at J=0.5, measured 100% top-20 recall in
    * ApproxNodeSimSpec). See [[nodeSimilarityUnd]] and tools/NodeSimAB
    * for the measured verdict: at THIS graph's bounded-degree shape
    * the exact wedge join is ~3× faster, so this path is opt-in.
    *
    * Scale shape vs the wedge join: signatures build from a k-way
    * posexplode of the (node, member) edge list — k·|E| rows into a
    * map-side-combinable (node, kk) min agg, LINEAR in edges, no
    * per-node array materialization (a hub's neighborhood never
    * collects into one row); candidates come from a banded equi-join
    * (shuffle bounded by collisions); the verify touches candidate
    * pairs only. The wedge join's D·|E| intermediate disappears
    * entirely — the trade a 1000×-denser graph forces. */
  def nodeSimilarityApproxUnd(und0: DataFrame, maxCenterDeg: Int,
                              topN: Int, k: Int = 32,
                              bands: Int = 16): DataFrame = {
    require(k % bands == 0,
      s"k=$k must be a multiple of bands=$bands — a remainder would " +
        "leave a signature tail no band covers, silently degrading " +
        "recall below the documented (1-(1-J^r)^bands) bound")
    val P = 1000000007L // the TextOps MinHash modulus
    val rows = k / bands
    val und = und0 // pre-materialized by the *Und contract (see kCoreUnd)
    val deg = undDegrees(und).barrier(true)
    val adj = und.select(col("a").as("node"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("node"), col("a").as("nb")))
    val centers = deg.where(col("deg") <= maxCenterDeg).select(col("node"))
    val cadj = adj.join(centers.hint("shuffle_hash"), Seq("node"), "left_semi")
    // (node, m): m is a CAPPED member of node's neighborhood — the
    // reversed wedge-center adjacency, barriered once for the three
    // consumers (signature build + both verify sides)
    val memb = cadj.select(col("nb").as("node"), col("node").as("m"))
      .barrier(true)
    // member ids hash to Z_P (xxhash64 handles any id type — node
    // ids are strings here), then k affine permutations of the hash;
    // min per (node, kk) aggregates map-side, then the signature
    // reassembles ordered
    val sigs = memb
      .select(col("node"), pmod(xxhash64(col("m")), lit(P)).as("h"))
      .select(col("node"), posexplode(
        transform(sequence(lit(1), lit(k)), kk =>
          ((kk.cast("long") * 2L + 1L) * col("h")
            + lit(12345L) + kk.cast("long") * 7L) % lit(P)))
        .as(Seq("kk", "v")))
      .groupBy(col("node"), col("kk")).agg(min(col("v")).as("mv"))
      .groupBy(col("node"))
      .agg(transform(sort_array(collect_list(struct(col("kk"), col("mv")))),
        s => s.getField("mv")).as("sig"))
      .barrier(true)
    val banded = sigs.select(col("node"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows))))
        .as(Seq("band_idx", "band_val")))
    // each pair emits from its FIRST colliding band only (no earlier
    // band equal — the exists() probe is O(bands) per match), which
    // replaces the candidate distinct's full shuffle: neighborhoods
    // here are often IDENTICAL (leaf siblings of one center), and an
    // identical pair would otherwise surface from all `bands` bands
    val noEarlier = !exists(sequence(lit(0), col("x.band_idx") - 1),
      j => slice(col("x.sig"), j * rows + 1, lit(rows)) ===
        slice(col("y.sig"), j * rows + 1, lit(rows)))
    val cand = banded.alias("x")
      .join(banded.alias("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.node") < col("y.node") &&
          (col("x.band_idx") === 0 || noEarlier))
      .select(col("x.node").as("p"), col("y.node").as("q"))
    val common = cand
      .join(memb.select(col("node").as("p"), col("m")), Seq("p"))
      .join(memb.select(col("node").as("q"), col("m")), Seq("q", "m"))
      .groupBy(col("p"), col("q")).agg(count(lit(1)).as("n_common"))
    scoreCommon(common, deg, topN)
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007)
    * over an [[undirectedSimple]] view, made fully deterministic:
    * every node starts labeled with its own id; each round every node
    * adopts the most frequent label among its neighbours, ties to the
    * LEXICOGRAPHICALLY SMALLEST label; all nodes update together from
    * the previous round's labels (no asynchronous order dependence),
    * for a FIXED `rounds` (same contract as the b18 PageRank and b24
    * k-core fixed iterations — exact whether or not converged).
    * Per round: one equi-join of the symmetric adjacency to the
    * label frame (shuffle on node id), one (node, label) count agg,
    * one top-1-per-node (the row_number≤1 the optimizer rewrites to
    * the TopKPerKey bounded heap) — all linear in |E|, barriered so
    * round k+1's lineage starts at round k's output. Isolated nodes
    * never appear (no neighbours ⇒ no votes ⇒ not in the view).
    *
    * Two conf-gated scale shapes (both parity-pinned in GraphSpec,
    * both measured in tools/GraphIterAB — local loss / at-scale win,
    * the `spark.graft.cc.aggstars` convention):
    *
    *   - `spark.graft.graph.bucketedAdj=true` — the round-invariant
    *     adjacency is written ONCE to a table bucketed on the
    *     vote-join key and read per round, instead of living in
    *     executor block storage across the query. Locally this loses
    *     ~1.4 s (parquet re-reads vs warm single-JVM blocks,
    *     GraphIterAB r14/r15) but it is the shape a 100 TB graph
    *     forces: 2|E| adjacency rows cannot be pinned in cluster
    *     block storage per query, while a bucketed table keeps every
    *     round's join exchange-free for the big side and survives
    *     executor loss.
    *   - `spark.graft.lpa.fusedvote=true` — the round's two
    *     aggregates fuse into ONE [[graft.functions.expr.VoteTop1]]
    *     pass whose (label → count) tally partial-aggregates
    *     MAP-SIDE, so the per-round exchange carries one combined
    *     tally per (task, node) instead of |E| raw vote rows. Locally
    *     this measured a wash-to-loss (r15 GraphIterAB: fused 5.95 s
    *     vs shipped 5.82 median — round-1 labels are all-distinct, so
    *     nothing combines and the object-hash pass pays
    *     serialization); at scale the shuffle-volume math flips it:
    *     labels coalesce after round 1 and a hub's million votes
    *     combine into one map entry per task. */
  def labelPropagationUnd(und: DataFrame, rounds: Int): DataFrame = {
    val spark = und.sparkSession
    val bucketedAdj = spark.conf
      .getOption("spark.graft.graph.bucketedAdj").contains("true")
    val fusedVote = spark.conf
      .getOption("spark.graft.lpa.fusedvote").contains("true")
    // r7 shape (the r6-verdict lever, settled by the interleaved A/B
    // in tools/LpaAB: scoped-minby-p16 5.6 s median vs the previous
    // window-rank shape 8.9 s in the same windows, sf0.1/local[32]):
    // 1. the per-round top-1 is ONE min_by hash aggregate over the
    //    (-cnt, label) struct — struct order encodes "most votes,
    //    ties to the smallest label" — instead of a row_number window
    //    (no per-round sort/rank pass over the label frame);
    // 2. label-frame stages run at HALF the session shuffle width
    //    (still cluster-proportional at scale; the |V|-sized frames
    //    don't fill default-width tasks, and fixed per-task cost
    //    multiplied under the driver's co-tenant window: 30 s vs 8 s
    //    quiet in r6);
    // 3. AQE is disabled while the loop's PLANS are built and the
    //    adjacency materializes (the eager barrier below runs inside
    //    the scope); since r14 the round barriers are LAZY — the
    //    consumer's single action materializes the cascaded rounds
    //    under the session's own AQE setting, which the GraphIterAB
    //    A/B measured FASTER than eager AQE-off per-round jobs
    //    (5.86 s median vs 7.47: the per-round job boundaries, not
    //    AQE, were the loop's overhead). Lineage still truncates at
    //    every round. (Queries on this session run sequentially; the
    //    toggle is scoped try/finally.)
    // r16: labelParts derives from the ADJACENCY SIZE (2|E| rows,
    // one cheap count of the input view) instead of half the session
    // width — the same size-derived parallelism as loopParts, so a
    // small graph stops paying 16 tasks per round for frames whose
    // per-task row counts are in the low thousands, while at cluster
    // scale the clamp returns the session width and nothing changes.
    val labelParts = loopParts(spark, 2L * und.count(),
      spark.sessionState.conf.numShufflePartitions,
      JoinLoopRowsPerTask)
    withAqeOff(spark) {
      val savedFb = spark.conf.get(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "128")
      if (fusedVote) spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 << 20).toString) // the tally maps are small; keep hashing
      try {
      val rawAdj = und.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
      val adjTbl = if (bucketedAdj)
        Some("graft_lpa_adj_" + java.util.UUID.randomUUID()
          .toString.replace("-", "").take(12))
      else None
      val adj =
        if (bucketedAdj) {
          // 100 TB shape: the round-invariant adjacency goes ONCE to
          // a table bucketed on the vote-join key; every round reads
          // it exchange-free from (distributed) storage instead of
          // pinning 2|E| rows in executor blocks for the query's
          // lifetime. PER-INVOCATION table name (r15-advice low): a
          // fixed name let two queries sharing a warehouse clobber
          // each other's adjacency; each invocation now writes its
          // own table and drops it after the final eager barrier
          // detaches the result. Orphaned-location guard kept (a
          // leftover warehouse dir without a catalog entry fails
          // saveAsTable otherwise).
          val tbl = adjTbl.get
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), tbl)
          val fs = loc.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
          rawAdj.write.mode("overwrite").bucketBy(labelParts, "nbr")
            .saveAsTable(tbl)
          spark.table(tbl)
        } else
          // block-storage shape: pre-partition the (big,
          // round-invariant) adjacency by the join key BEFORE the
          // barrier — localCheckpoint preserves the output
          // partitioning through LogicalRDD, so every round's vote
          // join exchanges only the small label frame
          // r17: LAZY — the rounds are already lazy (r14), so the
          // eager flavor's separate adjacency job only added a job
          // boundary; the consumer's one action materializes the
          // adjacency blocks first and every round reads them.
          rawAdj.repartition(labelParts, col("nbr")).barrier(false)
      var lab = adj.select(col("node")).distinct()
        .withColumn("label", col("node"))
      for (r <- 1 to rounds) {
        if (r == 1) {
          // ROUND-1 CLOSED FORM: at round 0 label(x) = x, and the
          // undirectedSimple adjacency has no loops or parallel
          // edges, so node n's votes are exactly its (distinct)
          // neighbor ids — every count is 1 and "most frequent, ties
          // to the smallest label" degenerates to min(nbr). One
          // map-side-combinable agg replaces the round's label join,
          // |E|-row re-exchange and two-aggregate vote fold (r15
          // same-session isolated 5-pass A/B at sf0.1: b28
          // 6.61→3.82 s median / 5.12→3.22 min; bit-identical by the
          // argument above and by the 3-SF oracle re-gate).
          lab = adj.groupBy(col("node"))
            .agg(min(col("nbr")).as("label"))
            .barrier(bucketedAdj)
        } else {
        // one exchange per round: hashpartitioning(node) satisfies
        // the (node, label) vote count's clustered distribution
        // (subset key) AND the per-node min_by's, so both aggregates
        // run exchange-free on the repartitioned join output.
        // LAZY round barriers (r14 GraphIterAB, interleaved 4-rep A/B
        // at sf0.1: lazy 5.86 s median, tight [5.40-6.09], vs eager
        // 7.47 median with 4.95-8.26 spread, bit-identical labels):
        // the consumer's single action materializes each round's
        // blocks in one cascaded job — per-round job boundaries only
        // added scheduling overhead. Lineage still truncates at every
        // round, so the plan never deepens past one round. In
        // bucketedAdj mode the rounds are EAGER instead, so the
        // returned frame never references the overwritable table.
        val votes = adj
          .join(lab.select(col("node").as("nbr"), col("label")), "nbr")
        lab = (if (fusedVote)
          // map-side-combinable tally: partial VoteTop1 runs BEFORE
          // the exchange, which then carries combined tallies
          votes.groupBy(col("node"))
            .agg(graft.functions.expr.GraphAggs
              .voteTop1(col("label")).as("label"))
        else votes
          .repartition(labelParts, col("node"))
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("node"))
          .agg(min_by(col("label"),
            struct((-col("cnt")).as("nc"), col("label"))).as("label")))
          .barrier(bucketedAdj)
        }
      }
      // in bucketedAdj mode the last round's EAGER barrier already
      // materialized lab — the result is table-independent, so the
      // per-invocation adjacency table can drop NOW instead of
      // lingering in the shared warehouse. rounds == 0 is the one
      // case with no round barrier (r15-advice low): detach the
      // initial lab frame eagerly before the drop.
      if (bucketedAdj) {
        if (rounds == 0) lab = lab.barrier(true)
        adjTbl.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      }
      lab
      } finally spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        savedFb)
    }
  }
}
