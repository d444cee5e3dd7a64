package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic distributed graph algorithms over (src, dst) edge frames —
  * type-agnostic in the node id (string node ids, long doc ids, ...).
  */
object GraphAlgo {

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
    val dir = edgesIn.toDF("src", "dst")
    val nodes = dir.select(col("src").as("node"))
      .unionAll(dir.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    // orient every edge large→small; drop loops and duplicates
    var e = dir.where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct().localCheckpoint(true)

    // Each phase is ONE shuffle (a window min over the center) plus
    // the distinct that bounds edge growth — no groupBy+join-back.
    import org.apache.spark.sql.expressions.Window

    // large-star: around each center c, link every LARGER neighbor to
    // the minimum of N(c) ∪ {c} (keeps orientation, halves path reach)
    def largeStar(E: DataFrame): DataFrame = {
      val bid = E.select(col("u").as("c"), col("v").as("n"))
        .unionAll(E.select(col("v").as("c"), col("u").as("n")))
      bid
        .withColumn("m",
          least(min(col("n")).over(Window.partitionBy(col("c"))), col("c")))
        .where(col("n") > col("c") && col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
      // no distinct here: small-star's window min is duplicate-
      // insensitive and its own distinct bounds the round's output —
      // saves one shuffle per round
    }
    // small-star: around each center u (over the oriented edges), link
    // every smaller neighbor and u itself to min(N(u) ∪ {u})
    def smallStar(E: DataFrame): DataFrame = {
      E
        .withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"),
          least(col("n"), col("m")).as("v"))
        .distinct()
    }

    var iter = 0
    var prev: (Long, BigDecimal) = (-1L, BigDecimal(-1))
    var done = false
    while (iter < maxIter && !done) {
      val t0 = System.nanoTime()
      // lazy checkpoint: the convergence agg below is the action that
      // materializes the blocks — one job per round, not two
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      // convergence = edge set is a fixed point: same count and same
      // order-independent hash — one agg over the just-materialized
      // blocks, no extra join
      val row = next.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).first()
      val sig = (row.getLong(0),
        if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
      if (debug) System.err.println(
        f"[cc] round $iter: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          f"edges=${sig._1}")
      done = sig == prev
      prev = sig
      e = next
      iter += 1
    }
    // fixed point is a star forest u→root; roots map to themselves
    nodes.join(e, col("node") === col("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  /** PageRank with a FIXED iteration count, fully deterministic and
    * oracle-reproducible: per-target contributions are summed as the
    * src-ordered SEQUENTIAL double fold (the SURVEY §4 contract —
    * same trick as the k-means means), so the distributed sum is
    * bit-identical to the single-threaded SQL replay. Unnormalized
    * form r' = (1-d) + d * Σ r_src/outdeg_src over in-edges.
    *
    * Plan shape per iteration: edges ⋈ ranks (shuffle on src) →
    * groupBy dst (shuffle on dst) → left join back to the node set —
    * the standard dataflow PageRank (Pregelix re-expressed as joins);
    * ranks materialize once per iteration. */
  def pageRank(edgesIn: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val dir = edgesIn.toDF("src", "dst").localCheckpoint(true)
    val nodes = dir.select(col("src").as("node"))
      .unionAll(dir.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    // out-degree is static: join it into the edge relation ONCE, so
    // each iteration pays a single join + groupBy instead of two joins
    val outdeg = dir.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val weighted = dir.join(outdeg, "src")
      .select(col("src"), col("dst"), col("od")).localCheckpoint(true)
    var rank = nodes.select(col("node").as("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = weighted
        .join(rank, weighted("src") === rank("id"))
        .select(col("dst"), col("src"), (col("rank") / col("od")).as("c"))
      val sums = contrib.groupBy(col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (a, e) => a + e.getField("c")).as("contrib"))
      rank = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node").as("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    rank
  }
}
