package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

/** Round-level A/B for the iterative graph tier (r13 verdict #3):
  * re-measures, on the CURRENT Spark/AQE settings, the barrier and
  * checkpoint-cadence decisions the four bounded-round algorithms
  * ship with (last measured r10/r5), plus the persisted-bucketed-
  * adjacency alternative for the LPA vote join:
  *
  *   - cc:    shipped lazy 1-alternation/checkpoint  vs eager-1  vs
  *            lazy-2 (two alternations per checkpoint + convergence
  *            probe — half the probes, double the lineage)
  *   - pr:    shipped lazy 3-iteration chain (one final eager
  *            barrier) vs an eager barrier per iteration
  *   - kcore: shipped eager barrier + count per round vs the lazy
  *            barrier where the early-exit count is the action that
  *            materializes the round (the cc trick)
  *   - lpa:   shipped eager per-round barrier vs lazy chain vs the
  *            adjacency served from a PERSISTED BUCKETED table
  *            (bucketBy on the vote-join key; creation untimed, the
  *            session-storage-bring-up convention) instead of
  *            repartitioned executor blocks
  *
  * Variant loops are inlined here (LpaAB precedent — the tool owns
  * the measurement shapes; GraphAlgo owns the shipped ones) and each
  * arm's output is parity-checked against the shipped arm via an
  * order-independent xxhash64 fold before any timing is trusted.
  * Arm order alternates per rep (the GraphAB page-cache lesson).
  * Usage: runMain graft.tools.GraphIterAB <sfDir> [cc,pr,kcore,lpa]
  */
object GraphIterAB {

  private def withAqeOff[T](s: SparkSession)(f: => T): T = {
    val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // --- cc: window-shape large/small star with a cadence knob -------
  def ccVariant(edgesIn: DataFrame, eager: Boolean, altsPerCkpt: Int,
                maxIter: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = edgesIn.toDF("src", "dst").barrier(true)
    val nodes = dir.select(col("src").as("node"))
      .unionAll(dir.select(col("dst").as("node"))).distinct()
    var e = dir.where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct()
    def largeStar(E: DataFrame): DataFrame = {
      val bid = E.select(col("u").as("c"), col("v").as("n"))
        .unionAll(E.select(col("v").as("c"), col("u").as("n")))
      bid.withColumn("m",
          least(min(col("n")).over(Window.partitionBy(col("c"))), col("c")))
        .where(col("n") > col("c") && col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
    }
    def smallStar(E: DataFrame): DataFrame =
      E.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .where(col("n") =!= col("m"))
        .select(greatest(col("n"), col("m")).as("u"),
          least(col("n"), col("m")).as("v"))
        .distinct()
    var iter = 0
    var prev: (Long, BigDecimal) = (-1L, BigDecimal(-1))
    var done = false
    while (iter < maxIter && !done) {
      var next = e
      for (_ <- 1 to altsPerCkpt) next = smallStar(largeStar(next))
      next = next.barrier(eager)
      val row = next.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).first()
      val sig = (row.getLong(0),
        if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
      done = sig == prev
      prev = sig
      e = next
      iter += altsPerCkpt
    }
    nodes.join(e, col("node") === col("u"), "left")
      .select(col("node"), coalesce(col("v"), col("node")).as("component"))
  }

  // --- pr: eager-per-iteration alternative --------------------------
  def prVariant(edgesIn: DataFrame, iters: Int,
                eagerEach: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Scale = 1000000000000L
    val dPct = 85
    val base = Scale / 100 * 15
    val spark = edgesIn.sparkSession
    withAqeOff(spark) {
      val dir = edgesIn.toDF("src", "dst")
      val weighted = dir
        .withColumn("od", count(lit(1)).over(Window.partitionBy(col("src"))))
        .barrier(true)
      val nodes = dir.select(col("src").as("node"))
        .unionAll(dir.select(col("dst").as("node")))
        .distinct().barrier(true)
      var rank = nodes.select(col("node").as("id"), lit(Scale).as("r"))
      for (i <- 1 to iters) {
        rank = graft.graph.GraphAlgo
          .pageRankStep(weighted, nodes, rank, dPct, base)
        if (eagerEach && i < iters) rank = rank.barrier(true)
      }
      rank.barrier(true).select(col("id"),
        (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
    }
  }

  // --- kcore: lazy-barrier alternative -------------------------------
  def kcoreLazy(und0: DataFrame, k: Int, rounds: Int): DataFrame = {
    def undDegrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var und = und0.barrier(true)
    var prevCount = -1L
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val keep = undDegrees(und).where(col("deg") >= k).select(col("node"))
      // lazy: the early-exit count below is the action that
      // materializes the round's blocks — one job per round
      und = und
        .join(keep.select(col("node").as("a")).hint("shuffle_hash"),
          Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")).hint("shuffle_hash"),
          Seq("b"), "left_semi")
        .barrier(false)
      val c = und.count()
      done = c == prevCount
      prevCount = c
      r += 1
    }
    undDegrees(und)
  }

  // --- lpa: lazy / bucketed-adjacency / fused-vote alternatives ------
  // vote shapes: "twoAgg" = shipped-r14 (count per (node,label), then
  // min_by per node — both exchange-free after an explicit |E|-row
  // repartition on node); "fused" = same repartition, ONE
  // VoteTop1 pass; "fusedPre" = NO repartition — the vote tally
  // partial-aggregates map-side on the join output and the exchange
  // carries one combined tally row per (partition, node)
  def lpaVariant(und: DataFrame, rounds: Int, eager: Boolean,
                 bucketedTable: Option[String],
                 vote: String = "twoAgg"): DataFrame = {
    import graft.functions.expr.GraphAggs.voteTop1
    val spark = und.sparkSession
    val labelParts = math.max(8,
      spark.sessionState.conf.numShufflePartitions / 2)
    withAqeOff(spark) {
      val savedFb = spark.conf.get(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      if (vote != "twoAgg") spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 << 20).toString)
      try {
        val adj = bucketedTable.map(spark.table).getOrElse {
          und.select(col("a").as("node"), col("b").as("nbr"))
            .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
            .repartition(labelParts, col("nbr"))
            .barrier(true)
        }
        var lab = adj.select(col("node")).distinct()
          .withColumn("label", col("node"))
        for (_ <- 1 to rounds) {
          val votes = adj
            .join(lab.select(col("node").as("nbr"), col("label")), "nbr")
          lab = (vote match {
            case "twoAgg" => votes
              .repartition(labelParts, col("node"))
              .groupBy(col("node"), col("label"))
              .agg(count(lit(1)).as("cnt"))
              .groupBy(col("node"))
              .agg(min_by(col("label"),
                struct((-col("cnt")).as("nc"), col("label"))).as("label"))
            case "fused" => votes
              .repartition(labelParts, col("node"))
              .groupBy(col("node"))
              .agg(voteTop1(col("label")).as("label"))
            case "fusedPre" => votes
              .groupBy(col("node"))
              .agg(voteTop1(col("label")).as("label"))
          }).barrier(eager)
        }
        lab
      } finally spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        savedFb)
    }
  }

  private def setHash(df: DataFrame): (Long, BigDecimal) = {
    val cols: Seq[Column] = df.columns.toSeq.map(col)
    val row = df.agg(count(lit(1)),
      sum(xxhash64(cols: _*).cast("decimal(38,0)"))).first()
    (row.getLong(0),
      if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fams = args.lift(1).getOrElse("cc,pr,kcore,lpa").split(",").toSet
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .appName("graph-iter-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val g = graft.graph.MemoryGraph.persisted(s, dir)
    val inval = g.edges.where(col("etype") === "invalidates")
      .select(col("src"), col("dst")).barrier(true)
    val allE = g.edges.select(col("src"), col("dst")).barrier(true)
    val und = graft.graph.MemoryGraph.undirectedView(s, dir)

    // bucketed-adjacency artifact, created untimed (session storage
    // bring-up, like MemoryGraph.persisted in Bench)
    val labelParts = math.max(8,
      s.sessionState.conf.numShufflePartitions / 2)
    if (fams("lpa")) {
      und.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
        .write.mode("overwrite")
        .bucketBy(labelParts, "nbr")
        .saveAsTable("graft_ab_adj")
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cc/shipped-lazy1" ->
        (() => graft.graph.GraphAlgo.connectedComponents(inval, 20)),
      "cc/eager1" -> (() => ccVariant(inval, eager = true, altsPerCkpt = 1,
        maxIter = 20)),
      "cc/lazy2" -> (() => ccVariant(inval, eager = false, altsPerCkpt = 2,
        maxIter = 20)),
      "pr/shipped-lazy" ->
        (() => graft.graph.GraphAlgo.pageRank(allE, iters = 3)),
      "pr/eager-each" -> (() => prVariant(allE, 3, eagerEach = true)),
      "kcore/shipped-eager" ->
        (() => graft.graph.GraphAlgo.kCoreUnd(und, k = 3, rounds = 4)),
      "kcore/lazy" -> (() => kcoreLazy(und, k = 3, rounds = 4)),
      "lpa/shipped" ->
        (() => graft.graph.GraphAlgo.labelPropagationUnd(und, rounds = 3)),
      "lpa/twoagg-lazy" -> (() => lpaVariant(und, 3, eager = false, None)),
      "lpa/fused-lazy" -> (() => lpaVariant(und, 3, eager = false, None,
        vote = "fused")),
      "lpa/fusedpre-lazy" -> (() => lpaVariant(und, 3, eager = false,
        None, vote = "fusedPre")),
      "lpa/bucketed" -> (() => lpaVariant(und, 3, eager = true,
        Some("graft_ab_adj")))
    ).filter { case (n, _) => fams(n.takeWhile(_ != '/')) }

    // parity gate: every variant must reproduce its family's shipped
    // result exactly before any timing is reported
    val shippedHash = arms.filter(_._1.contains("/shipped"))
      .map { case (n, f) => n.takeWhile(_ != '/') -> setHash(f()) }.toMap
    arms.filterNot(_._1.contains("/shipped")).foreach { case (n, f) =>
      val fam = n.takeWhile(_ != '/')
      val h = setHash(f())
      require(h == shippedHash(fam),
        s"$n parity FAILED vs $fam shipped: $h != ${shippedHash(fam)}")
      println(s"parity OK $n")
    }

    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    val byFam = arms.groupBy(_._1.takeWhile(_ != '/')).toSeq.sortBy(_._1)
    // arg 3: rep count (default 4); arg 4 "shuffle": RANDOMIZED arm
    // order per rep (seeded — reproducible) instead of alternating.
    // The r14 kcore arms tied with PURE order effects (the second arm
    // always won); randomized order breaks that coupling.
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val shuffle = args.lift(3).contains("shuffle")
    val rnd = new scala.util.Random(20260816L)
    for (rep <- 1 to reps; (_, fam) <- byFam;
         (name, f) <- if (shuffle) rnd.shuffle(fam)
                      else if (rep % 2 == 1) fam else fam.reverse) {
      val dt = run(f)
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-28s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-28s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
