package graft.tools

import org.apache.spark.sql.SparkSession

/** Control harness for the b25 cost question (r6 verdict item 6):
  * times the exact wedge-join and the conf-gated
  * MinHash-of-neighborhoods node-similarity paths back-to-back in ONE
  * session, interleaved, so co-tenant noise hits both arms equally.
  * r7 measurements (sf0.1, local[32], AQE on like the driver):
  * exact 9.05 s median / 8.86 min vs approx 26.8 / 25.4 — the EXACT
  * wedge join wins ~3× at this graph size, which is why the conf
  * stays off by default. Why banding cannot help here: the graph's
  * top-similar structure is identical-neighborhood leaf siblings of
  * shared centers, and identical signatures COLLIDE BY DESIGN — the
  * candidate set equals the true near-dup pair set ≈ the capped
  * wedge volume (D·|E|-bounded), so the approx path pays the k·|E|
  * signature build for zero candidate reduction (first-colliding-band
  * emission already removed the 16× duplicate blowup: 45 → 27 s).
  * The approx path's regime is the opposite shape: LARGE, DIVERSE
  * neighborhoods where Σdeg² ≫ k·|E| and band collisions are rare.
  * Top-20 recall 1.0 with exact scores (ApproxNodeSimSpec).
  */
object NodeSimAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .appName("nodesim-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val und = graft.graph.MemoryGraph.undirectedView(s, dir)
    def run(approx: Boolean): Double = {
      val t0 = System.nanoTime()
      val df =
        if (approx) graft.graph.GraphAlgo
          .nodeSimilarityApproxUnd(und, maxCenterDeg = 256, topN = 20)
        else graft.graph.GraphAlgo
          .nodeSimilarityUnd(und, maxCenterDeg = 256, topN = 20)
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(approx = true) // warmup
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (rep <- 1 to 3; approx <- Seq(false, true)) {
      val name = if (approx) "approx" else "exact"
      val dt = run(approx)
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-7s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-7s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
