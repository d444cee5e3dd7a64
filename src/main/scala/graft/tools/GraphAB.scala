package graft.tools

import org.apache.spark.sql.SparkSession

/** Control harness for the iterative-graph-tier AQE question (r7):
  * times registered queries with AQE on vs off, interleaved in ONE
  * session. The b28 rewrite showed AQE's per-stage re-planning costs
  * whole seconds on iterative tiny-stage plans; this measures which
  * other graph queries clear the bar for the scoped-AQE-off
  * treatment. Usage: runMain graft.tools.GraphAB <sfDir> <q1,q2,...>
  */
object GraphAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.lift(1).getOrElse(
      "b14_connected_components,b18_pagerank,b24_kcore")
      .split(",").toSeq
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .appName("graph-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try graft.graph.MemoryGraph.persisted(s, dir)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[GraphAB] graph warmup failed: $e")
    }
    def run(key: String, aqe: Boolean): Double = {
      s.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(s, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      s.conf.set("spark.sql.adaptive.enabled", "true")
      dt
    }
    keys.foreach(k => run(k, aqe = true)) // warmup
    val times = scala.collection.mutable.Map[String, List[Double]]()
    // Arm order ALTERNATES per rep: whichever arm runs second rides
    // the page cache the first arm just warmed on the same scans, so
    // a fixed order systematically flatters the second arm (~2 s on
    // the graph tier — the r8 "arm gap" was exactly this bias).
    for (rep <- 1 to 4; k <- keys;
         aqe <- if (rep % 2 == 1) Seq(true, false) else Seq(false, true)) {
      val name = s"$k/${if (aqe) "aqe" else "noaqe"}"
      val dt = run(k, aqe)
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-40s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-40s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
