package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the CC star-shape question (SURVEY §8l audit):
  * large/small-star per-center min as WindowExec vs
  * groupBy(min)+join-back (`spark.graft.cc.aggstars`). Same exchange
  * count; the agg shape combines map-side and is AQE-skew-splittable
  * — the winner on hub-degree graphs — while the window saves a join
  * operator on bounded-degree graphs. Arm order alternates per rep
  * (the page-cache lesson from GraphAB).
  * Usage: runMain graft.tools.CcAB <sfDir> [q1,q2,...]
  */
object CcAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = args.lift(1).getOrElse(
      "b14_connected_components,b29_component_sizes")
      .split(",").toSeq
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .appName("cc-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try graft.graph.MemoryGraph.persisted(s, dir)
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[CcAB] graph warmup failed: $e")
    }
    def run(key: String, agg: Boolean): Double = {
      s.conf.set("spark.graft.cc.aggstars", agg.toString)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(key)(s, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      s.conf.unset("spark.graft.cc.aggstars")
      dt
    }
    keys.foreach(k => run(k, agg = false)) // warmup
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (rep <- 1 to 4; k <- keys;
         agg <- if (rep % 2 == 1) Seq(false, true) else Seq(true, false)) {
      val name = s"$k/${if (agg) "aggstars" else "window"}"
      val dt = run(k, agg)
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-48s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1)) {
      // true median: average the two middle samples on even counts
      // (upper-middle alone biases high on skewed timings)
      val s = ts.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2)
                else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      println(f"AB SUMMARY $name%-48s median=$med%6.2f min=${ts.min}%6.2f")
    }
    s.stop()
  }
}
