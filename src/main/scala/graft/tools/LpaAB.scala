package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

/** Control harness for the b28 shape question (r6 verdict item 1):
  * times the old window-rank and the new min_by variants of
  * synchronous LPA back-to-back in ONE session, interleaved, so
  * co-tenant noise hits every arm equally — re-run it to isolate
  * co-tenancy whenever a driver-window b28 number looks inflated.
  * r7 measurements (sf0.1, local[32], AQE on like the driver):
  * scoped-minby-p16 5.56 s median / 5.32 min vs the previous
  * window/default shape 8.89 / 8.61 in the same windows; on the full
  * Bench path (adds orderBy + noop write + und rebuild) the adopted
  * shape reads 7.44 median / 7.19 min vs 8.20 / 7.08 committed r6.
  */
object LpaAB {
  def variant(und: DataFrame, rounds: Int, useMinBy: Boolean,
              parts: Option[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def repart(df: DataFrame, c: String): DataFrame =
      parts.map(p => df.repartition(p, col(c)))
        .getOrElse(df.repartition(col(c)))
    val adj = repart(
      und.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(und.select(col("b").as("node"), col("a").as("nbr"))),
      "nbr").barrier(true)
    var lab = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label"))
    for (r <- 1 to rounds) {
      val votes = repart(
        adj.join(lab.select(col("node").as("nbr"), col("label")), "nbr"),
        "node")
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
      lab =
        if (useMinBy)
          votes.groupBy(col("node"))
            .agg(min_by(col("label"),
              struct((-col("cnt")).as("nc"), col("label"))).as("label"))
        else
          votes.withColumn("rk", row_number().over(w))
            .where(col("rk") === 1).select(col("node"), col("label"))
      if (r < rounds) lab = lab.barrier(false)
    }
    lab
  }

  /** The candidate production shape: AQE disabled for the whole loop
    * (iterative tiny-stage plans pay AQE re-planning per stage), all
    * rounds materialized eagerly inside the scope, conf restored. */
  def scoped(und: DataFrame, rounds: Int, parts: Int): DataFrame = {
    val s = und.sparkSession
    val saved = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val adj = und.select(col("a").as("node"), col("b").as("nbr"))
        .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
        .repartition(parts, col("nbr"))
        .barrier(true)
      var lab = adj.select(col("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to rounds) {
        lab = adj
          .join(lab.select(col("node").as("nbr"), col("label")), "nbr")
          .repartition(parts, col("node"))
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("node"))
          .agg(min_by(col("label"),
            struct((-col("cnt")).as("nc"), col("label"))).as("label"))
          .barrier(true)
      }
      lab
    } finally s.conf.set("spark.sql.adaptive.enabled", saved)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .appName("lpa-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val und = graft.graph.MemoryGraph.undirectedView(s, dir)
    val arms = Seq(
      ("window/default", false, None, true),
      ("minby/p16", true, Some(16), true),
      ("minby/p16/noaqe", true, Some(16), false),
      ("minby/default/noaqe", true, None, false))
    // warmup
    variant(und, 3, useMinBy = true, None).count()
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (rep <- 1 to 3; (name, mb, p, aqe) <- arms) {
      s.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t0 = System.nanoTime()
      val n = variant(und, 3, mb, p).count()
      val dt = (System.nanoTime() - t0) / 1e9
      s.conf.set("spark.sql.adaptive.enabled", "true")
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-20s $dt%6.2f s rows=$n")
    }
    // the scoped candidate, timed end-to-end (build+eager rounds+read)
    for (rep <- 1 to 3; p <- Seq(16, 32)) {
      val name = s"scoped/p$p"
      val t0 = System.nanoTime()
      val n = scoped(und, 3, p).count()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times.getOrElse(name, Nil)
      println(f"AB rep=$rep $name%-20s $dt%6.2f s rows=$n")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-16s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
