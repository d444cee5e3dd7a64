package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: per-phase timing of the b18 PageRank at sf0.1. */
object DebugPR {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[pr] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val g = t("persisted")(graft.graph.MemoryGraph.persisted(spark, sfDir))
    val edges = g.edges.select(col("src"), col("dst"))
    def full(): Unit = graft.graph.GraphAlgo.pageRank(edges, iters = 3)
      .select(col("id"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("id")).limit(20)
      .write.format("noop").mode("overwrite").save()
    t("pageRank run 1")(full())
    t("pageRank run 2")(full())
    t("pageRank run 3")(full())
    // lazy variant: no per-iteration checkpoint, exchange reuse
    def lazyRun(): Unit = {
      import org.apache.spark.sql.expressions.Window
      val weighted0 = edges
        .withColumn("od", count(lit(1)).over(Window.partitionBy(col("src"))))
        .localCheckpoint(true)
      val nodes0 = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      var r = nodes0.select(col("node").as("id"), lit(1000000000000L).as("r"))
      for (_ <- 1 to 3)
        r = graft.graph.GraphAlgo
          .pageRankStep(weighted0, nodes0, r, 85, 150000000000L)
      val out = r.select(col("id"),
          round(col("r").cast("double") / 1e12, 6).as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(20)
      out.write.format("noop").mode("overwrite").save()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/pr_lazy_plan.txt"),
        out.queryExecution.executedPlan.toString)
    }
    t("lazy run 1")(lazyRun())
    t("lazy run 2")(lazyRun())
    // iteration-step plan for inspection
    import org.apache.spark.sql.expressions.Window
    val weighted = edges
      .withColumn("od", count(lit(1)).over(Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val rank = nodes.select(col("node").as("id"), lit(1000000000000L).as("r"))
      .localCheckpoint(true)
    val step = graft.graph.GraphAlgo
      .pageRankStep(weighted, nodes, rank, 85, 150000000000L)
    step.write.format("noop").mode("overwrite").save()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/pr_plan.txt"),
      step.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
