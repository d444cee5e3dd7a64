package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-round timing of connectedComponents on the sf0.1
  * invalidates subgraph. Not part of the contract; delete freely. */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_RPT").foreach(v =>
      spark.conf.set("spark.graft.loop.rowsPerTask", v))
    val g = graft.graph.MemoryGraph.persisted(spark, sfDir)
    val edges = g.edges.where(col("etype") === "invalidates")
      .select(col("src"), col("dst"))
    println(s"edges: ${edges.count()}")
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[lap] $tag ${(now - t) / 1e9}%.2f s")
      t = now
    }
    lap("edge count")
    val cc = graft.graph.GraphAlgo.connectedComponentsDebug(edges)
    println(s"components rows: ${cc.count()}")
    lap("cc total")
    spark.stop()
  }
}
