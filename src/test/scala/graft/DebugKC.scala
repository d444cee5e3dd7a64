package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

/** Scratch: phase lap timing of b24 k-core at sf0.1. */
object DebugKC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      System.err.println(f"[kc] $tag ${(now - t) / 1e9}%.2f s")
      t = now
    }
    graft.graph.MemoryGraph.persisted(spark, sfDir)
    lap("persisted bring-up")
    for (rep <- 1 to 3) {
      t = System.nanoTime()
      val und0 = graft.graph.MemoryGraph.undirectedView(spark, sfDir)
      lap(s"rep$rep undirectedView handle")
      val und = und0.barrier(true)
      lap(s"rep$rep und barrier (${und.rdd.getNumPartitions} parts)")
      println(s"[kc] und count ${und.count()}")
      lap(s"rep$rep und count")
      val deg = und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")).barrier(true)
      lap(s"rep$rep deg agg (${deg.rdd.getNumPartitions} parts)")
      println(s"[kc] frontier ${deg.where(col("deg") < 3 && col("deg") >= 1).count()} of ${deg.count()}")
      lap(s"rep$rep frontier count")
      val out = graft.graph.GraphAlgo.kCoreUnd(und0, k = 3, rounds = 4)
      out.write.format("noop").mode("overwrite").save()
      lap(s"rep$rep full kCoreUnd")
      graft.util.Barriers.sweepTransient(spark.sparkContext)
    }
    spark.stop()
  }
}
