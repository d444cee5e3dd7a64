package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: row counts that size the iterative graph loops. */
object CountsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val g = graft.graph.MemoryGraph.persisted(spark, sf)
    println(s"EDGES=${g.edges.count()}")
    println(s"NODES=${g.nodes.count()}")
    val und = graft.graph.GraphAlgo.undirectedSimple(
      g.edges.select(col("src"), col("dst")))
    println(s"UND=${und.count()}")
    spark.stop()
  }
}
