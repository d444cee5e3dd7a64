package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

/** Scratch: stage-by-stage lap timing of b25 node similarity at
  * sf0.1 (which of und/deg/cadj/wedge-agg/top dominates the floor).
  * Not part of the contract; delete freely. */
object DebugB25 {
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
    spark.sparkContext.setLogLevel("ERROR")
    val maxCenterDeg = 256
    var t = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[b25] $tag ${(now - t) / 1e9}%.2f s")
      t = now
    }
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    for (rep <- 1 to reps) {
      t = System.nanoTime()
      val und0 = graft.graph.MemoryGraph.undirectedView(spark, sfDir)
      val und = und0.barrier(true)
      lap(s"rep$rep und barrier (${und.rdd.getNumPartitions} parts)")
      val deg = und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")).barrier(true)
      lap(s"rep$rep deg barrier (${deg.rdd.getNumPartitions} parts)")
      val adjD = und.select(col("a").as("node"), col("b").as("nb"))
        .unionAll(und.select(col("b").as("node"), col("a").as("nb")))
        .join(deg.select(col("node").as("nb"), col("deg").as("dnb"))
          .hint("shuffle_hash"), Seq("nb"))
      val centers = deg.where(col("deg") <= maxCenterDeg).select(col("node"))
      val cadj = adjD.join(centers.hint("shuffle_hash"), Seq("node"),
        "left_semi").barrier(true)
      println(s"[b25] cadj rows ${cadj.count()} parts ${cadj.rdd.getNumPartitions}")
      lap(s"rep$rep cadj barrier")
      val common = cadj.select(col("node"), col("nb").as("p"), col("dnb").as("dp"))
        .join(cadj.select(col("node"), col("nb").as("q"),
          col("dnb").as("dq")), Seq("node"))
        .where(col("p") < col("q"))
        .groupBy(col("p"), col("q"))
        .agg(count(lit(1)).as("n_common"),
          max(col("dp")).as("dp"), max(col("dq")).as("dq"))
      val out = common
        .select(col("p"), col("q"), col("n_common"),
          round(col("n_common").cast("double")
            / (col("dp") + col("dq") - col("n_common")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("p"), col("q"))
        .limit(20)
      out.write.format("noop").mode("overwrite").save()
      lap(s"rep$rep wedge+agg+top20")
      graft.util.Barriers.sweepTransient(spark.sparkContext)
    }
    spark.stop()
  }
}
