package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of selected queries
  * (default: a scan-pushdown, a broadcast join, and the star join) so
  * pushdown/broadcast/codegen can be eyeballed.
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("a2_filter_project", "a3_broadcast_join", "a4_star_join")
    // honor SPARK_GRAFT_CPUS (r17): the r16 plan dumps were captured
    // at the default 4, where loop partition sizing clamps to 4 and a
    // 32-core fan-out regression is invisible in the dump.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_EXEC=1: execute first, then print the FINAL
    // adaptive plan — shows runtime ReusedExchange / AQE join demotions
    // the static explain can't.
    val exec = sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        df.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
