package graft

import org.apache.spark.sql.SparkSession

/** Scratch: list queries whose physical plan contains a nested-loop
  * or cartesian operator at sf0.001. Not part of the contract. */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
          .filter(plan.contains)
        if (flags.nonEmpty) println(s"[plan] $name: ${flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[plan] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
