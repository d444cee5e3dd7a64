package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Scratch: execute declared queries by name and print the FINAL
  * physical plan with live SQL metric values (rows, codegen
  * duration, shuffle bytes) — the no-UI substitute for the SQL tab.
  * Usage: runMain graft.DebugQ <sfDir> <query>... Not part of the
  * contract; delete freely. */
object DebugQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.graph.MemoryGraph.persisted(spark, sfDir)
    catch { case _: Throwable => () }
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    names.foreach { n =>
      var df: org.apache.spark.sql.DataFrame = null
      for (rep <- 1 to reps) {
        val t0 = System.nanoTime()
        df = SparkEntry.queries(n)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(f"[q] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
        graft.util.Barriers.sweepTransient(spark.sparkContext)
      }
      def fmt(v: Long): String =
        if (v >= 10000000L) s"${v / 1000000}M" else v.toString
      def walk(p: SparkPlan, d: Int): Unit = {
        val keep = Set("numOutputRows", "duration", "shuffleBytesWritten",
          "dataSize", "collectTime", "buildTime", "aggTime", "sortTime",
          "fetchWaitTime", "shuffleWriteTime", "numFiles", "spillSize")
        val m = p.metrics.collect {
          case (k, v) if keep(k) && v.value > 0 => s"$k=${fmt(v.value)}"
        }.mkString(" ")
        println("  " * d + p.nodeName + "  " + m)
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case r: ReusedExchangeExec => Seq.empty
          case _ => p.children
        }
        kids.foreach(walk(_, d + 1))
      }
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
