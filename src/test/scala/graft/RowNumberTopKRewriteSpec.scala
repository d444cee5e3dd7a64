package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables

/** The optimizer rule must turn row_number()<=k window filters into
  * the bounded-heap operator — same rows, same ranks, no window sort. */
class RowNumberTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= k)
  }

  test("row_number window filter plans as TopKPerKey, not a window sort") {
    val plan = windowTopK(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      s"window exec should be gone:\n$plan")
  }

  test("rewritten plan returns the same rows as the logical window") {
    // compare against the un-rewritten result: compute expected with a
    // rank bound the rule refuses (k > MaxK) so the stock path runs
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val stock = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 20000) // rule bails: window path
      .where($"rk" <= 3)     // applied after, row-wise
      .select($"o_custkey", $"rk", $"o_orderkey")
    val rewritten = windowTopK(3).select($"o_custkey", $"rk", $"o_orderkey")
    assert(rewritten.exceptAll(stock).isEmpty && stock.exceptAll(rewritten).isEmpty)
  }

  test("rank equality filter rk=1 also rewrites (argmax per key)") {
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    val first = Tables.events(spark, sf)
      .withColumn("rk", row_number().over(w))
      .where($"rk" === 1)
    assert(first.queryExecution.executedPlan.toString.contains("TopKPerKey ["))
    val combos = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().count()
    assert(first.count() === combos)
  }
}
