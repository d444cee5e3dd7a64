package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.plans.TopKPerKey

/** The custom bounded-heap top-k operator must match the window
  * phrasing exactly (same rows, same ranks). */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("TopKPerKey equals row_number window for per-customer top orders") {
    val o = Tables.orders(spark, sf)
    val viaPlan = TopKPerKey(o, Seq($"o_custkey"),
        Seq($"o_totalprice".desc, $"o_orderkey"), 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
    assert(viaPlan.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaPlan).isEmpty)
  }

  test("physical plan contains the custom exec with one hash shuffle") {
    val o = Tables.orders(spark, sf)
    val plan = TopKPerKey(o, Seq($"o_custkey"), Seq($"o_totalprice".desc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["))
    assert(plan.contains("hashpartitioning(o_custkey"))
  }

  test("keys with fewer than k rows keep all rows, ranks dense") {
    val df = Seq((1, 10.0), (1, 5.0), (2, 7.0)).toDF("key", "v")
    val r = TopKPerKey(df, Seq($"key"), Seq($"v".desc), 5)
      .orderBy($"key", $"rank").collect()
    assert(r.map(x => (x.getInt(0), x.getInt(2), x.getDouble(1))).toSeq ===
      Seq((1, 1, 10.0), (1, 2, 5.0), (2, 1, 7.0)))
  }

  test("self-join of TopKPerKey output analyzes without a lineage break") {
    val o = Tables.orders(spark, sf)
    val top = TopKPerKey(o, Seq($"o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey"), 2)
    // DeduplicateTopKRanks regenerates the right side's rank exprId
    val j = top.alias("a").join(top.alias("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("a.rank") < col("b.rank"))
    // each customer with 2 kept orders contributes exactly the
    // (rank1, rank2) pair; customers with 1 kept order contribute none
    val twoKept = top.groupBy($"o_custkey").count().where($"count" === 2).count()
    assert(j.count() === twoKept)
  }
}
