package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Bucketed co-located joins: persisting both sides bucketed by the
  * join key lets the join run with NO Exchange — the 100 TB answer to
  * repeated fact⋈fact joins on the same key. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of tables bucketed on the key plans without a shuffle") {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sf)
      .withColumn("c_custkey", $"c_custkey".cast("long"))
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not introduce Exchanges under it
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      val joinInputs = joinSection.split("\n")
        .takeWhile(l => !l.contains("HashAggregate") || l.contains("Join"))
      assert(plan.contains("SortMergeJoin"))
      assert(!joinInputs.exists(_.contains("Exchange hashpartitioning(o_custkey")),
        s"bucketed join must not shuffle the fact side:\n$plan")
      // and it still produces correct results
      val viaBuckets = j.orderBy($"c_mktsegment").collect().toSeq
      val direct = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf)
          .withColumn("c_custkey", $"c_custkey".cast("long")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment").collect().toSeq
      assert(viaBuckets === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
