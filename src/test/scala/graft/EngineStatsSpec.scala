package graft

import graft.util.EngineStats

/** The mie_meta-analogue usage counters (SURVEY §1: the reference
  * bumps total queries/stores + last-activity per MCP call; graft's
  * server loop is the SparkSession, so the counters hang off its
  * QueryExecutionListener). */
class EngineStatsSpec extends SparkSpec {
  import spark.implicits._

  test("engineStats: actions bump n_queries, writes bump n_stores, " +
      "last-activity advances monotonically") {
    val c = EngineStats.install(spark)
    assert(EngineStats.install(spark) eq c, "install must be idempotent")
    // listener events are posted asynchronously; poll until the
    // expected predicate holds (bounded), then read the snapshot
    def snapWhen(pred: org.apache.spark.sql.Row => Boolean) = {
      var r = EngineStats.snapshot(spark).collect()(0)
      var tries = 0
      while (!pred(r) && tries < 100) {
        Thread.sleep(50); tries += 1
        r = EngineStats.snapshot(spark).collect()(0)
      }
      r
    }
    val before = EngineStats.snapshot(spark).collect()(0)
    val q0 = before.getAs[Long]("n_queries")
    val s0 = before.getAs[Long]("n_stores")

    Seq(1, 2, 3).toDF("x").agg(org.apache.spark.sql.functions.sum($"x"))
      .collect()
    val afterQuery = snapWhen(_.getAs[Long]("n_queries") > q0)
    assert(afterQuery.getAs[Long]("n_queries") > q0,
      "a collect() must count as a query")
    assert(afterQuery.getAs[Long]("last_activity_ms") > 0L)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-enginestats").toString
    try {
      Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
        .parquet(s"$dir/t")
      val afterWrite = snapWhen(_.getAs[Long]("n_stores") > s0)
      assert(afterWrite.getAs[Long]("n_stores") > s0,
        "a parquet write must count as a store")
      assert(afterWrite.getAs[Long]("last_activity_ms") >=
        afterQuery.getAs[Long]("last_activity_ms"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
