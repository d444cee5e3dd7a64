package graft

import org.apache.spark.sql.functions._

/** Hand-checked semantics for the event-analytics pair (a19/a20):
  * funnel step order is strict (presence alone never converts) and
  * cohort offsets count distinct active weeks, not events.
  */
class FunnelCohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): java.sql.Timestamp =
    new java.sql.Timestamp(
      (day.toLong * 86400L + sec) * 1000L)

  test("funnel: only strictly-ordered view->click->purchase converts") {
    // u1 full ordered funnel; u2 purchase BEFORE click (stops at
    // click); u3 click before any view (stops at view); u4 never views
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      (3L, "click", ts(1)), (3L, "view", ts(2)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "funnel")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("a19_funnel")(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("step"),
        r.getAs[String]("stage"), r.getAs[Long]("n_users"),
        r.getAs[Long]("conv_ppm")))
    // views: u1,u2,u3; clicks-after-view: u1 (t2>t1), u2 (click day3 >
    // view day1), u3 has no click after its view; purchases-after-
    // click: u1 only (u2's purchase precedes its click entry)
    assert(out.toSeq === Seq(
      (1L, "view", 3L, 1000000L),
      (2L, "click", 2L, 666666L),
      (3L, "purchase", 1L, 333333L)))
  }

  test("cohort: offsets are distinct active weeks vs first-seen week") {
    // u1 first week 0, active weeks 0 and 2 (two events in week 2
    // count once); u2 first week 1, active week 1 only
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "view", ts(15)), (1L, "click", ts(16)),
      (2L, "view", ts(8))
    ).toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "cohort")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry
      .queries("a20_retention_cohort")(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_cohort"), r.getAs[Long]("retained_ppm")))
    assert(out.toSeq === Seq(
      (0L, 0L, 1L, 1L, 1000000L),
      (0L, 2L, 1L, 1L, 1000000L),
      (1L, 0L, 1L, 1L, 1000000L)))
  }
}
