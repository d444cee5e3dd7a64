package graft

import graft.operators.RangeJoin

/** RangeJoin.intervalJoin semantics: half-open boundaries, an
  * interval spanning several buckets matches a point exactly once,
  * key isolation, and the plan stays an equi-join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    // key, interval id, [lo, hi)
    (1L, 100L, 10L, 20L),   // width-10 interval
    (1L, 101L, 15L, 45L),   // spans 4 buckets at width 10
    (2L, 200L, 10L, 20L)    // other key
  ).toDF("k", "iid", "lo", "hi")

  private def run(points: Seq[(Long, Long, Long)]) =
    RangeJoin.intervalJoin(
        points.toDF("pid", "k", "t"), "k", "t",
        intervals, "k", "lo", "hi", widthUs = 10L)
      .select($"pid", $"iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("half-open boundaries: lo inclusive, hi exclusive") {
    assert(run(Seq((1L, 1L, 10L))) === Seq((1L, 100L)))       // t = lo
    assert(run(Seq((2L, 1L, 19L))) === Seq((2L, 100L), (2L, 101L)))
    assert(run(Seq((3L, 1L, 20L))) === Seq((3L, 101L)))       // t = hi
  }

  test("an interval spanning several buckets matches once per point") {
    // t=44 is in 101's last covered bucket; exactly one output row
    assert(run(Seq((4L, 1L, 44L))) === Seq((4L, 101L)))
    assert(run(Seq((5L, 1L, 45L))) === Seq())                 // t = hi
  }

  test("keys are isolated") {
    assert(run(Seq((6L, 2L, 12L))) === Seq((6L, 200L)))
  }

  test("plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.intervalJoin(
        Seq((1L, 1L, 10L)).toDF("pid", "k", "t"), "k", "t",
        intervals, "k", "lo", "hi", widthUs = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
