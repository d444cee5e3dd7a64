package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** AsOf.joinPrior edge semantics on a crafted frame: inclusive
  * equal-timestamp match, right-side tie resolution to the highest
  * seq, NULL right columns when no prior row exists, and key
  * isolation (a neighbour key's rows never leak). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinPrior: inclusive boundary, tie-to-max-seq, null no-match") {
    val left = Seq(
      (1L, 10L, 100L), // after k=10's both rights
      (2L, 10L, 50L),  // exactly ON the tied rights at t=50
      (3L, 10L, 5L),   // before any right → NULL
      (4L, 20L, 60L)   // other key: sees only k=20's right
    ).toDF("eid", "k", "t")
    val right = Seq(
      (10L, 50L, 7L, "a"),  // tie at t=50 ...
      (10L, 50L, 9L, "b"),  // ... higher seq wins
      (10L, 40L, 8L, "c"),
      (20L, 60L, 1L, "d")
    ).toDF("rk", "rt", "rseq", "tag")
    val out = AsOf.joinPrior(left, "k", "t", "eid",
        right, "rk", "rt", "rseq")
      .orderBy($"eid")
      .select($"eid", $"rseq", $"tag")
      .collect()
    assert(out.length === 4)
    // eid 1: latest right at/before 100 is (50, 9, b)
    assert(out(0).getLong(1) === 9L && out(0).getString(2) === "b")
    // eid 2: t=50 matches inclusively; tie resolves to seq 9
    assert(out(1).getLong(1) === 9L && out(1).getString(2) === "b")
    // eid 3: no right at/before 5 → NULLs
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
    // eid 4: only k=20's right; k=10's rows never leak across keys
    assert(out(3).getLong(1) === 1L && out(3).getString(2) === "d")
  }

  test("joinPrior plan: single shuffle, no inequality join blow-up") {
    val left = Seq((1L, 10L, 100L)).toDF("eid", "k", "t")
    val right = Seq((10L, 50L, 7L, "a")).toDF("rk", "rt", "rseq", "tag")
    val plan = AsOf.joinPrior(left, "k", "t", "eid",
      right, "rk", "rt", "rseq").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must stay a union-merge, not a pair join:\n$plan")
  }
}
