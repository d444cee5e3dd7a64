package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Dedup

/** The conf-selected similarity-join strategies: exact by default,
  * LSH candidates + exact verify when opted in. The approximate mode
  * must be sound (a subset of the exact result with identical sims)
  * and its recall is measured, not assumed. */
class ApproxSimJoinSpec extends SparkSpec {
  import spark.implicits._

  test("multi-probe approx mode: sound subset, recall >= 0.8 at tau=0.40") {
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val exact = Dedup.similarityJoin(e, "vec_id", "embedding", 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.approx.simjoin", "true")
    try {
      val approx = Dedup.similarityJoin(e, "vec_id", "embedding", 0.40)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(approx.subsetOf(exact),
        "approximate mode must never fabricate pairs")
      val recall = approx.size.toDouble / exact.size
      // candidate-set growth vs the quadratic pair space: the price of
      // 1-bit probing is (bandBits+1)x probe rows; the candidate join
      // must still prune hard relative to n^2/2
      val cands = Dedup.similarityJoin(e, "vec_id", "embedding", -1.0)
        .count()
      val pruning = cands.toDouble / (n.toDouble * (n - 1) / 2)
      info(f"multi-probe LSH recall at tau=0.40: $recall%.3f " +
        s"(${approx.size}/${exact.size} pairs); " +
        f"candidates touch $pruning%.3f of the pair space")
      assert(recall >= 0.8,
        "1-bit multi-probe should catch >= 80% of tau=0.40 pairs")
      assert(pruning < 0.8, "probing must still prune the pair space")
    } finally spark.conf.unset("spark.graft.approx.simjoin")
  }

  test("default mode is the exact blocked join (conf untouched)") {
    val e = Tables.embeddings(spark, sf)
    val viaDispatch = Dedup.similarityJoin(e, "vec_id", "embedding", 0.40)
      .orderBy($"id_a", $"id_b").collect().toSeq
    val direct = Dedup.embeddingPairs(e, "vec_id", "embedding", 0.40)
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(viaDispatch === direct)
  }

  /** The naive all-pairs phrasing a USER would write — the optimizer
    * rule's rewrite target (ApproxSimJoinRewrite). */
  private def naivePairJoin() = {
    val e = Tables.embeddings(spark, sf)
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    a.join(b, $"id_a" < $"id_b")
      .withColumn("sim", graft.functions.VectorOps.cosine6($"va", $"vb"))
      .where($"sim" >= 0.40)
      .select($"id_a", $"id_b", $"sim")
  }

  test("opt-in rule rewrites the naive cosine self-join to the LSH candidate join") {
    // default OFF: the rule must not touch the plan — nested loop stays
    val offPlan = naivePairJoin().queryExecution.executedPlan.toString
    assert(offPlan.contains("BroadcastNestedLoopJoin")
        || offPlan.contains("CartesianProduct"),
      s"without the flag the naive phrasing keeps its pair scan:\n$offPlan")
    val exact = naivePairJoin()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.approx.simjoin", "true")
    try {
      val df = naivePairJoin()
      val onPlan = df.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin")
          && !onPlan.contains("CartesianProduct"),
        s"with the flag the pair scan must become a candidate equi-join:\n$onPlan")
      assert(onPlan.contains("__graft_lsh"),
        s"rewritten plan should carry the band-join columns:\n$onPlan")
      val approx = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(approx.subsetOf(exact),
        "the rewrite must never fabricate pairs")
      val recall = approx.size.toDouble / exact.size
      info(f"rewrite recall at tau=0.40: $recall%.3f " +
        s"(${approx.size}/${exact.size} pairs)")
      assert(recall >= 0.8,
        "1-bit multi-probe rewrite should catch >= 80% of tau=0.40 pairs")
    } finally spark.conf.unset("spark.graft.approx.simjoin")
  }
}
