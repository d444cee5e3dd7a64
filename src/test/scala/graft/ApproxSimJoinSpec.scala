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

  test("approx mode returns a sound subset; recall reported") {
    val e = Tables.embeddings(spark, sf)
    val exact = Dedup.similarityJoin(e, "vec_id", "embedding", 0.40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.approx.simjoin", "true")
    try {
      val approx = Dedup.similarityJoin(e, "vec_id", "embedding", 0.40)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(approx.subsetOf(exact),
        "approximate mode must never fabricate pairs")
      val recall = approx.size.toDouble / exact.size
      info(f"LSH candidate recall at tau=0.40: $recall%.3f " +
        s"(${approx.size}/${exact.size} pairs)")
      assert(recall >= 0.5, "banding should catch at least half the pairs")
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
}
