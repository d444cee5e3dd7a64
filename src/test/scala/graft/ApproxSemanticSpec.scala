package graft

import org.apache.spark.sql.functions._

/** `spark.graft.approx.semantic=true` switches MemoryGraph
  * semanticSearch from the exact full scan to the IVF probe over the
  * per-graph centroid index (the reference's indexed-search trade).
  * Pins: (a) the probe's recall@k against the exact path, (b) that
  * probed results carry EXACT similarities (IVF can only miss rows,
  * never mis-score them), (c) that the default mode is untouched.
  */
class ApproxSemanticSpec extends SparkSpec {

  private val types = Seq("decision", "entity", "fact")

  private def search() = graft.graph.MemoryGraph.persisted(spark, sf)
    .semanticSearch("correlated telemetry", types, perType = 5, k = 10)
    .select(col("ntype"), col("id"), col("sim"))
    .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq

  test("IVF probe recall@10 >= 0.6 with exact similarities") {
    val exact = search()
    spark.conf.set("spark.graft.approx.semantic", "true")
    val probed = try search()
    finally spark.conf.unset("spark.graft.approx.semantic")
    val exactIds = exact.map(_._1).toSet
    val recall = probed.count(p => exactIds.contains(p._1)).toDouble /
      exact.size
    info(f"IVF semantic recall@10 = $recall%.2f " +
      f"(${probed.size} probed rows vs ${exact.size} exact)")
    assert(recall >= 0.6, s"recall $recall below floor")
    // overlapping ids must carry the identical exact similarity
    val exactSim = exact.toMap
    probed.filter(p => exactIds.contains(p._1)).foreach { case (id, sim) =>
      assert(exactSim(id) === sim, s"probe mis-scored $id")
    }
  }

  test("default mode is exact and unaffected by the index machinery") {
    val a = search()
    val b = search()
    assert(a === b && a.nonEmpty)
  }
}
