package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** The `spark.graft.checkpoint.reliable` flag swaps every iterative
  * algorithm's materialization barrier from executor-local blocks
  * (fast, no fault tolerance — right for local[N]) to a reliable
  * checkpoint (survives executor loss — required at cluster scale,
  * where a lost executor plus truncated lineage would otherwise kill
  * the job mid-iteration). The flag must change WHERE blocks live and
  * nothing else: these tests pin bit-identical results across modes
  * for each family of barrier users.
  */
class BarrierSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](f: => A): A = {
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir",
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    try f
    finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("reliable barriers leave connected components bit-identical") {
    def run() = graft.graph.GraphAlgo
      .connectedComponents(
        Tables.events(spark, sf).select(
          ($"event_id" % 50).as("src"), ($"event_id" % 97).as("dst")))
      .orderBy($"node").collect().toSeq
    val local = run()
    val reliable = withReliable(run())
    assert(local === reliable)
  }

  test("reliable barriers leave pageRank bit-identical") {
    def run() = graft.graph.GraphAlgo
      .pageRank(Tables.events(spark, sf).select(
        ($"event_id" % 50).as("src"), ($"event_id" % 97).as("dst")),
        iters = 3)
      .orderBy($"id").collect().toSeq
    val local = run()
    val reliable = withReliable(run())
    assert(local === reliable)
  }

  test("reliable barriers leave deduplicate and kmeans bit-identical") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    def dedup() = graft.operators.Dedup
      .deduplicate(docs, "doc_id", "text", 0.5)
      .orderBy($"doc_id").collect().toSeq
    def kmeans() = graft.operators.Ann
      .kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 1)
      .select($"vec_id", $"embedding".cast("string"))
      .orderBy($"vec_id").collect().toSeq
    val (d1, k1) = (dedup(), kmeans())
    val (d2, k2) = withReliable((dedup(), kmeans()))
    assert(d1 === d2)
    assert(k1 === k2)
  }
}
