package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.Dedup

/** Incremental (batch-vs-indexed-corpus) dedup: parity with the
  * from-scratch exact decision, and independence from the corpus
  * source (decisions come from the persisted index alone).
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.5

  test("incremental decisions equal from-scratch exact dedup on the batch") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val batch = docs.where(pmod($"doc_id", lit(10)) >= 8)
    val idx = Dedup.buildIndex(corpus, "doc_id", "text", k = 48, bands = 24)
    val got = Dedup.incrementalDedup(idx, batch, "doc_id", "text", tau)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // exact expectation from the all-pairs Jaccard join
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", tau)
      .select($"id_a", $"id_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))) // both directions
    val batchIds = batch.select($"doc_id").as[Long].collect().sorted
    val expected = batchIds.map { b =>
      val blockers = pairs.collect {
        case (a, `b`) if a % 10 < 8 || a < b => a
      }
      if (blockers.isEmpty) (b, 1L, -1L)
      else (b, 0L, blockers.min)
    }
    assert(got.toSeq === expected.toSeq)
    assert(got.exists(_._2 == 0L), "corpus should block some batch docs")
  }

  test("decisions come from the persisted index, not the corpus source") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val batch = docs.where(pmod($"doc_id", lit(10)) >= 8)
    val dir = java.nio.file.Files.createTempDirectory("dedup-idx").toString
    Dedup.writeIndex(corpus, "doc_id", "text", k = 48, bands = 24, dir)
    val fromLive = Dedup.incrementalDedup(
        Dedup.buildIndex(corpus, "doc_id", "text", 48, 24),
        batch, "doc_id", "text", tau)
      .orderBy($"doc_id").collect().toSeq
    // read-back path: only the parquet index is consulted
    val fromDisk = Dedup.incrementalDedup(Dedup.readIndex(spark, dir),
        batch, "doc_id", "text", tau)
      .orderBy($"doc_id").collect().toSeq
    assert(fromDisk === fromLive)
  }
}
