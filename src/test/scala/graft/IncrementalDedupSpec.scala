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

  test("snapshot diff classifies pairs by exact set algebra on the " +
      "two snapshots' relation sets") {
    val docs = Tables.documents(spark, sf)
    val v1 = docs.where(pmod($"doc_id", lit(10)) < 8)
    val v2 = docs.where(pmod($"doc_id", lit(10)) >= 2)
    val diff = Dedup.snapshotDiff(
        Dedup.buildIndex(v1, "doc_id", "text", k = 48, bands = 24),
        Dedup.buildIndex(v2, "doc_id", "text", k = 48, bands = 24),
        tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap

    // from-scratch expectation: each snapshot's exact all-pairs
    // relation set, then plain set algebra
    def pairSet(v: org.apache.spark.sql.DataFrame) =
      Dedup.ngramJaccardPairs(v, "doc_id", "text", tau)
        .select($"id_a", $"id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairSet(v1); val p2 = pairSet(v2)
    assert(diff.keySet === (p1 union p2))
    p1.union(p2).foreach { k =>
      val want =
        if (p1(k) && p2(k)) "persisting" else if (p2(k)) "new"
        else "resolved"
      assert(diff(k)._1 === want, s"pair $k")
    }
    // all three statuses occur on this corpus (docs 0-1 leave, 8-9
    // arrive, 2-7 persist), and j_ppm clears the tau floor
    assert(Set("new", "persisting", "resolved")
      .subsetOf(diff.values.map(_._1).toSet))
    assert(diff.values.forall(_._2 >= 500000L))
  }

  test("indexPairs equals the from-scratch verified pair set") {
    val docs = Tables.documents(spark, sf)
    val v = docs.where(pmod($"doc_id", lit(10)) < 8)
    val got = Dedup.indexPairs(
        Dedup.buildIndex(v, "doc_id", "text", k = 48, bands = 24), tau)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.ngramJaccardPairs(v, "doc_id", "text", tau)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want && got.nonEmpty)
  }
}
