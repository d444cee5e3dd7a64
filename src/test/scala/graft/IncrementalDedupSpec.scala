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

  test("verified-pairs artifact equals an inline rebuild bit-for-bit " +
      "and leakFreeSplit over it equals the inline path") {
    val docs = Tables.documents(spark, sf)
    val atRest = Dedup.verifiedPairsCached(spark, sf, "all-tau05",
      docs, "doc_id", "text", 0.5)
    val inline = Dedup.verifiedPairs(docs, "doc_id", "text", 0.5)
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a".cast("long"), $"id_b".cast("long"))
        .as[(Long, Long)].collect().toSet
    assert(pset(atRest) === pset(inline), "pairs: artifact != rebuild")
    def split(pre: Option[org.apache.spark.sql.DataFrame]) =
      graft.operators.Sampling
        .leakFreeSplit(docs, "doc_id", "text", pairsPre = pre)
        .orderBy($"split").collect().toSeq
    assert(split(Some(atRest)) === split(None),
      "leakFreeSplit over the artifact != inline path")
  }

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

  test("snapshot diff handles TEXT DRIFT: a changed doc breaks and " +
      "forms pairs, persisting j_ppm comes from the new snapshot") {
    // same ids, different text between snapshots — the update mode
    // the membership-split case (above) never exercises
    def words(pfx: String) = (1 to 25).map(i => s"$pfx$i").mkString(" ")
    val t = words("alpha")
    val v1 = Seq((1L, t), (2L, t.replace("alpha7", "alpha6")),
      (3L, words("omega")), (5L, words("gamma")), (6L, words("gamma")))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, t), (2L, words("zeta")), // doc 2 fully rewritten
      (3L, words("omega")),
      (4L, t.replace("alpha9", "alpha8")),     // new near-dup of 1
      (5L, words("gamma")),
      (6L, words("gamma").replace("gamma3", "gamma2"))) // 6 drifts, still near
      .toDF("doc_id", "text")
    val i1 = Dedup.buildIndex(v1, "doc_id", "text", 48, 24)
    val i2 = Dedup.buildIndex(v2, "doc_id", "text", 48, 24)
    def pm(idx: Dedup.DedupIndex) =
      Dedup.indexPairs(idx, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p1 = pm(i1); val p2 = pm(i2)
    assert(p1.keySet === Set((1L, 2L), (5L, 6L)))
    assert(p2.keySet === Set((1L, 4L), (5L, 6L)))
    val diff = Dedup.snapshotDiff(i1, i2, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(diff === Map(
      (1L, 2L) -> ("resolved", p1((1L, 2L))),   // rewrite broke it
      (1L, 4L) -> ("new", p2((1L, 4L))),        // rewrite formed it
      (5L, 6L) -> ("persisting", p2((5L, 6L))))) // j from the NEW side
    // the persisting pair's similarity really changed, so the map
    // above pins coalesce(j_new, j_old) order, not just membership
    assert(p1((5L, 6L)) !== p2((5L, 6L)))
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
