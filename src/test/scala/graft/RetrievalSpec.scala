package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bitLen is floor(log2)+1 on the long range") {
    val got = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, (1L << 39))
      .toDF("x").select(Retrieval.bitLen($"x").as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 2L, 3L, 3L, 4L, 10L, 11L, 40L))
  }

  test("bm25TopK: rare-term match outranks common-term match") {
    // q shares "zebra" (df=1) with d1 and "the" (df=3) with d2/d3;
    // the rarer term must dominate the ranking
    val docs = Seq(
      (0L, "zebra the query"),       // query (id 0 → isQuery)
      (1L, "zebra runs wild"),
      (2L, "the cat sat"),
      (3L, "the dog ran")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        $"doc_id" === 0, k = 3)
      .orderBy($"rank").collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("doc_id") === 1L,
      "the zebra doc must rank first")
    // scores strictly ordered by construction of the tie-break
    val scores = out.map(_.getAs[Long]("score")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("bm25TopK: df cap drops stopwords from the posting join") {
    val docs = Seq(
      (0L, "the zebra"),
      (1L, "the zebra"),
      (2L, "the cat"),
      (3L, "the dog")
    ).toDF("doc_id", "text")
    // cap at 500000 ppm: "the" (df=3/3) is dropped, "zebra" (df=1/3)
    // survives → only d1 is reachable from the query
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        $"doc_id" === 0, k = 3, maxDfPpm = 500000L)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
  }
}
