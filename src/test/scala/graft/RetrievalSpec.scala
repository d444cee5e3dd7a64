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

  test("hybridRrf: fused score recomputes from the reported per-leg " +
      "ranks; per-leg ranks agree with the legs; absent legs read 0") {
    import graft.model.Tables
    val docs = Tables.documents(spark, sf)
    val isQ = pmod($"doc_id", lit(101)) === 0
    val out = Retrieval.hybridRrf(docs, "doc_id", "text", isQ, k = 5)
      .cache()
    // rrf_ppm is exactly the sum of the two reported contributions
    // (0-rank legs contribute nothing)
    val bad = out.where($"rrf_ppm" =!=
      (when($"bm25_rank" > 0, expr("1000000L div (60 + bm25_rank)"))
        .otherwise(0L) +
       when($"dense_rank" > 0, expr("1000000L div (60 + dense_rank)"))
        .otherwise(0L)))
    assert(bad.isEmpty)
    // every fused row came from at least one leg
    assert(out.where($"bm25_rank" === 0 && $"dense_rank" === 0).isEmpty)
    // reported bm25 ranks agree with the BM25 leg run standalone
    val bm = Retrieval.bm25TopK(docs, "doc_id", "text", isQ, 20)
      .select($"eval_id", $"doc_id", $"rank".as("leg_rank"))
    val mismatch = out.where($"bm25_rank" > 0)
      .join(bm, Seq("eval_id", "doc_id"))
      .where($"bm25_rank" =!= $"leg_rank")
    assert(mismatch.isEmpty)
    // k bound holds per eval doc
    val counts = out.groupBy($"eval_id").count()
    assert(counts.where($"count" > 5).isEmpty)
  }

  test("contaminationReport: verbatim twin, near-dup, and clean eval " +
      "docs get the right verdicts with consistent evidence") {
    val docs = Seq(
      // eval (id < 3)
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven eight"),
      (2L, "totally unrelated fresh content nothing shared"),
      // train
      (10L, "alpha beta gamma delta epsilon zeta"), // exact twin of 0
      (11L, "one two three four five six seven nine"), // near-dup of 1
      (12L, "filler text with plain words here"),
      (13L, "more filler about other things entirely"))
      .toDF("doc_id", "text")
    val out = Retrieval.contaminationReport(docs, "doc_id", "text",
        $"doc_id" < 3)
      .orderBy($"eval_id").collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("verbatim"),
        r.getAs[Long]("j_max_ppm"), r.getAs[Long]("j_arg"),
        r.getAs[String]("verdict"))).toSeq
    assert(out.map(t => (t._1, t._2, t._5)) === Seq(
      (0L, 1L, "verbatim"), (1L, 0L, "near_dup"), (2L, 0L, "clean")))
    // evidence: the near-dup arg is the planted neighbour, and its
    // jaccard is 5 shared of 6+6-5 distinct 3-shingles = 714285 ppm
    assert(out(1)._3 === 714285L && out(1)._4 === 11L)
    // the verbatim twin also maxes jaccard at 1e6 against doc 10
    assert(out(0)._3 === 1000000L && out(0)._4 === 10L)
  }

  test("bm25 impact index at rest equals an inline rebuild bit-for-bit " +
      "and bm25TopK over it equals the inline-path top-k") {
    import graft.model.Tables
    val docs = Tables.documents(spark, sf)
    val train = docs.where(pmod($"doc_id", lit(101)) =!= 0)
    val atRest = Retrieval.bm25ImpactsCached(spark, sf, "mod101ne0-df1m",
      train, "doc_id", "text")
    val inline = Retrieval.bm25Impacts(
      train.select($"doc_id",
          explode(graft.functions.TextOps.tokens($"text")).as("tok"))
        .where($"tok" =!= ""))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"tok", $"doc_id", $"contrib").collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(rows(atRest) === rows(inline), "impacts: artifact != rebuild")
    def topk(pre: Option[org.apache.spark.sql.DataFrame]) =
      Retrieval.bm25TopK(docs, "doc_id", "text",
          pmod($"doc_id", lit(101)) === 0, k = 5, contribPre = pre)
        .orderBy($"eval_id", $"rank").collect().toSeq
    assert(topk(Some(atRest)) === topk(None),
      "bm25TopK over the artifact != inline path")
  }

  test("postings index: append equals rebuild of corpus ∪ arrivals " +
      "with untouched buckets byte-identical; double-append is " +
      "idempotent; a first append bootstraps a missing path") {
    import graft.model.Tables
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arrivals = docs.where(pmod($"doc_id", lit(10)) >= 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings").toString
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"tok", $"tf")
        .as[(Long, String, Long)].collect().toSet
    def files(bk: Long) = {
      val p = java.nio.file.Paths.get(dir, "postings", s"bk=$bk")
      if (!java.nio.file.Files.exists(p)) Set.empty[String]
      else {
        import scala.jdk.CollectionConverters._
        val l = java.nio.file.Files.list(p)
        try l.iterator().asScala.map(f =>
          s"${f.getFileName}:${java.nio.file.Files
            .getLastModifiedTime(f).toMillis}").toSet
        finally l.close()
      }
    }
    val B = Retrieval.PostingsBuckets.toLong
    Retrieval.writePostingsIndex(corpus, "doc_id", "text", dir)
    val before = (0L until B).map(b => b -> files(b)).toMap
    Retrieval.appendToPostingsIndexDir(spark, dir, arrivals,
      "doc_id", "text")
    assert(pset(Retrieval.readPostingsIndex(spark, dir)) ===
      pset(Retrieval.postings(docs, "doc_id", "text")),
      "append != rebuild of corpus ∪ arrivals")
    (0L until B).foreach { b =>
      assert(before(b).subsetOf(files(b)),
        s"append rewrote pre-existing files in bucket $b")
    }
    // double append: the doc-granular idempotency probe
    Retrieval.appendToPostingsIndexDir(spark, dir, arrivals,
      "doc_id", "text")
    val twice = Retrieval.readPostingsIndex(spark, dir)
    assert(twice.count() ===
      twice.select($"doc_id", $"tok").distinct().count(),
      "double append duplicated postings")
    // bootstrap: a first append into a missing path creates the index
    val fresh = java.nio.file.Files
      .createTempDirectory("graft-postings-boot").toString + "/new"
    Retrieval.appendToPostingsIndexDir(spark, fresh, corpus,
      "doc_id", "text")
    assert(pset(Retrieval.readPostingsIndex(spark, fresh)) ===
      pset(Retrieval.postings(corpus, "doc_id", "text")),
      "bootstrap append != build")
    // present-but-foreign path (r15-advice medium): a parquet table
    // without doc_id/bk at the path must FAIL the append, not
    // silently skip the idempotence probe and insert duplicates
    val foreign = java.nio.file.Files
      .createTempDirectory("graft-postings-foreign").toString
    spark.range(3).toDF("zzz").write.parquet(foreign + "/postings")
    intercept[org.apache.spark.sql.AnalysisException] {
      Retrieval.appendToPostingsIndexDir(spark, foreign, arrivals,
        "doc_id", "text")
    }
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
