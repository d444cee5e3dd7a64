package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("exactClusters partitions all docs and keeps min id") {
    val cl = Dedup.exactClusters(docs, "doc_id", "text").cache()
    val total = cl.agg(sum($"cluster_size")).as[Long].head()
    assert(total === docs.count())
    assert(cl.where($"keeper" < 0).isEmpty)
  }

  test("dupWindowRate: shared window counted, short docs absent") {
    // w=2: doc1 windows {ab, bc}, doc2 {ab, bx} -> ab shared (nd=2)
    // -> both 1/2 = 500000 ppm; doc3's only window zz is unique -> 0;
    // doc4 has one token -> no windows -> absent
    val d = Seq((1L, "a b c"), (2L, "a b x"), (3L, "z z"), (4L, "q"))
      .toDF("doc_id", "text")
    val out = Dedup.dupWindowRate(d, "doc_id", "text", w = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_dup_windows"), r.getAs[Long]("dup_ppm"))).toSeq
    assert(out === Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L)))
  }

  test("nprobe recall curve is monotone per query (probe sets nest)") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val cent = Ann.kmeansFit(corpus, "vec_id", "embedding", k = 8,
      iters = 2)
    val exact = Ann.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", k = 5)
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val ivf = Ann.ivfTopK(corpus, queries, cent, "vec_id",
        "embedding", nprobe = np, k = 5)
      np -> exact.alias("e")
        .join(ivf.alias("i"),
          $"e.q_id" === $"i.q_id" && $"e.n_id" === $"i.n_id", "left")
        .groupBy($"e.q_id")
        .agg((sum(when($"i.n_id".isNotNull, 1).otherwise(0)) / 5.0)
          .as("r"))
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("r")).toMap
    }.toMap
    val qids = recalls(1).keySet
    for (q <- qids) {
      assert(recalls(1)(q) <= recalls(2)(q))
      assert(recalls(2)(q) <= recalls(4)(q))
      assert(recalls(4)(q) <= recalls(8)(q))
      // probing every centroid IS the exact scan
      assert(recalls(8)(q) === 1.0)
    }
  }

  test("PQ/ADC: codes bounded, rescore sims exact, output dense") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val cent = Ann.pqFit(corpus, "vec_id", "embedding",
      m = 8, subDim = 8, k = 16, iters = 2)
    // every (m, cid) codebook entry exists and sub-centroids have
    // the right width
    val cents = cent.collect()
    assert(cents.length == 8 * 16)
    assert(cents.forall(_.getAs[scala.collection.Seq[Float]]("cv").length == 8))
    val codes = Ann.pqCodes(corpus, "vec_id", "embedding", cent,
      m = 8, subDim = 8)
    assert(codes.where($"code" < 0 || $"code" > 15).isEmpty)
    assert(codes.groupBy($"vid").count().where($"count" =!= 8).isEmpty)
    val out = Ann.pqTopK(corpus, queries, cent, "vec_id", "embedding",
      m = 8, subDim = 8, k = 5).cache()
    // dense ranks per query, and the rescored sim is the EXACT
    // cosine (spot-check against a direct computation)
    assert(out.groupBy($"q_id").count().where($"count" =!= 5).isEmpty)
    val row = out.orderBy($"q_id", $"rank").first()
    val qv = queries.where($"vec_id" === row.getAs[Long]("q_id"))
      .select($"embedding").first().getAs[scala.collection.Seq[Float]](0)
    val nv = corpus.where($"vec_id" === row.getAs[Long]("n_id"))
      .select($"embedding").first().getAs[scala.collection.Seq[Float]](0)
    val dot = qv.zip(nv).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val exp = dot / (math.sqrt(qv.map(x => x.toDouble * x).sum) *
      math.sqrt(nv.map(x => x.toDouble * x).sum))
    assert(math.abs(row.getAs[Double]("sim") - exp) < 1e-5)
  }

  test("IVFPQ: dense ranks, exact rescored sims, recall at c61 level") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val out = Ann.ivfpqTopK(corpus, queries, "vec_id", "embedding",
      kCoarse = 8, m = 8, subDim = 8, kSub = 16, iters = 2,
      nprobe = 2, k = 5).cache()
    assert(out.groupBy($"q_id").count().where($"count" =!= 5).isEmpty)
    // rescored sims are exact cosines
    val bfAll = Ann.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", k = 1000)
    val joined = out.join(bfAll.select($"q_id", $"n_id",
      $"sim".as("bf_sim")), Seq("q_id", "n_id"))
    assert(joined.count() === out.count())
    assert(joined.where($"sim" =!= $"bf_sim").isEmpty)
  }

  test("ngram jaccard finds the planted near-duplicates symmetrically") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).cache()
    assert(pairs.count() > 0, "testdata plants >0 near-dup pairs")
    assert(pairs.where($"id_a" >= $"id_b").isEmpty, "pairs are id-ordered")
    assert(pairs.where($"jaccard" < 0.5 || $"jaccard" > 1.0).isEmpty)
  }

  test("minhash banding recovers every jaccard>=0.8 pair as a candidate") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b")
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text", 16, 4)
      .select("id_a", "id_b")
    assert(exact.exceptAll(cand).isEmpty,
      "high-jaccard pairs must collide in >=1 band")
  }

  test("simhash pairs are within the hamming bound") {
    val p = Dedup.simHashPairs(docs, "doc_id", "text", 3)
    assert(p.where($"hamming" > 3).isEmpty)
  }

  test("brute-force ANN ranks are dense and sims sorted per query") {
    val r = Ann.bruteForceTopK(emb.where($"vec_id" >= 5),
      emb.where($"vec_id" < 5), "vec_id", "embedding", 5).cache()
    assert(r.groupBy($"q_id").count().where($"count" =!= 5).isEmpty)
    // driver-side monotonicity check (self-joining a custom
    // attribute-producing node trips DeduplicateRelations — documented
    // TopKPerKey limitation, same as any non-builtin generator node)
    r.orderBy($"q_id", $"rank").collect()
      .groupBy(_.getAs[Long]("q_id")).values.foreach { rows =>
        val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
          "sim must be non-increasing in rank")
      }
  }

  test("LSH ANN results are a subset of the probe bucket, exact within it") {
    val lsh = Ann.lshTopK(emb.where($"vec_id" >= 5), emb.where($"vec_id" < 5),
      "vec_id", "embedding", 8, 5).cache()
    val bf = Ann.bruteForceTopK(emb.where($"vec_id" >= 5),
      emb.where($"vec_id" < 5), "vec_id", "embedding", 1000)
    // every LSH hit appears in the brute-force ranking with equal sim
    val joined = lsh.join(bf.select($"q_id", $"n_id", $"sim".as("bf_sim")),
      Seq("q_id", "n_id"))
    assert(joined.where($"sim" =!= $"bf_sim").isEmpty)
  }

  test("quantized ANN: recall floor vs brute force, sims exact") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val qa = Ann.quantizedTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .cache()
    val bf = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
    val hits = qa.join(bf.select($"q_id", $"n_id"), Seq("q_id", "n_id"))
      .count()
    val total = bf.count()
    // int8 codes of unit vectors barely perturb cosine order: the
    // 3k-candidate scan + exact rescore should recover nearly all of
    // the true top-5 (measured 1.0 at sf0.001/sf0.01; floor guards
    // against the asymmetric-quantization failure mode, recall ~0.1)
    assert(hits >= (total * 0.8).toLong,
      s"quantized recall $hits/$total below 0.8 floor")
    // rescored sims are EXACT cosines: every reported (q,n,sim)
    // matches the brute-force sim for that pair
    val bfAll = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
      k = 1000)
    val joined = qa.join(bfAll.select($"q_id", $"n_id", $"sim".as("bf_sim")),
      Seq("q_id", "n_id"))
    assert(joined.where($"sim" =!= $"bf_sim").isEmpty)
  }

  test("winnowing guarantee: a shared run of w+kg-1 tokens is always " +
      "caught; disjoint-vocabulary docs never pair") {
    // kg=4, w=4: doc 1 and 2 share an 8-token run (guarantee bound
    // 4+4-1=7 < 8) inside otherwise disjoint text; doc 3 shares no
    // token with either.
    val run = "p q r s t u v w"
    val docs = Seq(
      (1L, s"a1 b1 c1 d1 $run e1 f1 g1"),
      (2L, s"a2 b2 c2 d2 e2 $run f2 g2 h2"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairs(docs, "doc_id", "text",
        minShared = 1L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowingPrints parity with a brute-force Scala reference on " +
      "the corpus (window minima over the same gram hashes)") {
    val kg = 4; val w = 4
    val d = docs.limit(60)
    val got = Dedup.winnowingPrints(d, "doc_id", "text", kg, w)
      .as[(Long, Long)].collect().toSet
    // reference: same token/gram hash chain replayed sequentially
    val P = 1000000007L
    val ref = d.select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (did, text) =>
        def hash(s: String): Long =
          s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)
        val th = text.split(" ").map(hash)
        val g = th.sliding(kg).filter(_.length == kg)
          .map(_.reduce((a, b) => (a * 31 + b) % P)).toArray
        if (g.isEmpty) Seq.empty
        else {
          val maxStart = math.max(g.length - w, 0)
          (0 to maxStart).map(i => g.slice(i, i + w).min)
            .distinct.map(h => (did, h))
        }
      }.toSet
    assert(got === ref)
  }

  test("sourceOverlap: sharing sources pair with a consistent ppm, " +
      "disjoint sources are absent") {
    val run = "p q r s t u v w"
    val docs = Seq(
      (1L, "A", s"a1 b1 c1 d1 $run e1 f1 g1"),
      (2L, "B", s"a2 b2 c2 d2 e2 $run f2 g2 h2"),
      (3L, "C", "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.sourceOverlap(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getAs[String]("src_a"),
        r.getAs[String]("src_b"), r.getAs[Long]("shared_prints"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("overlap_ppm"))).toSeq
    assert(out.map(t => (t._1, t._2)) === Seq(("A", "B")))
    val (_, _, sh, na, nb, ppm) = out.head
    assert(sh >= 1L && ppm === sh * 1000000L / (na + nb - sh))
  }

  test("editVerify: hand-checked one-char edit kept at its exact " +
      "sim_ppm; a junk-tailed candidate falls below tau") {
    // d1/d2: 23 chars, one substitution -> dist 1, sim_ppm
    // (23-1)*1e6 div 23 = 956521. d3 shares d1's 8-token run (so it
    // IS a winnowing candidate at minShared=1) but its junk tail
    // pushes edit similarity below 0.5 -> dropped.
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k z"),
      (3L, "a b c d e f g h junk1x junk2xy junk3xyz junk4wxyz " +
        "junk5abcd junk6efgh junk7ijkl junk8mnop junk9qrst"))
      .toDF("doc_id", "text")
    val out = Dedup.editVerify(docs, "doc_id", "text", minShared = 1L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"), r.getAs[Long]("sim_ppm"))).toSeq
    assert(out === Seq((1L, 2L, 1L, 956521L)))
  }

  test("thresholdSweep: hand-checked pair and removable counts at " +
      "every tau; curves monotone non-increasing") {
    // d1=d2 (j=1e6); d3 overlaps d1/d2 at 3 of 5 distinct shingles
    // (j=600000); d5 unique. tau 300k/500k: 3 pairs, removable
    // {2,3} = 12 tokens; tau 700k/900k: 1 pair, removable {2}.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "a b c d e z"), (5L, "q r s t u v"))
      .toDF("doc_id", "text")
    val out = Dedup.thresholdSweep(docs, "doc_id", "text")
      .orderBy($"tau_ppm").collect()
      .map(r => (r.getAs[Long]("tau_ppm"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("docs_removable"),
        r.getAs[Long]("tokens_removable"))).toSeq
    assert(out === Seq(
      (300000L, 3L, 2L, 12L), (500000L, 3L, 2L, 12L),
      (700000L, 1L, 1L, 6L), (900000L, 1L, 1L, 6L)))
    val rows = out.map(_._2)
    assert(rows === rows.sorted.reverse)
    // empty tau grid: rejected at call time with a clear message,
    // not an opaque UnsupportedOperationException from taus.min
    // (and never an invalid empty-list literal in the SQL mirror)
    val e = intercept[IllegalArgumentException] {
      Dedup.thresholdSweep(docs, "doc_id", "text", taus = Seq.empty)
    }
    assert(e.getMessage.contains("at least one tau"))
    intercept[IllegalArgumentException] {
      Dedup.thresholdSweepSql("doc_id", "text", taus = Seq.empty)
    }
  }

  test("crossEditVerify: a planted near-copy of a corpus doc is " +
      "flagged with its exact edit distance; unrelated arrivals pass") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today ok"),
      (2L, "completely different corpus content with many words here"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today ok"),
      (11L, "zz yy xx ww vv uu tt ss rr qq pp"))
      .toDF("doc_id", "text")
    val out = Dedup.crossEditVerify(corpus, arrivals, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("dist"), r.getAs[Long]("sim_ppm"))).toSeq
    assert(out === Seq((10L, 1L, 0L, 1000000L)))
  }

  test("containmentPairs: an embedded doc is caught at C~1 while " +
      "Jaccard stays low; disjoint docs absent") {
    // doc 1 (8 tokens) is fully contained in doc 2 (24 tokens):
    // doc 1 has 6 distinct 3-shingles, ALL present in doc 2 (30
    // shingles, 22 distinct) -> c_ab = 1e6, j = 6/(6+22-6) = 272727.
    val inner = "a b c d e f g h"
    val docs = Seq(
      (1L, inner),
      (2L, s"x1 x2 x3 x4 x5 x6 x7 x8 $inner y1 y2 y3 y4 y5 y6 y7 y8"),
      (3L, "q r s t u v w z q2 r2 s2 t2"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("c_ab_ppm"), r.getAs[Long]("c_ba_ppm"),
        r.getAs[Long]("j_ppm"))).toSeq
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 2L)))
    val (_, _, na, nb, cab, cba, j) = out.head
    assert(na === 6L && cab === 1000000L)
    // Jaccard is deep in its blind region while containment maxes
    assert(j === na * 1000000L / (na + nb - na) && j < 300000L)
    assert(cba === na * 1000000L / nb)
  }

  test("dedupCertificate: planted-cluster arithmetic and the zero " +
      "residual, on synthetic and corpus data") {
    // 3-member identical cluster + 2 singletons: 5 docs -> 3
    // survivors, 2 removed, residual 0
    val t = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq((1L, t), (2L, t), (3L, t),
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8"), (5L, "b1 b2 b3 b4 b5 b6 b7 b8"))
      .toDF("doc_id", "text")
    val row = Dedup.dedupCertificate(docs, "doc_id", "text").collect().head
    assert((row.getAs[Long]("n_docs"), row.getAs[Long]("n_survivors"),
      row.getAs[Long]("docs_removed"), row.getAs[Long]("tokens_kept"),
      row.getAs[Long]("residual_pairs")) === ((5L, 3L, 2L, 24L, 0L)))
    // corpus: survivors + removed partition the corpus; residual 0
    val c = Dedup.dedupCertificate(graft.model.Tables.documents(spark, sf),
      "doc_id", "text").collect().head
    assert(c.getAs[Long]("n_docs") ===
      c.getAs[Long]("n_survivors") + c.getAs[Long]("docs_removed"))
    assert(c.getAs[Long]("residual_pairs") === 0L)
  }

  test("binaryCodes: hand-checked mean-thresholded bit packing") {
    // corpus a=(1,0,0,0) b=(0,1,0,0) c=(1,1,1,1): per-dim fixed-point
    // sums s = (2,2,1,1)*2^30, n=3; bit = f*3 > s -> 1.0 components
    // set their bit (3*2^30 > 2*2^30), 0.0 never does. Packed lo:
    // a=1, b=2, c=15 (dims 1..4 -> bits 0..3), hi=0 everywhere.
    val corpus = Seq(
      (5L, Array(1f, 0f, 0f, 0f)), (6L, Array(0f, 1f, 0f, 0f)),
      (7L, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val thr = Ann.binaryThresholds(corpus, "vec_id", "embedding")
    val codes = Ann.binaryCodes(corpus, "vec_id", "embedding", thr, "c")
      .orderBy($"vec_id").collect()
      .map(r => (r.getAs[Long]("c_lo"), r.getAs[Long]("c_hi"))).toSeq
    assert(codes === Seq((1L, 0L), (2L, 0L), (15L, 0L)))
  }

  test("hammingTopK: hand-checked hamming distances, exact-cosine " +
      "final order, in_exact flags") {
    // query (0.9, 0.1, 0, 0) binarizes to lo=1 against the corpus
    // thresholds -> hamming 0 to a, 2 to b, 3 to c; final order is
    // by EXACT cosine: a (.9939) > c (.5522) > b (.1104).
    val corpus = Seq(
      (5L, Array(1f, 0f, 0f, 0f), 0), (6L, Array(0f, 1f, 0f, 0f), 0),
      (7L, Array(1f, 1f, 1f, 1f), 0)).toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, Array(0.9f, 0.1f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.hammingTopK(corpus, queries, "vec_id", "embedding",
        k = 3).orderBy($"rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Long]("hamming"), r.getAs[Boolean]("in_exact"))).toSeq
    assert(out === Seq((1L, 5L, 0L, true), (2L, 7L, 3L, true),
      (3L, 6L, 2L, true)))
  }

  test("hamming ANN on the corpus: recall floor vs brute force, " +
      "rescored sims exact") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val ha = Ann.hammingTopK(corpus, queries, "vec_id", "embedding",
      k = 5).cache()
    val bf = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
      k = 5)
    val hits = ha.where($"in_exact").count()
    val total = bf.count()
    // 64 bits of a 64-dim float vector keep coarse angular order; the
    // 10k shortlist + exact rescore recovers most of the true top-5
    // (structureless mock embeddings: measured 0.92 at sf0.01)
    assert(hits >= (total * 0.5).toLong,
      s"hamming recall $hits/$total below 0.5 floor")
    val bfAll = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
      k = 1000)
    val joined = ha.join(bfAll.select($"q_id", $"n_id", $"sim".as("bf_sim")),
      Seq("q_id", "n_id"))
    assert(joined.where($"sim" =!= $"bf_sim").isEmpty)
  }

  test("persisted IVF index probe equals the in-session IVF path") {
    import org.apache.spark.sql.functions.col
    val e = graft.model.Tables.embeddings(spark, sf)
    val corpus = e.where(col("vec_id") >= 5)
    val queries = e.where(col("vec_id") < 5)
    val base = java.nio.file.Files
      .createTempDirectory("graft-ann-index").toString
    Ann.writeIndex(corpus, "vec_id", "embedding", k = 8, iters = 2, base)
    val idx = Ann.readIndex(spark, base)
    val probed = Ann.indexedTopK(idx, queries, "vec_id", "embedding",
        nprobe = 2, k = 5)
      .select($"q_id", $"rank", $"n_id", $"c_id", $"sim")
      .orderBy($"q_id", $"rank").collect().toSeq
    val cent = Ann.kmeansFit(corpus, "vec_id", "embedding", k = 8, iters = 2)
    val direct = Ann.ivfTopK(corpus, queries, cent, "vec_id", "embedding",
        nprobe = 2, k = 5)
      .select($"q_id", $"rank", $"n_id", $"c_id", $"sim")
      .orderBy($"q_id", $"rank").collect().toSeq
    assert(probed === direct)
  }

  test("semDedup drops exactly the within-cluster lower-neighbour set") {
    import org.apache.spark.sql.functions.col
    val cent = Ann.kmeansFit(emb, "vec_id", "embedding", k = 8, iters = 2)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .withColumn("cn", graft.functions.VectorOps.norm(col("cv")))
    val dropped = Dedup.semDedup(emb, "vec_id", "embedding", cent, 0.40)
      .cache()
    assert(dropped.count() > 0, "testdata plants same-cluster near-dups")
    assert(dropped.where($"dup_of" >= $"vec_id").isEmpty,
      "keep rule is min-id: the reported exemplar is strictly lower")
    assert(dropped.where($"sim" < 0.40).isEmpty)
    // cluster-scoped by construction: every (dup_of, vec_id) pair is a
    // same-cluster subset of the global exact pass at the same tau
    val asg = Ann.argmaxAssign(
        emb.select($"vec_id", $"embedding".as("v")), "v", cent)
      .select($"vec_id", $"cid")
    val global = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.40)
      .join(asg.select($"vec_id".as("id_a"), $"cid".as("ca")), "id_a")
      .join(asg.select($"vec_id".as("id_b"), $"cid".as("cb")), "id_b")
      .where($"ca" === $"cb")
      .groupBy($"id_b").agg(
        org.apache.spark.sql.functions.min($"id_a").as("want_dup_of"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("want_n"))
    val joined = dropped.join(global, dropped("vec_id") === global("id_b"),
      "full_outer")
    assert(joined.where($"vec_id".isNull || $"id_b".isNull ||
      $"dup_of" =!= $"want_dup_of" || $"n_dups" =!= $"want_n").isEmpty,
      "dropped set == same-cluster slice of the global exact pairs")
  }

  test("lshPrecision: nested bandings grow candidates, verified set " +
      "is the exact-pair intersection") {
    val out = Dedup.lshPrecision(docs, "doc_id", "text", k = 24,
        bandsList = Seq(4, 8, 12), tau = 0.5)
      .collect().map(r => (r.getAs[Long]("bands"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_verified"), r.getAs[Long]("precision_ppm")))
    assert(out.map(_._1).toSeq === Seq(4L, 8L, 12L))
    val byB = out.map(t => t._1 -> t).toMap
    // r=6 bands are two concatenated r=3 bands, so every bands=4
    // candidate also collides at bands=8 (nested partitions); no such
    // nesting holds between r=3 and r=2
    assert(byB(4L)._2 <= byB(8L)._2, "cand(4) subset of cand(8)")
    assert(byB(4L)._3 <= byB(8L)._3, "ver(4) subset of ver(8)")
    out.foreach { case (_, nc, nv, p) =>
      assert(p === (if (nc == 0) 0L else nv * 1000000L / nc))
      assert(nv <= nc)
    }
  }

  test("splitLeakage: rows partition the verified pair set, names " +
      "match ranks") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5,
      k = 24, bands = 12)
    val out = graft.SparkEntry.queries("c73_split_leakage")(spark, sf)
      .collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum === pairs.count())
    val names = Map(0L -> "train", 1L -> "val", 2L -> "test")
    out.foreach { r =>
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
      assert(r.getAs[String]("split_a") === names(r.getAs[Long]("lo")))
      assert(r.getAs[String]("split_b") === names(r.getAs[Long]("hi")))
    }
  }

  test("quantHealth: collapsed dim reads zero-spread, saturated dim " +
      "hits 127") {
    // dim 0 constant 0 (collapsed), dim 1 carries all the signal
    // (normalized to ±1 -> codes ±127)
    val vecs = Seq(
      (1L, Array(0f, 3f)), (2L, Array(0f, -3f)), (3L, Array(0f, 5f))
    ).toDF("vec_id", "embedding")
    val out = Ann.quantHealth(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getAs[Long]("dim"), r.getAs[Long]("n"),
        r.getAs[Long]("code_min"), r.getAs[Long]("code_max"),
        r.getAs[Long]("code_sum"), r.getAs[Long]("code_sqsum")))
    assert(out.toSeq === Seq(
      (0L, 3L, 0L, 0L, 0L, 0L),
      (1L, 3L, -127L, 127L, 127L, 3L * 127L * 127L)))
  }

  test("pcaTop recovers a planted dominant direction; uniform cloud " +
      "has no runaway component") {
    // planted anisotropy: all variance lives on dim 1 (values swing
    // ±9), dim 3 wiggles a little, dims 0/2 are constant offsets —
    // after centering, the top component must be the dim-1 axis:
    // |v_fix| = fix exactly at dim 1, small everywhere else
    val vecs = (0 until 40).map { i =>
      val s = if (i % 2 == 0) 9f else -9f
      val t = if (i % 4 < 2) 0.5f else -0.5f
      (i.toLong, Array(2f, s, 1f, t))
    }.toDF("vec_id", "embedding")
    val out = Ann.pcaTop(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v_fix"))
      .toMap
    assert(out.size === 4)
    assert(math.abs(out(1L)) === 1000000L, s"dominant dim: $out")
    Seq(0L, 2L, 3L).foreach { d =>
      assert(math.abs(out(d)) < 100000L, s"dim $d too large: $out") }
    // determinism: re-run is identical
    val again = Ann.pcaTop(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Long]("v_fix"))
      .toMap
    assert(again === out)
  }

  test("clusterStats: histogram partitions the corpus, removal mass " +
      "hand-checked") {
    val d = Seq(
      (1L, "a b c d e f"),   // dup pair with 2 -> cluster {1, 2}
      (2L, "a b c d e f"),
      (3L, "x y z w q r"),   // singleton
      (4L, "p p q q r r s")  // singleton
    ).toDF("doc_id", "text")
    val out = Dedup.clusterStats(d, "doc_id", "text", 0.5)
      .collect().map(r => (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("docs_removed"),
        r.getAs[Long]("tokens_removed")))
    assert(out.toSeq === Seq((1L, 2L, 0L, 0L), (2L, 1L, 1L, 6L)))
    // at sf: Σ size·n_clusters covers every doc, removal mass consistent
    val sfOut = Dedup.clusterStats(docs, "doc_id", "text", 0.5).collect()
    val covered = sfOut.map(r => r.getAs[Long]("cluster_size") *
      r.getAs[Long]("n_clusters")).sum
    assert(covered === docs.count())
    val removed = sfOut.map(_.getAs[Long]("docs_removed")).sum
    val survivors = Dedup.deduplicate(docs, "doc_id", "text", 0.5)
      .where($"doc_id" === $"keeper").count() +
      (docs.count() - Dedup.deduplicate(docs, "doc_id", "text", 0.5).count())
    assert(removed === docs.count() - survivors)
  }

  test("qualityKeepers picks the best-quality member, ties to smaller " +
      "id, singletons absent") {
    val base = (1 to 25).map(i => s"unique$i").mkString(" ")
    // doc 1: one token degraded to a repeat -> lower quality than 2/3
    val mangled = base.replace("unique5", "unique4")
    val d = Seq((1L, mangled), (2L, base), (3L, base),
      (4L, "totally unrelated singleton text with nothing shared"))
      .toDF("doc_id", "text")
    val q = graft.operators.TextQuality
      .qualityFeatures(d, "doc_id", "text")
      .select($"doc_id",
        expr("cast(round(quality * 1000000, 0) as bigint)").as("q_ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q(1L) < q(2L) && q(2L) === q(3L))
    val out = Dedup.qualityKeepers(d, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getAs[Long]("cluster"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("best_id"),
        r.getAs[Long]("best_q_ppm"), r.getAs[Long]("minid_q_ppm"),
        r.getAs[Long]("upgraded"))).toSeq
    // one cluster {1,2,3}: best = 2 (beats 1 on quality, beats the
    // identical 3 on id); singleton 4 absent
    assert(out === Seq((1L, 3L, 2L, q(2L), q(1L), 1L)))
  }

  test("fuzzyContamination flags a paraphrase the 3-shingle unit would miss") {
    val eText = "the quick brown fox jumps over a lazy dog while " +
      "heavy rain falls softly on green hills near the old northern " +
      "valley path today"
    // every 4th word rewritten: bigram survival ≈ 1/2 (J ≈ 0.33,
    // above the 0.3 gate), 3-shingle survival ≈ 1/4 (J ≈ 0.14, below)
    val pText = "the quick brown wolf jumps over a sleepy dog while " +
      "heavy snow falls softly on grassy hills near the ancient " +
      "northern valley path tonight"
    val nText = "completely different subject matter entirely numbers " +
      "one two three four five six seven eight nine ten eleven twelve"
    val d = Seq((0L, eText), (1L, pText), (2L, nText), (3L, eText))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(d, "doc_id", "text",
        isEval = $"doc_id" === 0L, minPpm = 300000L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_eval_hits"), r.getAs[Long]("worst_j_ppm")))
    // paraphrase (1) and verbatim copy (3) flagged; unrelated (2) not
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    val Some((_, _, jP)) = out.find(_._1 == 1L)
    assert(jP >= 300000L && jP < 600000L, s"paraphrase ppm $jP")
    assert(out.find(_._1 == 3L).get._3 === 1000000L)
    // the claim that names the operator: the SAME pair's 3-shingle
    // Jaccard sits below the SAME 0.3 gate — c68's unit misses it
    val sh = Seq((0L, eText), (1L, pText)).toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextOps.shingleHashes($"text").as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](1).toSet).toMap
    val inter = (sh(0L) & sh(1L)).size.toDouble
    val shingleJ = inter / (sh(0L).size + sh(1L).size - inter)
    assert(shingleJ < 0.3, s"shingle J $shingleJ should be sub-gate")
  }

  test("spanRedact: duplicated runs removed, rest kept (hand-checked)") {
    // w=2: "a b" occurs in docs 1 and 2 -> both lose exactly those
    // two tokens; doc 3's "p q" repeats WITHIN the doc (pos 0 and 2)
    // -> covered = [0,1] + [2,3] = everything -> fully redacted;
    // doc 4 shares nothing -> untouched.
    val d = Seq((1L, "a b c d"), (2L, "x a b y"), (3L, "p q p q"),
      (4L, "u v w")).toDF("doc_id", "text")
    val out = Dedup.spanRedact(d, "doc_id", "text", w = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("kept_ppm"),
        r.getAs[String]("redacted_text"))).toSeq
    assert(out === Seq(
      (1L, 4L, 2L, 500000L, "c d"),
      (2L, 4L, 2L, 500000L, "x y"),
      (3L, 4L, 4L, 0L, ""),
      (4L, 3L, 0L, 1000000L, "u v w")))
  }

  test("spanRedact corpus invariants: render matches counts, " +
      "redacted docs share no 16-token windows") {
    import graft.functions.TextOps
    val out = Dedup.spanRedact(docs, "doc_id", "text", w = 16).cache()
    // token-mass audit: redaction really removes mass, and the
    // re-rendered text has exactly n_tokens - n_removed tokens
    val removed = out.agg(sum($"n_removed")).as[Long].head()
    assert(removed > 0L, "no spans removed on the shared-span corpus")
    assert(out.where($"n_removed" > $"n_tokens").isEmpty)
    val badRender = out.where($"n_removed" < $"n_tokens" &&
      size(TextOps.tokens($"redacted_text")) =!=
        ($"n_tokens" - $"n_removed")).count()
    assert(badRender === 0L, "kept token stream != n_tokens - n_removed")
    assert(out.where($"n_removed" === $"n_tokens" &&
      $"redacted_text" =!= "").isEmpty)
    // the apply claim: AFTER redaction no 16-token window occurs
    // twice anywhere in the corpus (Lee et al.'s post-dedup
    // memorization audit reads zero on this testdata — deletion can
    // in principle create new duplicated junction windows, but none
    // arise here and ExactSubstr does not iterate either)
    val red = out.where($"redacted_text" =!= "")
      .select($"doc_id", $"redacted_text".as("text"))
    val residual = Dedup.dupWindowRate(red, "doc_id", "text", w = 16)
      .agg(sum($"n_dup_windows")).as[Long].head()
    assert(residual === 0L, s"$residual duplicated windows survived")
    out.unpersist()
  }

  test("appendIndex: probe-after-append equals rebuild-from-scratch " +
      "against the same centroids; audit accounts for every arrival") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    val centroids = centDf.select($"vec_id".as("c_id"),
      $"embedding".as("c_vec"))
    val cent = Ann.centTable(centDf, "vec_id", "embedding")
    val baseIdx = Ann.IvfIndex(centroids,
      Ann.buildLists(base, cent, "vec_id", "embedding"))
    val appended = Ann.appendIndex(baseIdx, arrivals, "vec_id",
      "embedding")
    val rebuilt = Ann.buildLists(base.unionByName(arrivals), cent,
      "vec_id", "embedding")
    // append IS rebuild: identical (list, member) assignment
    def memb(df: org.apache.spark.sql.DataFrame) =
      df.select($"c_id".cast("long"), $"n_id".cast("long"))
        .as[(Long, Long)].collect().toSet
    assert(memb(appended.lists) === memb(rebuilt))
    // and therefore identical probe results
    val queries = emb.where($"vec_id" < 5)
    def probe(idx: Ann.IvfIndex) =
      Ann.indexedTopK(idx, queries, "vec_id", "embedding",
          nprobe = 2, k = 5)
        .select($"q_id", $"rank", $"n_id", $"c_id")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    assert(probe(appended) === probe(Ann.IvfIndex(centroids, rebuilt)))
    // audit accounting: every arrival lands in exactly one list, base
    // mass is untouched, sentinels only where defined
    val audit = Ann.ivfAppendAudit(baseIdx, arrivals, "vec_id",
      "embedding").cache()
    assert(audit.agg(sum($"n_arrived")).as[Long].head() ===
      arrivals.count())
    assert(audit.agg(sum($"n_base")).as[Long].head() === base.count())
    assert(audit.where($"n_arrived" > 0 &&
      ($"arrived_sim_ppm" < -1000000L ||
        $"arrived_sim_ppm" > 1000000L)).isEmpty)
    assert(audit.where($"n_arrived" === 0 &&
      ($"arrived_sim_ppm" =!= -1L || $"drift_ppm" =!= 0L)).isEmpty)
    assert(audit.where($"n_base" === 0 && $"growth_ppm" =!= -1L).isEmpty)
    audit.unpersist(); centDf.unpersist()
  }

  test("appendIndexDir: parquet partition-append equals the in-memory " +
      "append after reload") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString
    try {
      Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, dir)
      val before = Ann.readIndex(spark, dir)
      val inMem = Ann.appendIndex(before, arrivals, "vec_id",
        "embedding")
      Ann.appendIndexDir(spark, dir, arrivals, "vec_id", "embedding")
      val reloaded = Ann.readIndex(spark, dir)
      def memb(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id".cast("long"), $"n_id".cast("long"))
          .as[(Long, Long)].collect().toSet
      assert(memb(reloaded.lists) === memb(inMem.lists))
      // base partitions were appended to, not rewritten: every base
      // member is still present exactly once
      assert(reloaded.lists.groupBy($"n_id").count()
        .where($"count" > 1).isEmpty)
      val queries = emb.where($"vec_id" < 5)
      def probe(idx: Ann.IvfIndex) =
        Ann.indexedTopK(idx, queries, "vec_id", "embedding",
            nprobe = 2, k = 5)
          .select($"q_id", $"rank", $"n_id", $"c_id")
          .as[(Long, Int, Long, Long)].collect()
          .sortBy(r => (r._1, r._2)).toSeq
      assert(probe(reloaded) === probe(inMem))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("retrainCentroids reads the index layout: seeded refresh from " +
      "the lists equals the refresh from the raw corpus") {
    import graft.functions.VectorOps
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    val centroids = centDf.select($"vec_id".as("c_id"),
      $"embedding".as("c_vec"))
    val cent = Ann.centTable(centDf, "vec_id", "embedding")
    val baseIdx = Ann.IvfIndex(centroids,
      Ann.buildLists(base, cent, "vec_id", "embedding"))
    val fromIdx = Ann.retrainCentroids(baseIdx, arrivals, "vec_id",
      "embedding")
    val membersRaw = base.unionByName(arrivals)
      .select($"vec_id".as("vid"), $"embedding".as("v"),
        VectorOps.norm($"embedding").as("vn"))
    val oldCent = centroids.select($"c_id".as("cid"), $"c_vec".as("cv"),
      VectorOps.norm($"c_vec").as("cn"))
    val fromRaw = Ann.kmeansUpdate(membersRaw, oldCent)
    def cset(df: org.apache.spark.sql.DataFrame) =
      df.select($"cid", $"cv").as[(Long, Seq[Float])].collect().toSet
    assert(cset(fromIdx) === cset(fromRaw))
    centDf.unpersist()
  }

  test("retrainAudit conserves membership: before and after sum to " +
      "base+arrivals, flows net to zero, movement in range") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    val centroids = centDf.select($"vec_id".as("c_id"),
      $"embedding".as("c_vec"))
    val cent = Ann.centTable(centDf, "vec_id", "embedding")
    val baseIdx = Ann.IvfIndex(centroids,
      Ann.buildLists(base, cent, "vec_id", "embedding"))
    val audit = Ann.retrainAudit(baseIdx, arrivals, "vec_id",
      "embedding", maxGrowthPpm = 300000L,
      maxDriftDownPpm = 20000L).cache()
    val total = base.count() + arrivals.count()
    assert(audit.agg(sum($"n_before")).as[Long].head() === total)
    assert(audit.agg(sum($"n_after")).as[Long].head() === total)
    assert(audit.agg(sum($"delta_n")).as[Long].head() === 0L)
    assert(audit.where($"move_ppm" > 1000000L ||
      $"move_ppm" < -1000000L).isEmpty)
    // a retired centroid (move_ppm = -1 sentinel) can hold no members
    assert(audit.where($"move_ppm" === -1L && $"n_after" =!= 0L).isEmpty)
    assert(audit.where($"retrain" =!= 0L && $"retrain" =!= 1L).isEmpty)
    audit.unpersist(); centDf.unpersist()
  }

  test("migrateLists equals rebuild-from-scratch against the " +
      "refreshed centroids; migration matrix ties to retrainAudit") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).cache()
    val centroids = centDf.select($"vec_id".as("c_id"),
      $"embedding".as("c_vec"))
    val cent = Ann.centTable(centDf, "vec_id", "embedding")
    val baseIdx = Ann.IvfIndex(centroids,
      Ann.buildLists(base, cent, "vec_id", "embedding"))
    val migrated = Ann.migrateLists(baseIdx, arrivals, "vec_id",
      "embedding")
    val newCentTbl = migrated.centroids.select($"c_id",
      $"c_vec", graft.functions.VectorOps.norm($"c_vec").as("c_nrm"))
    val rebuilt = Ann.buildLists(base.unionByName(arrivals), newCentTbl,
      "vec_id", "embedding")
    def memb(df: org.apache.spark.sql.DataFrame) =
      df.select($"c_id".cast("long"), $"n_id".cast("long"))
        .as[(Long, Long)].collect().toSet
    assert(memb(migrated.lists) === memb(rebuilt))
    val queries = emb.where($"vec_id" < 5)
    def probe(idx: Ann.IvfIndex) =
      Ann.indexedTopK(idx, queries, "vec_id", "embedding",
          nprobe = 2, k = 5)
        .select($"q_id", $"rank", $"n_id", $"c_id")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    assert(probe(migrated) ===
      probe(Ann.IvfIndex(migrated.centroids, rebuilt)))
    // matrix row sums = audit n_before per from-list; column sums =
    // n_after per to-list
    val matrix = Ann.retrainMigration(baseIdx, arrivals, "vec_id",
      "embedding").cache()
    val audit = Ann.retrainAudit(baseIdx, arrivals, "vec_id",
        "embedding", maxGrowthPpm = 300000L, maxDriftDownPpm = 20000L)
      .cache()
    val rowSums = matrix.groupBy($"from_c_id".as("c_id"))
      .agg(sum($"n_docs").as("n")).as[(Long, Long)].collect().toMap
    val colSums = matrix.groupBy($"to_c_id".as("c_id"))
      .agg(sum($"n_docs").as("n")).as[(Long, Long)].collect().toMap
    audit.select($"c_id", $"n_before", $"n_after")
      .as[(Long, Long, Long)].collect().foreach { case (c, nb, na) =>
        assert(rowSums.getOrElse(c, 0L) === nb, s"row sum for $c")
        assert(colSums.getOrElse(c, 0L) === na, s"col sum for $c")
      }
    matrix.unpersist(); audit.unpersist(); centDf.unpersist()
  }

  test("migrateIndexDir: reload equals the in-memory migrate; a " +
      "partition no mover crosses keeps its files") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-migrate").toString
    try {
      Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, dir)
      val before = Ann.readIndex(spark, dir)
      val inMem = Ann.migrateLists(before, arrivals, "vec_id",
        "embedding")
      val matrix = Ann.retrainMigration(before, arrivals, "vec_id",
        "embedding").cache()
      val untouched = {
        val crossed = matrix.where($"moved" === 1L)
          .select(explode(array($"from_c_id", $"to_c_id")).as("c"))
          .distinct().as[Long].collect().toSet
        matrix.select($"from_c_id").distinct().as[Long].collect()
          .filterNot(crossed).toSeq
      }
      def files(cid: Long) = {
        val p = java.nio.file.Paths.get(dir, "lists", s"c_id=$cid")
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
      val beforeFiles = untouched.map(c => c -> files(c)).toMap
      Ann.migrateIndexDir(spark, dir, arrivals, "vec_id", "embedding")
      val reloaded = Ann.readIndex(spark, dir)
      def memb(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id".cast("long"), $"n_id".cast("long"))
          .as[(Long, Long)].collect().toSet
      assert(memb(reloaded.lists) === memb(inMem.lists))
      assert(reloaded.lists.groupBy($"n_id").count()
        .where($"count" > 1).isEmpty)
      def cset(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id".cast("long"), $"c_vec")
          .as[(Long, Seq[Float])].collect().toSet
      assert(cset(reloaded.centroids) === cset(inMem.centroids))
      // drains force a full rewrite; otherwise untouched partitions
      // must keep their files byte-identical (same names + mtimes)
      val receiving = matrix.select($"to_c_id").distinct()
        .as[Long].collect().toSet
      val allOld = matrix.select($"from_c_id").distinct()
        .as[Long].collect().toSet
      if ((allOld -- receiving).isEmpty)
        untouched.foreach { c =>
          assert(files(c) === beforeFiles(c),
            s"partition c_id=$c was rewritten without movers")
        }
      matrix.unpersist()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("retrain recall report: one row per query, recalls in range") {
    val out = graft.SparkEntry.queries("c82_retrain_recall")(spark, sf)
      .collect().map(r => (r.getAs[Long]("q_id"),
        r.getAs[Double]("recall_before"), r.getAs[Double]("recall_after")))
    assert(out.length === 5)
    out.foreach { case (q, rb, ra) =>
      assert(rb >= 0.0 && rb <= 1.0, s"recall_before out of range for $q")
      assert(ra >= 0.0 && ra <= 1.0, s"recall_after out of range for $q")
    }
  }

  test("filtered ANN: every hit shares its query's label, ranks are " +
      "contiguous from 1") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base, Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding"))
    val queries = emb.where($"vec_id" < 5)
    val out = Ann.indexedFilteredTopK(idx, queries, "vec_id",
      "embedding", "label", nprobe = 3, k = 3).cache()
    assert(out.count() > 0L)
    val qlab = queries.select($"vec_id".as("q_id"),
      $"label".as("qlabel"))
    assert(out.join(qlab, "q_id").where($"label" =!= $"qlabel").isEmpty)
    assert(out.groupBy($"q_id")
      .agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .where($"mx" =!= $"n").isEmpty)
    out.unpersist()
  }

  test("hard negatives: labels always differ, and positives + " +
      "negatives partition the unfiltered probe") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base, Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding"))
    val queries = emb.where($"vec_id" < 5)
    val neg = Ann.indexedHardNegatives(idx, queries, "vec_id",
      "embedding", "label", nprobe = 3, k = 3).cache()
    assert(neg.count() > 0L)
    // every mined negative has a label different from its query's
    assert(neg.where($"label" === $"q_label").isEmpty)
    // ranks contiguous from 1 per query
    assert(neg.groupBy($"q_id")
      .agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .where($"mx" =!= $"n").isEmpty)
    // with k wide open, same-label (c83) and different-label (c87)
    // candidate sets PARTITION the unfiltered probe over the same
    // probed lists — nothing dropped, nothing double-counted
    val wide = 100000
    val pos = Ann.indexedFilteredTopK(idx, queries, "vec_id",
        "embedding", "label", nprobe = 3, k = wide)
      .select($"q_id", $"n_id")
    val negAll = Ann.indexedHardNegatives(idx, queries, "vec_id",
        "embedding", "label", nprobe = 3, k = wide)
      .select($"q_id", $"n_id")
    val plain = Ann.indexedTopK(idx, queries, "vec_id", "embedding",
        nprobe = 3, k = wide)
      .select($"q_id", $"n_id")
    assert(pos.intersect(negAll).isEmpty)
    assert(pos.unionAll(negAll).exceptAll(plain).isEmpty)
    assert(plain.exceptAll(pos.unionAll(negAll)).isEmpty)
    neg.unpersist()
  }

  test("index-forever lifecycle composes: physical append then " +
      "physical migrate equals the in-memory pipeline") {
    // the production sequence: build -> appendIndexDir (c79's write
    // path, first arrival wave) -> migrateIndexDir (c81's write path,
    // second wave triggers the refresh) -> reload must equal the
    // in-memory appendIndex + migrateLists composition, probes
    // included.
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) === 8)
    val wave1 = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) === 9)
    val wave2 = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-lifecycle").toString
    try {
      Ann.writeIndex(base, "vec_id", "embedding", k = 4, iters = 2, dir)
      val built = Ann.readIndex(spark, dir)
      val afterAppend = Ann.appendIndex(built, wave1, "vec_id",
        "embedding")
      Ann.appendIndexDir(spark, dir, wave1, "vec_id", "embedding")
      val inMem = Ann.migrateLists(afterAppend, wave2, "vec_id",
        "embedding")
      def memb(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id".cast("long"), $"n_id".cast("long"))
          .as[(Long, Long)].collect().toSet
      val queries = emb.where($"vec_id" < 5)
      def probe(idx: Ann.IvfIndex) =
        Ann.indexedTopK(idx, queries, "vec_id", "embedding",
            nprobe = 2, k = 5)
          .select($"q_id", $"rank", $"n_id", $"c_id")
          .as[(Long, Int, Long, Long)].collect()
          .sortBy(r => (r._1, r._2)).toSeq
      // materialize the in-memory expectation BEFORE the physical
      // migrate: its lazy frames read the dir's parquet, which
      // migrateIndexDir is about to overwrite
      val inMemMemb = memb(inMem.lists)
      val inMemProbe = probe(inMem)
      Ann.migrateIndexDir(spark, dir, wave2, "vec_id", "embedding")
      val reloaded = Ann.readIndex(spark, dir)
      assert(memb(reloaded.lists) === inMemMemb)
      assert(reloaded.lists.groupBy($"n_id").count()
        .where($"count" > 1).isEmpty)
      assert(probe(reloaded) === inMemProbe)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("label-partitioned filtered probe returns exactly the flat " +
      "layout's rows") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("n_id"), r.getAs[Int]("label"),
          r.getAs[Long]("c_id"), r.getAs[Double]("sim"))).toSeq
    val flat = rows("c83_filtered_ann")
    val part = rows("c84_ann_label_partition")
    assert(flat.nonEmpty && part === flat)
  }

  test("paragraphDedup: first occurrence kept, later repeats removed " +
      "(hand-checked)") {
    // p=2: block [a b] occurs at (1,0), (2,0), (4,0) -> only doc 1's
    // copy survives; [c d] at (1,1), (3,0) -> doc 1 keeps it; doc 2's
    // trailing PARTIAL block [x] is unique and kept. Contrast with
    // spanRedact: one copy of each repeated paragraph survives.
    val d = Seq((1L, "a b c d"), (2L, "a b x"), (3L, "c d"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "doc_id", "text", p = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed_blocks"),
        r.getAs[Long]("n_kept_tokens"), r.getAs[Long]("kept_ppm"),
        r.getAs[String]("redacted_text"))).toSeq
    assert(out === Seq(
      (1L, 4L, 2L, 0L, 4L, 1000000L, "a b c d"),
      (2L, 3L, 2L, 1L, 1L, 333333L, "x"),
      (3L, 2L, 1L, 1L, 0L, 0L, ""),
      (4L, 2L, 1L, 1L, 0L, 0L, "")))
  }

  test("paragraphDedup corpus invariant: exactly one survivor per " +
      "distinct block, render matches counts") {
    import graft.functions.TextOps
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", p = 16)
      .cache()
    val removed = out.agg(sum($"n_removed_blocks")).as[Long].head()
    assert(removed > 0L, "no blocks removed on the shared-span corpus")
    val badRender = out.where($"n_kept_tokens" > 0 &&
      size(TextOps.tokens($"redacted_text")) =!= $"n_kept_tokens")
      .count()
    assert(badRender === 0L, "kept token stream != n_kept_tokens")
    assert(out.where($"n_kept_tokens" === 0 &&
      $"redacted_text" =!= "").isEmpty)
    // first-keeps means EXACTLY one occurrence of every distinct
    // block survives corpus-wide — checked against an independent
    // STRING-equality block census (the impl compares hashes)
    val keptBlocks =
      out.agg(sum($"n_blocks" - $"n_removed_blocks")).as[Long].head()
    val toks = TextOps.tokens($"text")
    val distinctBlocks = docs.select(explode(transform(
        sequence(lit(0), floor((size(toks) + lit(15)) / lit(16))
          .cast("int") - 1),
        b => array_join(slice(toks, b * 16 + 1, lit(16)), " ")))
        .as("s"))
      .distinct().count()
    assert(keptBlocks === distinctBlocks,
      s"$keptBlocks survivors != $distinctBlocks distinct blocks")
    out.unpersist()
  }

  test("spanRedactGate: corpus-index hits and within-doc repeats " +
      "redacted, cross-arrival matches out of contract (hand-checked)") {
    // w=2 against corpus {1: "a b c d", 2: "m n o"}: doc 10's "a b"
    // exists in the corpus -> loses tokens 1-2; doc 11's "p q"
    // repeats WITHIN the doc -> fully redacted; docs 12 and 13 SHARE
    // "u v" with each other but match nothing in the corpus ->
    // untouched (cross-arrival matches are out of contract).
    val corpus = Seq((1L, "a b c d"), (2L, "m n o"))
      .toDF("doc_id", "text")
    val arr = Seq((10L, "x a b y"), (11L, "p q p q"), (12L, "u v"),
      (13L, "u v")).toDF("doc_id", "text")
    val widx = Dedup.WindowIndex(
      Dedup.buildWindowIndex(corpus, "doc_id", "text", w = 2))
    val out = Dedup.spanRedactGate(widx, arr, "doc_id", "text", w = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("kept_ppm"),
        r.getAs[String]("redacted_text"))).toSeq
    assert(out === Seq(
      (10L, 4L, 2L, 500000L, "x y"),
      (11L, 4L, 4L, 0L, ""),
      (12L, 2L, 0L, 1000000L, "u v"),
      (13L, 2L, 0L, 1000000L, "u v")))
  }

  // ---- c89 takedown: delete-equals-rebuild per persisted artifact ---

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmDir(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  /** (relative path -> mtime) of data files under `dir` whose
    * relative path starts with one of `prefixes`. */
  private def fileSnap(dir: String,
                       prefixes: Seq[String]): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    val w = java.nio.file.Files.walk(p)
    try w.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(f => p.relativize(f).toString -> f)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .map { case (n, f) =>
        n -> java.nio.file.Files.getLastModifiedTime(f).toMillis }
      .toMap
    finally w.close()
  }

  test("takedown: deleteFromIndexDir equals rebuild on survivors and " +
      "leaves untouched c_id partitions byte-identical") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val dir = tmpDir("graft-ivf-del")
    try {
      Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, dir)
      val idx = Ann.readIndex(spark, dir)
      // delete 3 members of ONE list -> exactly one touched partition
      val c0 = idx.lists.orderBy($"c_id", $"n_id")
        .select($"c_id").head().getLong(0)
      // materialize the delete set INDEPENDENTLY of the artifact: the
      // physical overwrite refreshes the path, which would make a
      // lazy (even cached) frame over the dir re-resolve against the
      // compacted files — the production contract is that a takedown
      // list arrives as data, not as a view of the index
      val delIds = idx.lists.where($"c_id" === c0)
        .select($"n_id").orderBy($"n_id").limit(3)
        .as[Long].collect().toSeq.toDF("n_id")
      val audit = Ann.takedownAudit(idx, delIds)
      assert(audit.where($"n_deleted" > 0).count() === 1)
      val untouched = idx.lists.select($"c_id").distinct()
        .as[Long].collect().filter(_ != c0).map(c => s"c_id=$c").toSeq
      def memb(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id", $"n_id").as[(Long, Long)].collect().toSet
      // the in-memory arm is evaluated BEFORE the physical rewrite:
      // an in-place overwrite invalidates lazy frames over the dir
      // (the standard Spark overwrite hazard migrateIndexDir documents)
      val inMem = memb(Ann.deleteFromIndex(idx, delIds).lists)
      val before = fileSnap(s"$dir/lists", untouched)
      Ann.deleteFromIndexDir(spark, dir, delIds)
      assert(fileSnap(s"$dir/lists", untouched) === before,
        "untouched partitions must keep their files byte-identical")
      val reloaded = Ann.readIndex(spark, dir)
      // physical == in-memory takedown
      assert(memb(reloaded.lists) === inMem)
      // == rebuild of the lists over the surviving corpus against the
      // SAME centroids (takedown never retrains)
      val surv = base.join(delIds.withColumnRenamed("n_id", "vec_id"),
        Seq("vec_id"), "left_anti")
      val rebuilt = Ann.buildLists(surv,
        Ann.centTable(idx.centroids, "c_id", "c_vec"),
        "vec_id", "embedding")
      assert(memb(reloaded.lists) === memb(rebuilt))
      // probes over the compacted dir == probes over the rebuild
      val queries = emb.where($"vec_id" < 5)
      def probe(i: Ann.IvfIndex) =
        Ann.indexedTopK(i, queries, "vec_id", "embedding",
            nprobe = 2, k = 5)
          .select($"q_id", $"rank", $"n_id")
          .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(probe(reloaded) ===
        probe(Ann.IvfIndex(idx.centroids, rebuilt)))
    } finally rmDir(dir)
  }

  test("takedown: label-partitioned lists delete only touches the " +
      "deleted members' (label, c_id) partitions") {
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val dir = tmpDir("graft-ivf-label-del")
    try {
      Ann.writeIndexByLabel(base, "vec_id", "embedding", k = 4,
        iters = 2, dir)
      val idx = Ann.readIndexByLabel(spark, dir)
      val delIds = idx.lists.select($"n_id").orderBy($"n_id").limit(5)
        .as[Long].collect().toSeq.toDF("n_id")
      def memb(df: org.apache.spark.sql.DataFrame) =
        df.select($"c_id", $"n_id", $"label")
          .as[(Long, Long, String)].collect().toSet
      val inMem = memb(Ann.deleteFromIndex(idx, delIds).lists)
      Ann.deleteFromIndexDir(spark, dir, delIds,
        partCols = Seq("label", "c_id"))
      val reloaded = Ann.readIndexByLabel(spark, dir)
      assert(memb(reloaded.lists) === inMem)
    } finally rmDir(dir)
  }

  test("takedown: dedup-index bucket delete equals buildIndex of the " +
      "surviving corpus, untouched buckets byte-identical") {
    val dir = tmpDir("graft-dedup-del")
    try {
      Dedup.writeIndex(docs, "doc_id", "text", k = 48, bands = 24, dir)
      val idx = Dedup.readIndex(spark, dir)
      // one deleted doc -> exactly one touched bucket per table
      val delDid = docs.select($"doc_id").orderBy($"doc_id")
        .head().getLong(0)
      val delIds = Seq(delDid).toDF("did")
      val bk = delDid % Dedup.IndexBuckets
      val untouched = (0L until Dedup.IndexBuckets.toLong)
        .filter(_ != bk).map(b => s"bk=$b/") // slash: bk=1 vs bk=1x
      val beforeSh = fileSnap(s"$dir/shingles", untouched)
      val beforeBd = fileSnap(s"$dir/bands", untouched)
      Dedup.deleteFromIndexDir(spark, dir, delIds)
      assert(fileSnap(s"$dir/shingles", untouched) === beforeSh)
      assert(fileSnap(s"$dir/bands", untouched) === beforeBd)
      val reloaded = Dedup.readIndex(spark, dir)
      val surv = docs.where($"doc_id" =!= delDid)
      val rebuilt = Dedup.buildIndex(surv, "doc_id", "text", 48, 24)
      def shs(i: Dedup.DedupIndex) = i.shingles
        .select($"did", $"n").as[(Long, Long)].collect().toSet
      def bds(i: Dedup.DedupIndex) = i.bands
        .select($"did", $"band_idx").groupBy($"did")
        .count().as[(Long, Long)].collect().toSet
      assert(shs(reloaded) === shs(rebuilt))
      assert(bds(reloaded) === bds(rebuilt))
    } finally rmDir(dir)
  }

  test("takedown: window-index decrement equals buildWindowIndex of " +
      "the surviving corpus (in-memory and on disk)") {
    val dir = tmpDir("graft-widx-del")
    try {
      Dedup.writeWindowIndex(docs, "doc_id", "text", 16, dir)
      val widx = Dedup.readWindowIndex(spark, dir)
      val delDid = docs.select($"doc_id").orderBy($"doc_id")
        .head().getLong(0)
      val deleted = docs.where($"doc_id" === delDid)
      val surv = docs.where($"doc_id" =!= delDid)
      def hs(df: org.apache.spark.sql.DataFrame) =
        df.select($"h", $"nd").as[(Long, Long)].collect().toSet
      val expected = hs(Dedup.buildWindowIndex(surv, "doc_id", "text", 16))
      assert(hs(Dedup.decrementWindowIndex(widx, deleted, "doc_id",
        "text", 16)) === expected)
      Dedup.deleteFromWindowIndexDir(spark, dir, deleted, "doc_id",
        "text", 16)
      assert(hs(Dedup.readWindowIndex(spark, dir).hashes) === expected)
    } finally rmDir(dir)
  }

  test("takedown: window-index delete drained-bucket fallback equals " +
      "the survivor rebuild") {
    val dir = tmpDir("graft-widx-drain")
    try {
      // tiny fixture: doc 2's two window hashes live in buckets no
      // survivor hash occupies, so its takedown DRAINS buckets and
      // forces the full-rewrite fallback (asserted below, not assumed)
      val tiny = Seq((1L, "aa bb"), (2L,
        (0 until 40).map(i => s"t$i").mkString(" ")),
        (3L, "aa bb")).toDF("doc_id", "text")
      Dedup.writeWindowIndex(tiny, "doc_id", "text", 2, dir)
      val deleted = tiny.where($"doc_id" === 2L)
      val surv = tiny.where($"doc_id" =!= 2L)
      def bks(df: org.apache.spark.sql.DataFrame) =
        df.select(pmod($"h", lit(Dedup.IndexBuckets)))
          .distinct().as[Long].collect().toSet
      val before = bks(Dedup.buildWindowIndex(tiny, "doc_id", "text", 2))
      val survIdx = Dedup.buildWindowIndex(surv, "doc_id", "text", 2)
      assert((before -- bks(survIdx)).nonEmpty,
        "fixture must drain at least one bucket")
      Dedup.deleteFromWindowIndexDir(spark, dir, deleted, "doc_id",
        "text", 2)
      def hs(df: org.apache.spark.sql.DataFrame) =
        df.select($"h", $"nd").as[(Long, Long)].collect().toSet
      assert(hs(Dedup.readWindowIndex(spark, dir).hashes) === hs(survIdx))
    } finally rmDir(dir)
  }

  test("append: window-index increment equals buildWindowIndex of " +
      "corpus ∪ arrivals (in-memory and on disk), untouched buckets " +
      "byte-identical") {
    val dir = tmpDir("graft-widx-app")
    try {
      val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
      val arrivals = docs.where(pmod($"doc_id", lit(10)) >= 8)
      Dedup.writeWindowIndex(corpus, "doc_id", "text", 16, dir)
      val widx = Dedup.readWindowIndex(spark, dir)
      def hs(df: org.apache.spark.sql.DataFrame) =
        df.select($"h", $"nd").as[(Long, Long)].collect().toSet
      val expected = hs(Dedup.buildWindowIndex(
        corpus.unionByName(arrivals), "doc_id", "text", 16))
      assert(hs(Dedup.incrementWindowIndex(widx, arrivals, "doc_id",
        "text", 16)) === expected)
      Dedup.appendToWindowIndexDir(spark, dir, arrivals, "doc_id",
        "text", 16)
      assert(hs(Dedup.readWindowIndex(spark, dir).hashes) === expected)
    } finally rmDir(dir)
    // a TINY arrival (2 window hashes -> <=2 buckets) pins that the
    // physical append rewrites only touched buckets: the rest keep
    // their files byte-identical
    val dir2 = tmpDir("graft-widx-app2")
    try {
      val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
      Dedup.writeWindowIndex(corpus, "doc_id", "text", 16, dir2)
      val tiny = Seq((999999L,
        (0 until 17).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
      val touched = Dedup.buildWindowIndex(tiny, "doc_id", "text", 16)
        .select(pmod($"h", lit(Dedup.IndexBuckets))).distinct()
        .as[Long].collect().toSet
      assert(touched.nonEmpty && touched.size < Dedup.IndexBuckets,
        "fixture must leave some buckets untouched")
      // trailing slash: prefix "bk=1" would also match bk=10/bk=13
      val untouched = (0L until Dedup.IndexBuckets.toLong)
        .filterNot(touched).map(b => s"bk=$b/")
      val before = fileSnap(s"$dir2/windows", untouched)
      Dedup.appendToWindowIndexDir(spark, dir2, tiny, "doc_id",
        "text", 16)
      assert(fileSnap(s"$dir2/windows", untouched) === before)
      def hs2(df: org.apache.spark.sql.DataFrame) =
        df.select($"h", $"nd").as[(Long, Long)].collect().toSet
      assert(hs2(Dedup.readWindowIndex(spark, dir2).hashes) ===
        hs2(Dedup.buildWindowIndex(corpus.select($"doc_id", $"text")
          .unionByName(tiny), "doc_id", "text", 16)))
    } finally rmDir(dir2)
  }

  test("takedown: keeper map rebuilt from the compacted index equals " +
      "deduplicate of survivors; deleting a bridge doc splits") {
    // chain A~B~C (J=0.6 adjacent — above the banding's reliable
    // band, J=0.33 across) + distant D: the before-map is one {A,B,C}
    // cluster; deleting bridge B leaves A,C dissimilar -> the
    // after-map is EMPTY (components split away, which a row
    // tombstone on the old map could not express).
    val d = Seq(
      (1L, "t1 t2 t3 t4 t5 t6"), (2L, "t2 t3 t4 t5 t6 t7"),
      (3L, "t3 t4 t5 t6 t7 t8"), (9L, "zz yy xx ww vv uu")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildIndex(d, "doc_id", "text", 48, 24)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select($"did", $"keeper").as[(Long, Long)].collect().toSet
    val before = m(Dedup.clustersFromIndex(idx, 0.5))
    assert(before === m(Dedup.deduplicate(d, "doc_id", "text", 0.5)
      .select($"doc_id".as("did"), $"keeper")))
    assert(before === Set((1L, 1L), (2L, 1L), (3L, 1L)))
    val compacted = Dedup.deleteFromIndex(idx, Seq(2L).toDF("did"))
    val after = m(Dedup.clustersFromIndex(compacted, 0.5))
    val survDedup = m(Dedup.deduplicate(
        d.where($"doc_id" =!= 2L), "doc_id", "text", 0.5)
      .select($"doc_id".as("did"), $"keeper"))
    assert(after === survDedup)
    assert(after === Set.empty[(Long, Long)])
  }

  test("takedown: clustersFromIndex equals deduplicate on the sf corpus") {
    val idx = Dedup.buildIndex(docs, "doc_id", "text", 48, 24)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select($"did", $"keeper").as[(Long, Long)].collect().toSet
    assert(m(Dedup.clustersFromIndex(idx, 0.5)) ===
      m(Dedup.deduplicate(docs, "doc_id", "text", 0.5)
        .select($"doc_id".as("did"), $"keeper")))
  }

  test("ann pareto table: 7 members, exact row is the recall-1 full " +
      "scan, funnels and probes priced consistently") {
    val corpus = emb.where($"vec_id" >= 5)
    val queries = emb.where($"vec_id" < 5)
    val out = Ann.paretoTable(corpus, queries, "vec_id", "embedding")
      .collect().map(r => (r.getAs[String]("method"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_rescored"),
        r.getAs[Long]("bytes_per_vector"), r.getAs[Long]("recall_ppm")))
      .toSeq
    assert(out.map(_._1) === Seq("exact", "lsh8", "ivf_np2", "int8",
      "pq8x16", "ivfpq", "hamming64"))
    val nc = corpus.count(); val nq = queries.count()
    val byM = out.map(t => t._1 -> t).toMap
    // exact: full scan, no rescore, perfect recall, raw floats
    assert(byM("exact") === ("exact", nc * nq, 0L, 256L, 1000000L))
    // scan-everything members price the full compressed scan
    Seq("int8", "pq8x16", "hamming64").foreach { m =>
      assert(byM(m)._2 === nc * nq, s"$m candidates") }
    // bucketed members scan strictly less than the full corpus scan
    Seq("lsh8", "ivf_np2", "ivfpq").foreach { m =>
      assert(byM(m)._2 > 0L && byM(m)._2 < nc * nq, s"$m candidates") }
    // ivfpq probes the same coarse lists as ivf (same kmeansFit)
    assert(byM("ivfpq")._2 === byM("ivf_np2")._2)
    // rescore funnels at the registered widths
    assert(byM("int8")._3 === 15L * nq && byM("pq8x16")._3 === 50L * nq
      && byM("hamming64")._3 === 50L * nq && byM("ivfpq")._3 === 50L * nq)
    // compressed reps are smaller than floats; recalls in range
    out.foreach { case (m, _, _, b, rec) =>
      assert(b <= 264L && b >= 8L, s"$m bytes")
      assert(rec >= 0L && rec <= 1000000L, s"$m recall") }
    // the funnel members must beat chance on this corpus
    Seq("int8", "pq8x16", "hamming64").foreach { m =>
      assert(byM(m)._5 > 0L, s"$m recall zero") }
  }

  test("annFits DiskCache artifacts equal inline refits bit-for-bit " +
      "(train-once seam is a pure cache, never a semantic fork)") {
    val e = Tables.embeddings(spark, sf)
    val corpus = e.where($"vec_id" >= 5)
    val fits = graft.operators.PipelineSuite.annFits(spark, sf)
    def same(a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$what: cached != inline recompute")
    }
    val coarseInline =
      Ann.kmeansFit(corpus, "vec_id", "embedding", k = 8, iters = 2)
    same(fits.coarse.get, coarseInline, "coarse centroids")
    val pqRawInline = Ann.pqFit(corpus, "vec_id", "embedding",
      m = 8, subDim = 8, k = 16, iters = 2)
    same(fits.pqRaw.get, pqRawInline, "raw PQ codebooks")
    same(fits.rawCodes.get,
      Ann.pqCodes(corpus, "vec_id", "embedding", pqRawInline,
        m = 8, subDim = 8),
      "raw code table at rest")
    val residInline =
      Ann.ivfpqResiduals(corpus, "vec_id", "embedding", coarseInline)
        .cache()
    val pqResidInline = Ann.pqFit(residInline, "vec_id", "embedding",
      m = 8, subDim = 8, k = 16, iters = 2)
    same(fits.pqResid.get, pqResidInline, "residual PQ codebooks")
    same(fits.residCodes.get,
      Ann.pqCodes(residInline, "vec_id", "embedding", pqResidInline,
          m = 8, subDim = 8)
        .join(residInline.select($"vec_id".as("vid"), $"c_id", $"vn"),
          "vid"),
      "residual code table at rest")
  }

  test("print index: a first append into a missing path bootstraps " +
      "the index (append == build)") {
    val all = docs.select($"doc_id", $"text")
      .where(pmod($"doc_id", lit(5)) === 0L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prints-boot").toString + "/fresh"
    Dedup.appendToPrintIndexDir(spark, dir, all, "doc_id", "text", 4, 4)
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select($"did".cast("long"), $"h".cast("long"))
        .as[(Long, Long)].collect().toSet
    assert(pset(Dedup.readPrintIndex(spark, dir)) ===
      pset(Dedup.buildPrintIndex(all, "doc_id", "text", 4, 4)),
      "bootstrap append != build")
    // and the bootstrapped index behaves: the idempotency probe now
    // sees the created path, so re-appending is still a no-op
    Dedup.appendToPrintIndexDir(spark, dir, all, "doc_id", "text", 4, 4)
    val twice = Dedup.readPrintIndex(spark, dir)
    assert(twice.count() ===
      twice.select($"did", $"h").distinct().count(),
      "re-append after bootstrap duplicated print rows")
  }

  test("print index: append into a present-but-foreign path fails " +
      "loudly instead of silently skipping the idempotence probe") {
    // r15-advice medium: only a MISSING path bootstraps; a parquet
    // table at the path that is not a print index (no did/bk) must
    // fail the append, not disable the probe and insert duplicates
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prints-foreign").toString
    spark.range(3).toDF("zzz").write.parquet(dir + "/prints")
    intercept[org.apache.spark.sql.AnalysisException] {
      Dedup.appendToPrintIndexDir(spark, dir,
        docs.select($"doc_id", $"text").limit(5), "doc_id", "text", 4, 4)
    }
  }

  test("print index: append equals rebuild of corpus ∪ arrivals with " +
      "pre-existing files untouched; delete equals rebuild of the " +
      "survivors with untouched buckets byte-identical") {
    val all = docs.select($"doc_id", $"text")
    val corpus = all.where(pmod($"doc_id", lit(10)) < 8)
    val arrivals = all.where(pmod($"doc_id", lit(10)) >= 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prints").toString
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.select($"did".cast("long"), $"h".cast("long"))
        .as[(Long, Long)].collect().toSet
    def files(bk: Long) = {
      val p = java.nio.file.Paths.get(dir, "prints", s"bk=$bk")
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
    try {
      Dedup.writePrintIndex(corpus, "doc_id", "text", 4, 4, dir)
      // --- append: pure insert — EVERY pre-existing file survives
      val allBefore = (0L until Dedup.IndexBuckets.toLong)
        .map(b => b -> files(b)).toMap
      Dedup.appendToPrintIndexDir(spark, dir, arrivals,
        "doc_id", "text", 4, 4)
      assert(pset(Dedup.readPrintIndex(spark, dir)) ===
        pset(Dedup.buildPrintIndex(all, "doc_id", "text", 4, 4)),
        "append != rebuild of corpus ∪ arrivals")
      (0L until Dedup.IndexBuckets.toLong).foreach { b =>
        assert(allBefore(b).subsetOf(files(b)),
          s"append rewrote pre-existing files in bucket $b")
      }
      // --- double append: IDEMPOTENT (r13-verdict low) — re-running
      // the same batch append must not double-insert prints (the
      // did anti-join against the touched buckets)
      Dedup.appendToPrintIndexDir(spark, dir, arrivals,
        "doc_id", "text", 4, 4)
      val afterTwice = Dedup.readPrintIndex(spark, dir)
      assert(afterTwice.count() === afterTwice.select($"did", $"h")
        .distinct().count(), "double append duplicated print rows")
      assert(pset(afterTwice) ===
        pset(Dedup.buildPrintIndex(all, "doc_id", "text", 4, 4)),
        "double append != single append")
      // --- delete: a cross-cutting takedown subset
      val deleted = all.where(pmod($"doc_id", lit(7)) === 3L)
      val survivors = all.join(deleted.select($"doc_id"),
        Seq("doc_id"), "left_anti")
      val delBks = Dedup.buildPrintIndex(deleted, "doc_id", "text", 4, 4)
        .select(pmod($"h", lit(Dedup.IndexBuckets.toLong)))
        .distinct().as[Long].collect().toSet
      val untouched = (0L until Dedup.IndexBuckets.toLong)
        .filterNot(delBks)
      val beforeDel = untouched.map(b => b -> files(b)).toMap
      Dedup.deleteFromPrintIndexDir(spark, dir, deleted,
        "doc_id", "text", 4, 4)
      val surv = pset(Dedup.buildPrintIndex(survivors,
        "doc_id", "text", 4, 4))
      assert(pset(Dedup.readPrintIndex(spark, dir)) === surv,
        "delete != rebuild of survivors")
      // byte-identity holds unless a touched bucket drained (the
      // documented full-rewrite fallback)
      val drained = delBks.filter(b =>
        !surv.exists { case (_, h) =>
          Math.floorMod(h, Dedup.IndexBuckets.toLong) == b })
      if (drained.isEmpty)
        untouched.foreach { b =>
          assert(files(b) === beforeDel(b),
            s"untouched bucket $b was rewritten")
        }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
