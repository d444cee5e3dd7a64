package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** Unit specs for the corpus-level curation stats: domain mix,
  * eval-set contamination, and unigram-LM surprisal.
  */
class CorpusStatsSpec extends SparkSpec {

  test("at-rest LM/tokenizer artifacts equal inline refits bit-for-bit " +
      "(bigram, trigram, BPE merges, perplexity thresholds)") {
    import graft.model.Tables
    val docs = Tables.documents(spark, sf)
    val train = docs.where(pmod(col("doc_id"), lit(101)) =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.map(col).toSeq
      df.select(cols: _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
    def same(a: org.apache.spark.sql.DataFrame,
             b: org.apache.spark.sql.DataFrame, what: String): Unit =
      assert(rows(a) === rows(b), s"$what: artifact != inline refit")
    // bigram LM (the tag every c/d consumer of this split shares)
    val blm = CorpusStats.bigramLmCached(spark, sf, "mod101ne0",
      train, "text")
    val blmI = CorpusStats.bigramLm(train, "text")
    same(blm.uni, blmI.uni, "bigram uni")
    same(blm.big, blmI.big, "bigram big")
    same(blm.ctx, blmI.ctx, "bigram ctx")
    // trigram LM
    val tlm = CorpusStats.trigramLmCached(spark, sf, "mod101ne0",
      train, "text")
    val tlmI = CorpusStats.trigramLm(train, "text")
    same(tlm.tri, tlmI.tri, "trigram tri")
    same(tlm.ctx3, tlmI.ctx3, "trigram ctx3")
    // BPE merge table
    same(CorpusStats.bpeMergesCached(spark, sf, "mod101ne0-k3",
        train, "doc_id", "text", 3),
      CorpusStats.bpeMerges(train, "doc_id", "text", 3), "bpe merges")
    // perplexity thresholds (lm + tercile bins)
    val ref = docs.where(pmod(col("doc_id"), lit(10)) < 8)
    val (plm, pth) = CorpusStats.perplexityThresholdsCached(spark, sf,
      "mod10lt8", ref, "doc_id", "text")
    val (plmI, pthI) = CorpusStats.perplexityThresholds(ref,
      "doc_id", "text")
    same(plm.uni, plmI.uni, "perp lm uni")
    same(pth, pthI, "perp thresholds")
  }

  test("jackknifeInfluence: identities hold and a planted low-quality " +
      "source carries positive influence") {
    import graft.model.Tables
    import graft.operators.CorpusStats
    val out = CorpusStats.jackknifeInfluence(
        Tables.documents(spark, sf), "doc_id", "text", "source")
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("mean_q_ppm"),
        r.getAs[Long]("loo_mean_ppm"), r.getAs[Long]("full_mean_ppm"),
        r.getAs[Long]("influence_ppm"))).toSeq
    // identity: influence = loo - full, for every row
    assert(out.forall(r => r._6 === r._4 - r._5))
    // full_mean is the same constant on every row
    assert(out.map(_._5).distinct.size === 1)
    // sign law: a source whose own mean is BELOW the corpus mean must
    // have non-negative influence (removing it can't lower the mean),
    // modulo the 1-ppm integer-floor band
    out.foreach { r =>
      if (r._3 < r._5) assert(r._6 >= -1L,
        s"${r._1}: below-mean source with influence ${r._6}")
      if (r._3 > r._5) assert(r._6 <= 1L,
        s"${r._1}: above-mean source with influence ${r._6}")
    }
    // planted: appending a junk source (quality ~0 docs) must yield a
    // strictly positive influence for it
    import spark.implicits._
    val junk = (1 to 20).map(i =>
      (100000L + i, "x x x x x x x x x x x x x x x x", "junksrc"))
      .toDF("doc_id", "text", "source")
    val docs2 = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"source").unionByName(junk)
    val j = CorpusStats.jackknifeInfluence(docs2, "doc_id", "text",
        "source")
      .where($"source" === "junksrc")
      .select($"influence_ppm").as[Long].head()
    assert(j > 0L, s"junk source influence $j not positive")
  }
  import spark.implicits._

  test("jackknifeInfluence: single-source corpus is defined (loo = " +
      "full mean, influence 0), never NULL/div-by-zero") {
    val docs = Seq(
      (1L, "aa bb cc dd ee", "only"),
      (2L, "ff gg hh ii jj", "only")).toDF("doc_id", "text", "source")
    val r = CorpusStats.jackknifeInfluence(docs, "doc_id", "text",
      "source").collect()
    assert(r.length === 1)
    assert(!r(0).isNullAt(r(0).fieldIndex("loo_mean_ppm")))
    assert(r(0).getAs[Long]("loo_mean_ppm") ===
      r(0).getAs[Long]("full_mean_ppm"))
    assert(r(0).getAs[Long]("influence_ppm") === 0L)
  }

  test("domainMix: shares sum to ~1 and temperature flattens the mix") {
    val docs = Seq(
      (1L, "a b c d e f g h", "web"),
      (2L, "a b c d e f g h", "web"),
      (3L, "a b c d e f g h", "web"),
      (4L, "a b", "books")).toDF("doc_id", "text", "source")
    val out = CorpusStats.domainMix(docs, "source", "text")
      .orderBy($"source").collect()
    val web = out.find(_.getAs[String]("source") == "web").get
    val books = out.find(_.getAs[String]("source") == "books").get
    assert(web.getAs[Long]("n_docs") == 3 && web.getAs[Long]("n_tokens") == 24)
    assert(books.getAs[Long]("n_tokens") == 2)
    // raw: 24/26 vs 2/26; temp (isqrt): 4/5 vs 1/5 — flatter
    assert(web.getAs[Long]("raw_share_ppm") > web.getAs[Long]("temp_share_ppm"))
    assert(books.getAs[Long]("raw_share_ppm") < books.getAs[Long]("temp_share_ppm"))
    // exact integer ppm: floor(24e6/26)=923076, floor(2e6/26)=76923
    assert(web.getAs[Long]("raw_share_ppm") == 923076L)
    assert(books.getAs[Long]("raw_share_ppm") == 76923L)
    val rawSum = out.map(_.getAs[Long]("raw_share_ppm")).sum
    assert(math.abs(rawSum - 1000000L) <= out.length) // floor slack
  }

  test("contamination: shared-shingle overlap against the eval side only") {
    val docs = Seq(
      // eval doc (id 0): shingles of "w x y z" = {w x y, x y z}
      (0L, "w x y z"),
      // train doc sharing both shingles -> overlap 1.0
      (1L, "w x y z q"),
      // train doc sharing one ("x y z") -> overlap 0.5
      (2L, "p x y z"),
      // train doc sharing none
      (3L, "a b c d"),
      // another eval doc — must never appear as train
      (37L, "w x y z")).toDF("doc_id", "text")
    val out = CorpusStats.contamination(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(37)) === 0, minOverlap = 0.4)
      .orderBy($"train_id", $"eval_id").collect()
    val pairs = out.map(r => (r.getAs[Long]("train_id"),
      r.getAs[Long]("eval_id"), r.getAs[Long]("overlap_ppm"))).toSeq
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      Set((1L, 0L), (1L, 37L), (2L, 0L), (2L, 37L)))
    assert(pairs.filter(_._1 == 1L).forall(_._3 == 1000000L))
    assert(pairs.filter(_._1 == 2L).forall(_._3 == 500000L))
  }

  test("vocabStats: zipf head ranked by freq, hapax and totals correct") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b rare")).toDF("doc_id", "text")
    val out = CorpusStats.vocabStats(docs, "doc_id", "text", topK = 2)
      .orderBy($"rank").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("cnt") == 4L) // 'a' x4
    assert(out(1).getAs[Long]("cnt") == 3L) // 'b' x3
    assert(out(0).getAs[Long]("n_total") == 9L)
    assert(out(0).getAs[Long]("n_distinct") == 4L)
    assert(out(0).getAs[Long]("n_hapax") == 2L) // 'c', 'rare'
    assert(out(0).getAs[Long]("share_ppm") == 4L * 1000000L / 9L) // floor
  }

  test("applyMixture: budget respected in expectation, small sources kept whole") {
    import graft.operators.Sampling
    val docs = ((1L to 400L).map(i => (i, ("w " * 10).trim, "web")) ++
      (401L to 410L).map(i => (i, ("b " * 10).trim, "books")))
      .toDF("doc_id", "text", "source")
    val out = Sampling.applyMixture(docs, "source", "doc_id", "text",
        budgetPpm = 500000L)
      .orderBy($"source").collect()
    val web = out.find(_.getAs[String]("source") == "web").get
    val books = out.find(_.getAs[String]("source") == "books").get
    // books (tiny source, flattened share > its raw share) keeps all
    assert(books.getAs[Long]("quota_ppm") == 1000000L)
    assert(books.getAs[Long]("n_kept") == 10L)
    // web is down-sampled; kept fraction tracks its quota within
    // hash-uniformity noise
    val q = web.getAs[Long]("quota_ppm").toDouble / 1e6
    assert(q < 1.0)
    val frac = web.getAs[Long]("n_kept").toDouble / 400
    assert(math.abs(frac - q) < 0.12, s"kept $frac vs quota $q")
    // deterministic: identical on re-run
    val again = Sampling.applyMixture(docs, "source", "doc_id", "text",
        budgetPpm = 500000L).orderBy($"source").collect()
    assert(again.map(_.toString).toSeq == out.map(_.toString).toSeq)
  }

  test("epochRepeat: hand-checked epoch factors, exact copy indices, " +
      "deterministic fractional assignment") {
    import graft.operators.Sampling
    val docs = ((1L to 400L).map(i => (i, ("w " * 10).trim, "web")) ++
      (401L to 440L).map(i => (i, ("b " * 10).trim, "books")))
      .toDF("doc_id", "text", "source")
    val audit = Sampling.epochAudit(docs, "source", "doc_id", "text",
        budgetPpm = 2500000L)
      .orderBy($"source").collect()
    val books = audit.find(_.getAs[String]("source") == "books").get
    val web = audit.find(_.getAs[String]("source") == "web").get
    // hand-checked: tokens web=4000 books=400, budget=11000,
    // isq 63+20=83 -> books target=220000 div 83=2650,
    // epochs=2650e6 div 400=6625000; web target=693000 div 83=8349,
    // epochs=8349e6 div 4000=2087250
    assert(books.getAs[Long]("epochs_ppm") == 6625000L)
    assert(web.getAs[Long]("epochs_ppm") == 2087250L)
    // every doc gets floor(epochs) copies; the fractional extra is
    // within hash-uniformity noise of the remainder
    val bn = books.getAs[Long]("n_emitted")
    assert(bn >= 6 * 40 && bn <= 7 * 40)
    assert(math.abs(bn - (6 * 40 + 0.625 * 40)) <= 8, s"books $bn")
    val wn = web.getAs[Long]("n_emitted")
    assert(wn >= 2 * 400 && wn <= 3 * 400)
    assert(math.abs(wn - (2 * 400 + 0.08725 * 400)) <= 25, s"web $wn")
    // token mass rides the docs (10 tokens each) and realized_ppm is
    // the emitted/base ratio of the same numbers
    assert(books.getAs[Long]("tokens_emitted") == bn * 10)
    assert(books.getAs[Long]("realized_ppm") == bn * 10_000_000L / 400L)
    // the emitted frame: per doc exactly n_copies rows with copy
    // indices 0..n_copies-1 (distinct, contiguous)
    val rep = Sampling.epochRepeat(docs, "source", "doc_id", "text",
      budgetPpm = 2500000L)
    val perDoc = rep.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), countDistinct($"copy").as("nd"),
        max($"copy").as("mx"))
      .collect()
    assert(perDoc.forall(r => r.getAs[Long]("n") == r.getAs[Long]("nd")
      && r.getAs[Long]("mx") == r.getAs[Long]("n") - 1))
    // audit aggregates the emitted frame
    assert(rep.where($"source" === "books").count() == bn)
    // deterministic on re-run
    val again = Sampling.epochAudit(docs, "source", "doc_id", "text",
        budgetPpm = 2500000L).orderBy($"source").collect()
    assert(again.map(_.toString).toSeq == audit.map(_.toString).toSeq)
  }

  test("unigramSurprisal: rare tokens score more bits than common ones") {
    // corpus: 'the' x 8, 'rare' x 1, others fill to N=16 tokens
    val docs = Seq(
      (1L, "the the the the the the the the"),
      (2L, "rare one two three four five six seven"))
      .toDF("doc_id", "text")
    val out = CorpusStats.unigramSurprisal(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    // doc 1: every token 'the' (cnt 8, N 16) -> bits = len(bin(2)) = 2
    assert(out(0).getAs[Long]("n_tokens") == 8)
    assert(out(0).getAs[Long]("mean_bits_ppm") == 2000000L)
    // doc 2: every token unique (cnt 1, N 16) -> bits = len(bin(16)) = 5
    assert(out(1).getAs[Long]("mean_bits_ppm") == 5000000L)
  }

  test("bigramCounts: hand-checked merge head, single-token docs drop") {
    val docs = Seq(
      (1L, "a b a b c"), // pairs: "a b", "b a", "a b", "b c"
      (2L, "a b"),       // pair:  "a b"
      (3L, "x")          // no pairs
    ).toDF("doc_id", "text")
    val out = CorpusStats.bigramCounts(docs, "text", topK = 2)
      .orderBy($"rank").collect()
    // 5 pairs total, 3 distinct; head: "a b" x3 then "b a" (tie with
    // "b c" at 1, lexicographic)
    assert(out.length == 2)
    assert(out(0).getAs[String]("pair") == "a b")
    assert(out(0).getAs[Long]("cnt") == 3L)
    assert(out(0).getAs[Long]("share_ppm") == 600000L) // 3e6 div 5
    assert(out(1).getAs[String]("pair") == "b a")
    assert(out(1).getAs[Long]("cnt") == 1L)
    assert(out.forall(_.getAs[Long]("n_pairs") == 5L))
    assert(out.forall(_.getAs[Long]("n_distinct") == 3L))
  }

  test("bpeTrain: hand-checked 3-round merge list, greedy re-segmentation") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpeTrain(docs, "doc_id", "text", k = 3)
      .orderBy($"step").collect()
    assert(out.length == 3)
    // round 1: (a,b)x3 of 5 pairs; merge -> doc1 [a b, a b, c], doc2 [a b]
    assert(out(0).getAs[String]("pair") == "a b")
    assert(out(0).getAs[Long]("cnt") == 3L)
    assert(out(0).getAs[Long]("n_pairs") == 5L)
    // round 2: ("a b","a b") and ("a b","c") tie at 1 -> lexicographic
    // smaller b wins; greedy left-to-right merges ONE pair of doc1's
    // [a b, a b, c] (non-overlapping) -> [a b a b, c]
    assert(out(1).getAs[String]("pair") == "a b a b")
    assert(out(1).getAs[Long]("cnt") == 1L)
    assert(out(1).getAs[Long]("n_pairs") == 2L)
    // round 3: only ("a b a b","c") remains
    assert(out(2).getAs[String]("pair") == "a b a b c")
    assert(out(2).getAs[Long]("cnt") == 1L)
    assert(out(2).getAs[Long]("n_pairs") == 1L)
  }

  test("bpeEncode: per-doc sizes track the hand-checked merge cascade") {
    // same corpus as the bpeTrain test; merges are "a b", "a b a b",
    // "a b a b c", so doc 1 collapses 5 -> 1 tokens, doc 2 2 -> 1
    // (round 1's merge), doc 3 is untouched
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpeEncode(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_raw"),
      r.getAs[Long]("n_enc"), r.getAs[Long]("saved_ppm"))).toSeq ===
      Seq((1L, 5L, 1L, 800000L), (2L, 2L, 1L, 500000L), (3L, 1L, 1L, 0L)))
  }

  test("bpeApply: trained merges encode held-out docs, unknown tokens " +
      "pass through") {
    val train = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val merges = CorpusStats.bpeMerges(train, "doc_id", "text", k = 3)
    // held-out doc "a b c a b": merge 1 ("a b") fires twice -> 3
    // tokens; merges 2/3 need adjacency that doesn't occur here;
    // "z z" shares no vocabulary -> untouched
    val apply = Seq(
      (10L, "a b c a b"),
      (11L, "z z")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpeApply(merges, apply, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_raw"),
      r.getAs[Long]("n_enc"), r.getAs[Long]("saved_ppm"))).toSeq ===
      Seq((10L, 5L, 3L, 400000L), (11L, 2L, 2L, 0L)))
    // applying to the training corpus itself reproduces bpeEncode
    val viaApply = CorpusStats.bpeApply(merges, train, "doc_id", "text",
        k = 3)
      .orderBy($"doc_id").collect().toSeq
    val viaEncode = CorpusStats.bpeEncode(train, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect().toSeq
    assert(viaApply === viaEncode)
  }

  test("bigramSurprisal: hit, backoff and OOV paths hand-checked") {
    // train: cnt1 = {a:3, b:2, c:1}, N=6; cnt2 = {(a,b):2, (b,a):1,
    // (a,c):1}; ctx = {a:3, b:1}
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // score "a b z c": first token a = unigram, no penalty:
    // bitlen(6/3)=2; (a,b) bigram hit: bitlen(3/2)=1; (b,z) OOV:
    // bitlen(6)+2=5; (z,c) backoff: bitlen(6/1)+1=4 -> 12 bits over 4
    val score = Seq((10L, "a b z c")).toDF("doc_id", "text")
    val out = CorpusStats.bigramSurprisal(train, score, "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bigram"),
      r.getAs[Long]("n_backoff"), r.getAs[Long]("n_oov"),
      r.getAs[Long]("mean_bits_ppm")) === ((4L, 1L, 2L, 1L, 3000000L)))
  }

  test("trigramSurprisal: all four backoff paths hand-checked") {
    // train "a b a b a": uni {a:3,b:2}, N=5; tri (with -1 padding)
    // {(-1,-1,a):1, (-1,a,b):1, (a,b,a):2, (b,a,b):1}; big
    // {(-1,a):1, (a,b):2, (b,a):2}; ctx3 {(-1,-1):1, (-1,a):1,
    // (a,b):2, (b,a):1}; ctx2 {-1:1, a:2, b:2}
    val train = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    // "a b z a": tri-hit bitlen(1/1)=1, tri-hit 1, OOV bitlen(5)+3=6,
    //   uni-backoff bitlen(5/3)+2=3 -> 11 bits / 4 = 2750000 ppm
    // "b a b a": uni-backoff bitlen(5/2)+2=4 ((-1,-1,b) and (-1,b)
    //   unseen), big-backoff bitlen(2/2)+1=2, tri-hit 1, tri-hit 1
    //   -> 8 bits / 4 = 2000000 ppm
    val score = Seq((10L, "a b z a"), (11L, "b a b a"))
      .toDF("doc_id", "text")
    val out = CorpusStats.trigramSurprisal(train, score, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out.length == 2)
    def row(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tri"),
        r.getAs[Long]("n_big"), r.getAs[Long]("n_uni"),
        r.getAs[Long]("n_oov"), r.getAs[Long]("mean_bits_ppm"))
    assert(row(out(0)) === ((4L, 2L, 0L, 1L, 1L, 2750000L)))
    assert(row(out(1)) === ((4L, 2L, 1L, 1L, 0L, 2000000L)))
  }

  test("vocabCoverage: per-group OOV at both vocab tiers hand-checked") {
    // train vocab: a:2, b:1, c:1 (b and c are hapax — pruned at min2)
    val train = Seq((1L, "a a b c")).toDF("doc_id", "text")
    // X "a b d": 3 types / 3 occ; d is OOV (1/1); min2 also drops b
    //   (hapax) -> 2/2; type_cov = occ_cov = 2/3 = 666666 ppm
    // Y "a a a": fully covered at both tiers
    val eval = Seq((10L, "a b d", "X"), (11L, "a a a", "Y"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.vocabCoverage(train, eval, "source", "text")
      .orderBy($"source").collect()
    def row(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_types"), r.getAs[Long]("n_occ"),
        r.getAs[Long]("oov_types"), r.getAs[Long]("oov_occ"),
        r.getAs[Long]("oov_types_min2"), r.getAs[Long]("oov_occ_min2"),
        r.getAs[Long]("type_cov_ppm"), r.getAs[Long]("occ_cov_ppm"))
    assert(out.map(_.getAs[String]("source")).toSeq === Seq("X", "Y"))
    assert(row(out(0)) === ((3L, 3L, 1L, 1L, 2L, 2L, 666666L, 666666L)))
    assert(row(out(1)) === ((1L, 3L, 0L, 0L, 0L, 0L, 1000000L, 1000000L)))
  }

  test("bpeBatchTrain: dominance selection + underfilled round hand-checked") {
    // round 1 pairs: ab:3, cd:3, bc:2, ba:1, dc:1 -> ranked ab, cd,
    // bc, ba, dc; bc/ba/dc all share a symbol with a higher rank ->
    // sel = [(a b, 3), (c d, 3)] (disjoint, both apply)
    // round 2 (docs now [ab ab cd cd] and [ab cd]): (ab,cd):2,
    // (ab,ab):1, (cd,cd):1 -> rk2/rk3 each share a symbol with rk1
    // -> sel = just ("a b c d", 2): the round underfills (m=2)
    val docs = Seq((1L, "a b a b c d c d"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val out = CorpusStats.bpeBatchTrain(docs, "doc_id", "text",
        rounds = 2, m = 2)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[Long]("j"),
        r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(out === Seq((1L, 1L, "a b", 3L), (1L, 2L, "c d", 3L),
      (2L, 1L, "a b c d", 2L)))
  }

  test("mooreLewisSelect: in-domain-like doc outranks background-like") {
    // in-domain speaks (x, y); the general corpus speaks both
    // dialects. Candidate A is pure in-domain, candidate B pure
    // background: A must rank first with the larger delta (B is OOV
    // under the in-domain LM -> bits_in(B) high -> delta(B) low/neg).
    val inD = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val gen = Seq((1L, "x y x y x y"), (2L, "p q p q p q"))
      .toDF("doc_id", "text")
    val cands = Seq((10L, "x y x y"), (11L, "p q p q"))
      .toDF("doc_id", "text")
    val out = CorpusStats.mooreLewisSelect(inD, gen, cands,
        "doc_id", "text", topK = 2).collect()
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(10L, 11L))
    assert(out(0).getAs[Long]("delta_ppm") >
      out(1).getAs[Long]("delta_ppm"))
  }

  test("bpeFertility: unserved language shows zero compression") {
    // merges train on doc 1 only (trainFilter) -> k=1 merge = (x, y);
    // lang xx compresses 4 -> 2 tokens, lang pp (never in training,
    // shares no symbols) stays 4 -> 4: saved_ppm 500000 vs 0
    val docs = Seq((1L, "x y x y", "xx"), (2L, "p q p q", "pp"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusStats.bpeFertility(docs, "doc_id", "text", "lang",
        trainFilter = $"doc_id" === 1L, k = 1)
      .orderBy($"lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_raw"), r.getAs[Long]("n_enc"),
        r.getAs[Long]("saved_ppm"))).toSeq
    assert(out === Seq(("pp", 1L, 4L, 4L, 0L), ("xx", 1L, 4L, 2L, 500000L)))
  }

  test("sourceDrift: identical mix scores 0, disjoint sources score 1e6") {
    // A and B are fully disjoint single-token sources of equal size:
    // corpus = 50/50, each source is all-or-nothing per bucket, so
    // l1 = |1e6-5e5| + |0-5e5| = 1e6 for both. C matches the corpus
    // of the (C,D) pair exactly -> 0.
    val skewed = Seq(
      (1L, "a a a a", "A"), (2L, "b b b b", "B")
    ).toDF("doc_id", "text", "source")
    val outS = CorpusStats.sourceDrift(skewed, "source", "text", 1024)
      .orderBy($"source").collect()
    assert(outS.map(_.getAs[Long]("l1_ppm")).toSeq === Seq(1000000L, 1000000L))
    assert(outS.forall(_.getAs[Long]("n_tokens") == 4L))
    assert(outS.forall(_.getAs[Long]("n_buckets") == 1L))
    val uniform = Seq(
      (1L, "a b", "C"), (2L, "a b", "D")
    ).toDF("doc_id", "text", "source")
    val outU = CorpusStats.sourceDrift(uniform, "source", "text", 1024)
      .orderBy($"source").collect()
    assert(outU.map(_.getAs[Long]("l1_ppm")).toSeq === Seq(0L, 0L))
  }

  test("bpeCurve: per-round totals track the hand-checked cascade") {
    // bpeTrain's corpus: raw 8 tokens; merges "a b" -> 5, "a b a b"
    // -> 4, "a b a b c" -> 3 (greedy non-overlapping — round 1's
    // winner count 3 yet only 3 tokens disappear corpus-wide because
    // doc 1's overlap run "a b a b" merges twice, "a b" alone once)
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpeCurve(docs, "doc_id", "text", k = 3)
      .orderBy($"step").collect()
    assert(out.map(r => (r.getAs[Long]("step"), r.getAs[String]("pair"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("saved_ppm"))).toSeq ===
      Seq((0L, null, 8L, 0L), (1L, "a b", 5L, 375000L),
        (2L, "a b a b", 4L, 500000L), (3L, "a b a b c", 3L, 625000L)))
    assert(out(1).getAs[Long]("cnt") == 3L)
  }

  test("decontaminate: flagged train docs cut, eval docs in neither " +
      "column") {
    val docs = Seq(
      (0L, "w x y z", "web"),     // eval doc (id % 37 == 0)
      (1L, "w x y z q", "web"),   // train, shares both shingles -> cut
      (2L, "p x y z", "books"),   // train, shares one (overlap 0.5) -> cut
      (3L, "a b c d", "books"),   // train, clean
      (37L, "w x y z", "web")     // eval again
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.decontaminate(docs, "doc_id", "source", "text",
        pmod(col("doc_id"), lit(37)) === 0, minOverlap = 0.4)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("docs_cut"), r.getAs[Long]("tokens_cut")))
    assert(out.toSeq === Seq(
      ("books", 2L, 8L, 1L, 4L),   // doc 2 cut, doc 3 kept
      ("web", 1L, 5L, 1L, 5L)))    // doc 1 cut; eval docs absent
  }

  test("mixTemperatureCurve: alpha 0/0.5/1 shares hand-checked, " +
      "flattening is monotone") {
    val docs = Seq(
      (1L, (1 to 16).map(_ => "w").mkString(" "), "web"), // 16 tokens
      (2L, (1 to 4).map(_ => "w").mkString(" "), "books") // 4 tokens
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.mixTemperatureCurve(docs, "source", "text")
      .collect().map(r => ((r.getAs[Long]("alpha_ppm"),
        r.getAs[String]("source")), r.getAs[Long]("share_ppm"))).toMap
    // alpha 0: 1/2 each; alpha .5: isq 4 vs 2 -> 2/3 vs 1/3;
    // alpha 1: 16/20 vs 4/20
    assert(out((0L, "web")) === 500000L)
    assert(out((0L, "books")) === 500000L)
    assert(out((500000L, "web")) === 666666L)
    assert(out((500000L, "books")) === 333333L)
    assert(out((1000000L, "web")) === 800000L)
    assert(out((1000000L, "books")) === 200000L)
    // the knob is monotone: head share grows with alpha, tail shrinks
    assert(out((0L, "web")) < out((500000L, "web")))
    assert(out((500000L, "web")) < out((1000000L, "web")))
  }

  test("qualityCalibration: deciles bucket by the c9 score, averages " +
      "are integer ppm") {
    // all-distinct doc -> quality 0.4 + 0.3 + 0.03 = 0.73 (decile 7);
    // repetitive doc -> 0.4*0.1 + 0.3 + 0.03 = 0.37 (decile 3)
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, Seq.fill(10)("x").mkString(" "))
    ).toDF("doc_id", "text")
    val out = CorpusStats.qualityCalibration(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("avg_quality_ppm"),
        r.getAs[Long]("avg_surprisal_ppm")))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((3L, 1L, 10L), (7L, 1L, 10L)))
    assert(out(0)._4 === 370000L)
    assert(out(1)._4 === 730000L)
    // the repeated token is the common one -> lower surprisal
    assert(out(0)._5 < out(1)._5)
  }

  test("tfidfKeywords: rational tf-idf ranks distinctive terms first") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val out = CorpusStats.tfidfKeywords(docs, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("score_ppm")))
    // doc1: apple 2·1e6·2/(1·3)=1333333 > banana 1e6·2/(2·3)=333333
    // doc2: cherry 1e6·2/(1·2)=1000000 > banana 1e6·2/(2·2)=500000
    assert(out.toSeq === Seq(
      (1L, 1, "apple", 1333333L), (1L, 2, "banana", 333333L),
      (2L, 1, "cherry", 1000000L), (2L, 2, "banana", 500000L)))
  }

  test("dataCard: hand-checked duplication/language/size columns on a " +
      "crafted corpus; sf partition checks") {
    import graft.operators.CorpusStats
    // 2 sources; one cross-source exact duplicate pair; one 'en' doc
    val docs = Seq(
      (1L, "the quick brown fox", "a"),   // en marker 'the'
      (2L, "zz yy xx ww vv", "a"),
      (3L, "zz yy xx ww vv", "b"),        // dup of doc 2, other source
      (4L, "aa bb cc", "b")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.dataCard(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
         r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"),
         r.getAs[Long]("dup_docs"), r.getAs[Long]("en_docs"))).toMap
    // duplication is corpus-WIDE: docs 2 and 3 both count, one per source
    assert(out("a") === ((2L, 9L, 4L, 5L, 1L, 1L)))
    assert(out("b") === ((2L, 8L, 3L, 5L, 1L, 0L)))
    // sf corpus: cards partition the corpus, quality mass positive
    import graft.model.Tables
    val sfDocs = Tables.documents(spark, sf)
    val cards = CorpusStats.dataCard(sfDocs, "doc_id", "text", "source")
      .collect()
    assert(cards.map(_.getAs[Long]("n_docs")).sum === sfDocs.count())
    cards.foreach { r =>
      assert(r.getAs[Long]("q_sum_ppm") > 0L)
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
      assert(r.getAs[Long]("ks_ppm") >= 0L)
    }
  }

  test("perplexityBuckets: terciles cover the corpus, head reads lower " +
      "surprisal than tail, labels deterministic") {
    import graft.operators.CorpusStats
    import graft.model.Tables
    val docs = Tables.documents(spark, sf)
    val out = CorpusStats.perplexityBuckets(docs, "doc_id", "text",
        "source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("bucket_label"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
        r.getAs[Long]("sum_bits_ppm"))).toSeq
    // partition: every doc lands in exactly one bucket
    assert(out.map(_._3).sum === docs.count())
    val byLabel = out.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._5).sum)).toMap
    assert(byLabel.keySet === Set("head", "middle", "tail"))
    // terciles are balanced up to sketch-bucket granularity
    val n = docs.count()
    byLabel.values.foreach { case (cnt, _) =>
      assert(cnt > n / 10 && cnt < n * 6 / 10, s"lumpy tercile: $byLabel") }
    // the whole point: head = lowest mean surprisal, tail = highest
    def mean(l: String) = byLabel(l)._2.toDouble / byLabel(l)._1
    assert(mean("head") < mean("middle") && mean("middle") < mean("tail"),
      s"bucket means out of order: head=${mean("head")} " +
        s"middle=${mean("middle")} tail=${mean("tail")}")
    // deterministic
    val again = CorpusStats.perplexityBuckets(docs, "doc_id", "text",
        "source").collect().length
    assert(again === out.size)
  }
}
