package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Sampling, TextQuality}

/** Unit specs for the round-4 per-row curation operators: PII scrub,
  * repetition signals, stratified sampling, and the repetition gate
  * composed into Curate.
  */
class TextPipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("blobNearDup: block-mean hash bits and hamming hand-checked") {
    import graft.operators.Multimodal
    // n=8 -> only blocks k=8j+7 are nonempty (one byte each), so the
    // hash has bits at every 8th position. "aaaabbbb": tot=780,
    // a:97*8=776<780 -> 0, b:98*8=784>=780 -> 1 -> (hi, lo) =
    // (0, 0x01010101). "aaaabbba": tot=779 -> (0, 0x01010100).
    // "zzzzzzzz": uniform -> every block mean == total mean -> all
    // eight bits -> (0x01010101, 0x01010101).
    val docs = Seq((1L, "aaaabbbb"), (2L, "aaaabbba"), (3L, "zzzzzzzz"))
      .toDF("doc_id", "text")
    val h = Multimodal.blockMeanHash(docs, "doc_id", "text")
      .orderBy($"did").collect()
      .map(r => (r.getAs[Long]("hi"), r.getAs[Long]("lo"))).toSeq
    assert(h === Seq((0L, 16843009L), (0L, 16843008L),
      (16843009L, 16843009L)))
    val pairs = Multimodal.blobNearDup(docs, "doc_id", "text", tau = 6)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming"))).toSeq
    assert(pairs === Seq((1L, 2L, 1L), (1L, 3L, 4L), (2L, 3L, 5L)))
  }

  test("resizeGray8: hand-checked 4x4 -> 2x2 block means, ragged tail " +
      "block emits -1") {
    import graft.operators.Multimodal
    // w comes from the blob metadata (n_chars % 640 + 1): n_chars=3
    // -> w=4. 16 bytes 'a'..'p' as a 4x4 raster, 2x2 resize: each
    // output pixel is the floor-mean of its 2x2 block.
    val full = Seq((1L, "abcdefghijklmnop", 3L))
      .toDF("doc_id", "text", "n_chars")
    val px1 = Multimodal.resizeGray8(full, "doc_id", "text",
        ow = 2, oh = 2)
      .orderBy($"k").select($"px").as[Long].collect().toSeq
    assert(px1 === Seq(99L, 101L, 107L, 109L))
    // 6 bytes at w=4 -> h=2 with a ragged last row: the block whose
    // positions all fall past n emits -1
    val ragged = Seq((2L, "abcdef", 3L)).toDF("doc_id", "text", "n_chars")
    val px2 = Multimodal.resizeGray8(ragged, "doc_id", "text",
        ow = 2, oh = 2)
      .orderBy($"k").select($"px").as[Long].collect().toSeq
    assert(px2 === Seq(97L, 99L, 101L, -1L))
  }

  test("resizeGray8: randomized parity against a brute-force reference " +
      "(the closed-form inverse pixel index on arbitrary w/h/ragged shapes)") {
    import graft.operators.Multimodal
    // brute force follows the ORIGINAL block-boundary definition:
    // pixel (rk, ck) owns rows [rk*h div 8, (rk+1)*h div 8) x cols
    // [ck*w div 8, (ck+1)*w div 8), mean over positions < n, else -1
    def ref(bytes: Array[Int], w: Int): Map[Long, Long] = {
      val n = bytes.length
      val h = (n + w - 1) / w
      (0 until 64).map { k =>
        val (rk, ck) = (k / 8, k % 8)
        val (r0, r1) = (rk * h / 8, (rk + 1) * h / 8)
        val (c0, c1) = (ck * w / 8, (ck + 1) * w / 8)
        val ps = for {
          r <- r0 until r1; c <- c0 until c1
          p = r * w + c if p < n
        } yield bytes(p).toLong
        k.toLong -> (if (ps.nonEmpty) ps.sum / ps.size else -1L)
      }.toMap
    }
    val rnd = new scala.util.Random(1234)
    // n_chars drives w via (n_chars % 640 + 1); cover w in {1..12}
    // and lengths around ragged boundaries incl. tiny and sub-grid
    val cases = (1 to 40).map { i =>
      val w = 1 + rnd.nextInt(12)
      val n = 1 + rnd.nextInt(200)
      val text = (0 until n)
        .map(_ => (97 + rnd.nextInt(26)).toChar).mkString
      (i.toLong, text, (w - 1).toLong) // n_chars % 640 + 1 == w
    }
    val df = cases.toDF("doc_id", "text", "n_chars")
    val got = Multimodal.resizeGray8(df, "doc_id", "text")
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        r.getAs[Long]("k") -> r.getAs[Long]("px")).toMap).toMap
    cases.foreach { case (id, text, nc) =>
      val w = (nc % 640 + 1).toInt
      val expected = ref(text.map(_.toInt).toArray, w)
      assert(got(id) === expected, s"doc $id w=$w n=${text.length}")
    }
  }

  test("frameSample: hand-checked stride sampling, timestamps, means " +
      "and rolling hashes; short payload emits nothing") {
    import graft.operators.Multimodal
    val docs = Seq((1L, "abcdabcdabcd"), (2L, "abc"))
      .toDF("doc_id", "text")
    val got = Multimodal.frameSample(docs, "doc_id", "text",
        frameSize = 4, fps = 2, stride = 2)
      .orderBy($"doc_id", $"frame_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("ts_ms"), r.getAs[Long]("mean_x100"),
        r.getAs[Long]("fhash"))).toSeq
    // 12 bytes / frameSize 4 -> frames 0,1,2; stride 2 keeps 0 and 2
    // (identical "abcd" content -> same mean and hash); doc 2 has no
    // full frame and is absent
    val h = ((97L * 31 + 98) * 31 + 99) * 31 + 100 // < P, no mod hit
    assert(got === Seq(
      (1L, 0L, 0L, 9850L, h % 1000003L),
      (1L, 2L, 1000L, 9850L, h % 1000003L)))
  }

  test("curation funnel is monotone and ends at the c19 survivor set") {
    import graft.operators.Curate
    import graft.model.Tables
    val docs = Tables.documents(spark, sf)
    val f = Curate.funnel(docs, "doc_id", "text", minQuality = 0.63,
        tau = 0.5).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
    assert(f.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(f.sliding(2).forall { case Array(a, b) =>
      a._2 >= b._2 && a._3 >= b._3 })
    assert(f(0)._2 === docs.count())
    val survivors = Curate.curate(docs, "doc_id", "text",
      minQuality = 0.63, tau = 0.5).count()
    assert(f(3)._2 === survivors)
  }

  test("piiScrub redacts emails, phones and ids, and counts each class") {
    val docs = Seq(
      (1L, "mail bob@x.example.org and carol@y.example.net today"),
      (2L, "call +1-415-555-0042 about account AB123456"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextQuality.piiScrub(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2
      && out(0).getAs[String]("scrubbed") ==
        "mail <EMAIL> and <EMAIL> today")
    assert(out(1).getAs[Long]("n_phones") == 1
      && out(1).getAs[Long]("n_ids") == 1
      && out(1).getAs[String]("scrubbed") ==
        "call <PHONE> about account <ID>")
    assert(out(2).getAs[Long]("n_redactions") == 0
      && out(2).getAs[String]("scrubbed") == "no pii here at all")
  }

  test("gopherRules: hand-checked per-rule fail counts and keep gate") {
    // minTok=5/maxTok=10 so the length band bites at spec scale.
    // Per doc (all integer comparisons recomputed by hand):
    //  d1 all five rules pass (chars=16 in [15,50], stop {the,is});
    //  d2 n=2 < 5 fails len; no 2 distinct markers fails stop;
    //  d3 chars=5 < 3*5 fails wordlen; stop {a} fails stop;
    //  d4 3 of 5 words alphabetic (15 < 20) fails alpha only;
    //  d5 five '#' chars (50 > 5) fails symbol only.
    val docs = Seq(
      ("s1", 1L, "the cats sat is mats"),
      ("s1", 2L, "xxx yyy"),
      ("s1", 3L, "a b c d e"),
      ("s1", 4L, "thee of is 1111 2222"),
      ("s1", 5L, "the is aa# bb## cc##"),
      ("s2", 6L, "the of cats sat mat"))
      .toDF("source", "doc_id", "text")
    val out = TextQuality.gopherRules(docs, "doc_id", "text", "source",
        minTok = 5L, maxTok = 10L)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("fail_len"),
        r.getAs[Long]("fail_wordlen"), r.getAs[Long]("fail_symbol"),
        r.getAs[Long]("fail_alpha"), r.getAs[Long]("fail_stop"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"),
        r.getAs[Long]("kept_ppm"))).toSeq
    assert(out === Seq(
      ("s1", 5L, 1L, 1L, 1L, 1L, 2L, 1L, 5L, 200000L),
      ("s2", 1L, 0L, 0L, 0L, 0L, 0L, 1L, 5L, 1000000L)))
  }

  test("gopherRules: alpha rule is case-insensitive — acronyms and " +
      "capitalized words count as alphabetic") {
    // All five words carry an alphabetic char (NASA, The, ...), so
    // pass_alpha holds (fail_alpha = 0) despite zero lowercase in
    // 'NASA' / 'IBM'; with a lowercase-only class 3 of 5 words would
    // fail the 80% bar.
    val docs = Seq(("s1", 1L, "NASA The IBM Cats Run"))
      .toDF("source", "doc_id", "text")
    val r = TextQuality.gopherRules(docs, "doc_id", "text", "source",
      minTok = 3L, maxTok = 10L).collect()(0)
    assert(r.getAs[Long]("fail_alpha") === 0L)
  }

  test("kmvSetOps: exact in the small-union regime; estimator formula " +
      "holds when the state saturates") {
    // A={t1..t4}, B={t3..t6}, C={t7,t8}: all pair unions <= k=64, so
    // every estimate must EQUAL its exact audit column.
    val docs = Seq(
      (1L, "A", "t1"), (2L, "A", "t2"), (3L, "A", "t3"), (4L, "A", "t4"),
      (5L, "B", "t3"), (6L, "B", "t4"), (7L, "B", "t5"), (8L, "B", "t6"),
      (9L, "C", "t7"), (10L, "C", "t8"),
      (11L, "A", "t1")) // duplicate content: KMV is duplication-invariant
      .toDF("doc_id", "source", "text")
    val out = Sampling.kmvSetOps(docs, "source", "text")
      .orderBy($"src_a", $"src_b").collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("est_union"), r.getAs[Long]("exact_union"),
        r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter"))).toSeq
    assert(out.map(t => (t._1, t._2)) ===
      Seq(("A", "B"), ("A", "C"), ("B", "C")))
    out.foreach { case (a, b, eu, xu, ei, xi) =>
      assert(eu === xu && ei === xi, s"($a,$b) estimate != exact")
    }
    assert(out.head === ("A", "B", 6L, 6L, 2L, 2L))
    // saturated regime on the corpus with a tiny k: the published
    // estimates must recompute from the published state quantities
    import graft.model.Tables
    val k = 4
    val sat = Sampling.kmvSetOps(Tables.documents(spark, sf),
        "source", "text", k = k).collect()
    sat.foreach { r =>
      val s = r.getAs[Long]("shared_in_topk")
      val eu = r.getAs[Long]("est_union")
      val ei = r.getAs[Long]("est_inter")
      assert(ei === s * eu / k || eu < k,
        s"est_inter $ei != $s*$eu/$k")
    }
  }

  test("leakFreeSplit: clusters never straddle splits, audit proves " +
      "it, doc counts partition the corpus") {
    import graft.model.Tables
    // synthetic: a 3-member near-dup cluster must land together
    val clusterText = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, clusterText), (2L, clusterText), (3L, clusterText),
      (4L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (5L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"))
      .toDF("doc_id", "text")
    val out = Sampling.leakFreeSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("cross_split_pairs"))).toSeq
    assert(out.map(_._2).sum === 5L)
    assert(out.forall(_._4 === 0L))
    // the 3-member cluster is intact: some split holds >= 3 docs but
    // counts them as clusters - docs >= 2 fewer
    assert(out.exists(r => r._2 - r._3 === 2L))
    // corpus: splits partition, zero cross-split pairs
    val corpus = Sampling.leakFreeSplit(Tables.documents(spark, sf),
        "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("n_docs"),
        r.getAs[Long]("cross_split_pairs"))).toSeq
    assert(corpus.map(_._1).sum ===
      Tables.documents(spark, sf).count())
    assert(corpus.forall(_._2 === 0L))
  }

  test("repetitionSignals flags repeated n-grams and top-token mass") {
    val docs = Seq(
      (1L, "spam spam spam spam"),           // 1 distinct token of 4
      (2L, "all tokens here are different")) // no repetition
      .toDF("doc_id", "text")
    val out = TextQuality.repetitionSignals(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Double]("dup_token_ratio") == 0.75)
    assert(out(0).getAs[Double]("dup_3gram_ratio") == 0.5) // 1 distinct of 2
    assert(out(0).getAs[Double]("top_token_ratio") == 1.0)
    assert(out(1).getAs[Double]("dup_token_ratio") == 0.0)
    assert(out(1).getAs[Double]("dup_3gram_ratio") == 0.0)
  }

  test("repetitionSignals short-doc guards: below-w docs score 0") {
    val docs = Seq((1L, "one"), (2L, "one two")).toDF("doc_id", "text")
    val out = TextQuality.repetitionSignals(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Double]("dup_2gram_ratio") == 0.0)
    assert(out(0).getAs[Double]("dup_3gram_ratio") == 0.0)
    assert(out(1).getAs[Double]("dup_3gram_ratio") == 0.0)
  }

  test("stratifiedSample is deterministic, quota-bounded, and map-only") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val quotas = Map("en" -> 10, "de" -> 50)
    val s1 = Sampling.stratifiedSample(rows, $"lang", $"doc_id", quotas)
    val got = s1.collect()
    // deterministic: identical on re-run
    assert(s1.collect().map(_.toSeq).toSet === got.map(_.toSeq).toSet)
    // every kept row's bucket is below its stratum quota
    got.foreach { r =>
      val q = quotas(r.getAs[String]("lang"))
      assert(r.getAs[Long]("bucket") < q)
    }
    // en downsampled harder than de (10% vs 50% expected rates)
    val byLang = got.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    assert(byLang.getOrElse("en", 0) < byLang.getOrElse("de", 0))
    // map-only: no exchange in the plan
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"stratified sampling must be map-only:\n$plan")
  }

  test("bottomKSample: duplication-invariant, mergeable, estimate " +
      "self-audits against the exact count") {
    // base corpus: 40 distinct texts in one stratum
    val base = (0L until 40L).map(i => (i, "s", s"text body $i"))
      .toDF("doc_id", "source", "text")
    val k = 8
    val s1 = Sampling.bottomKSample(base, "source", "doc_id", "text", k)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("h"), r.getAs[Long]("est_distinct"),
        r.getAs[Long]("n_distinct"))).sortBy(_._1).toSeq
    assert(s1.size === k && s1.map(_._1) === (1L to k.toLong))
    assert(s1.map(_._5).distinct === Seq(40L))
    // duplication invariance: paste every doc 5x under NEW ids — the
    // sample slots and the estimate cannot move, only rep ids can
    // drop to the new smaller ids (here new ids are larger, so
    // nothing at all moves)
    val dup = base.unionAll(
      (0L until 200L).map(i => (1000L + i, "s", s"text body ${i % 40}"))
        .toDF("doc_id", "source", "text"))
    val s2 = Sampling.bottomKSample(dup, "source", "doc_id", "text", k)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("h"), r.getAs[Long]("est_distinct"),
        r.getAs[Long]("n_distinct"))).sortBy(_._1).toSeq
    assert(s2 === s1)
    // fewer than k distinct: estimate IS the exact count
    val tiny = (0L until 3L).map(i => (i, "s", s"tiny $i"))
      .toDF("doc_id", "source", "text")
    val s3 = Sampling.bottomKSample(tiny, "source", "doc_id", "text", k)
      .collect()
    assert(s3.length === 3 &&
      s3.forall(_.getAs[Long]("est_distinct") === 3L))
    // the KMV estimate is in the right ballpark on a bigger stratum
    // (hash-uniformity: est within 2.5x of truth at k=8 is the
    // deterministic outcome for THIS corpus, pinned)
    val big = (0L until 500L).map(i => (i, "s", s"body nr $i padded"))
      .toDF("doc_id", "source", "text")
    val est = Sampling.bottomKSample(big, "source", "doc_id", "text", k)
      .head().getAs[Long]("est_distinct")
    assert(est > 200L && est < 1250L, s"KMV estimate $est vs true 500")
  }

  test("prioritySample: mass-weighted inclusion, exact-when-small " +
      "estimator, deterministic") {
    // sub-k stratum: everything kept, estimator IS the exact total
    val small = (0L until 5L).map(i =>
      (i, "s", (1 to 10).map(j => s"w$i$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val s1 = Sampling.prioritySample(small, "source", "doc_id", "text")
      .collect()
    assert(s1.length === 5)
    s1.foreach { r =>
      assert(r.getAs[Long]("est_mass") === r.getAs[Long]("total_mass"))
      assert(r.getAs[Long]("w") === 10L)
    }
    // weighting: heavy docs (1000 tokens) vs light (2 tokens) — the
    // k=8 sample from a 20/200 mix must skew heavily to heavy docs
    // (each heavy doc's priority is ~500x smaller at equal hash)
    val heavy = (0L until 20L).map(i =>
      (i, "m", (1 to 1000).map(j => s"h$j").mkString(" ")))
    val light = (100L until 300L).map(i => (i, "m", "a b"))
    val mix = (heavy ++ light).toDF("doc_id", "source", "text")
    val kept = Sampling.prioritySample(mix, "source", "doc_id", "text")
      .collect().map(_.getAs[Long]("did")).toSeq
    assert(kept.size === 8)
    assert(kept.count(_ < 100L) >= 6,
      s"mass-weighted sample should be mostly heavy docs: $kept")
    // estimator ballpark on the mix: true mass = 20*1000 + 200*2
    val est = Sampling.prioritySample(mix, "source", "doc_id", "text")
      .head().getAs[Long]("est_mass")
    assert(est > 5000L && est < 100000L, s"est $est vs true 20400")
    // determinism
    val again = Sampling.prioritySample(mix, "source", "doc_id", "text")
      .collect().map(_.getAs[Long]("did")).toSeq
    assert(again === kept)
  }

  test("curate's repetition gate drops repetitive docs that pass quality") {
    // long + distinct-heavy enough to pass the quality gate, but one
    // doc is a 3-gram loop
    val loop = ("alpha beta gamma " * 40).trim
    val varied = (1 to 120).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, loop), (2L, varied)).toDF("doc_id", "text")
    val open = Curate.curate(docs, "doc_id", "text",
      minQuality = 0.0, tau = 0.99)
    assert(open.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val gated = Curate.curate(docs, "doc_id", "text",
      minQuality = 0.0, tau = 0.99, maxDup3gram = 0.2)
    assert(gated.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("histogram quantile matches brute-force nearest-rank") {
    // the c38 inventory query's semantics on data small enough to
    // sort by hand: p(q) = smallest value whose rank reaches
    // ceil(q * n) — exercised through the registered query at sf
    val out = graft.SparkEntry.queries("c38_quantile_hist")(spark, sf)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("p50"),
          r.getAs[Long]("p90"), r.getAs[Long]("p99"))).toMap
    val docs = graft.model.Tables.documents(spark, sf)
      .select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    docs.foreach { case (lang, sorted) =>
      val n = sorted.length
      def nearestRank(ppm: Long): Long =
        sorted((((ppm * n + 999999L) / 1000000L).toInt - 1).max(0))
      val (nd, p50, p90, p99) = out(lang)
      assert(nd === n.toLong)
      assert(p50 === nearestRank(500000L), s"$lang p50")
      assert(p90 === nearestRank(900000L), s"$lang p90")
      assert(p99 === nearestRank(990000L), s"$lang p99")
    }
  }

  test("lengthTrim: band thresholds and per-source audit hand-checked") {
    // lengths 1..10, odd -> source s, even -> t; p25/p75 nearest-rank
    // over 10 docs: lo = 3rd value = 3, hi = 8th value = 8
    val docs = (1 to 10).map { n =>
      (n.toLong, Seq.fill(n)("w").mkString(" "),
        if (n % 2 == 1) "s" else "t")
    }.toDF("doc_id", "text", "source")
    val out = graft.operators.Sampling
      .lengthTrim(docs, "source", "text", loPpm = 250000L, hiPpm = 750000L)
      .orderBy($"source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("cut_low"), r.getAs[Long]("cut_high"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(out.toSeq === Seq(
      ("s", 5L, 1L, 1L, 3L, 15L, 3L, 8L),   // keeps 3,5,7
      ("t", 5L, 1L, 1L, 3L, 18L, 3L, 8L)))  // keeps 4,6,8
  }
}
