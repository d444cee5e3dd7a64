package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("two-level scan equals the naive global window, boundaries flagged") {
    // crafted lengths: doc 2 straddles the 10-token boundary
    // (offset 6, len 7 → tokens 6..12), doc 3 starts exactly ON a
    // boundary (offset 13? no — verify against the naive scan below)
    val docs = Seq(
      (0L, "a b c"),             // 3 tokens, offset 0
      (1L, "d e f"),             // offset 3
      (2L, "g h i j k l m"),     // offset 6, crosses 10
      (3L, "n o p"),             // offset 13
      (4L, "q r s t u v w"),     // offset 16, crosses 20
      (5L, "x")                  // offset 23
    ).toDF("doc_id", "text")
    // tiny bucketWidth forces multiple buckets → the bucket-prefix
    // path is actually exercised
    val got = Packing.packOffsets(docs, "doc_id", "text",
        budget = 10L, bucketWidth = 2L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val naive = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .withColumn("offset", coalesce(sum($"n").over(
        Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy($"doc_id").collect()
      .map { r =>
        val (d, n, o) = (r.getLong(0), r.getLong(1), r.getLong(2))
        (d, o, o / 10, o % 10, if ((o + n - 1) / 10 != o / 10) 1L else 0L)
      }
    assert(got.toSeq === naive.toSeq)
    // spot-check the crafted expectations
    assert(got(2) === ((2L, 6L, 0L, 6L, 1L)), "doc 2 crosses")
    assert(got(3) === ((3L, 13L, 1L, 3L, 0L)))
    assert(got(5) === ((5L, 23L, 2L, 3L, 0L)))
  }

  test("offsets are a gap-free token stream") {
    val docs = graft.model.Tables.documents(spark, sf)
    val out = Packing.packOffsets(docs, "doc_id", "text", budget = 512L)
      .orderBy($"doc_id").collect()
    var expect = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("offset") === expect)
      expect += r.getAs[Long]("n_tokens")
    }
  }

  test("chunkDocs: hand-checked windows, short docs, exact-fit docs") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"), // 10 tokens, 3 chunks
      (1L, "k"),                   // 1 token, 1 chunk
      (2L, "l m n o"),             // exactly win, 1 chunk
      (3L, "p q r s t")            // win+1, 2 chunks
    ).toDF("doc_id", "text")
    val got = Packing.chunkDocs(docs, "doc_id", "text",
        win = 4L, stride = 3L)
      .orderBy($"doc_id", $"chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 4L, "a b c d"),
      (0L, 1L, 3L, 4L, "d e f g"),
      (0L, 2L, 6L, 4L, "g h i j"),
      (1L, 0L, 0L, 1L, "k"),
      (2L, 0L, 0L, 4L, "l m n o"),
      (3L, 0L, 0L, 4L, "p q r s"),
      (3L, 1L, 3L, 2L, "s t")))
  }

  test("chunkDocs: every chunk is the exact token slice, cover is tight") {
    val docs = graft.model.Tables.documents(spark, sf)
    val text = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Packing.chunkDocs(docs, "doc_id", "text",
        win = 32L, stride = 24L)
      .orderBy($"doc_id", $"chunk_id").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, chunks) =>
      val toks = text(id).split(" ", -1)
      chunks.foreach { r =>
        val (start, len) = (r.getLong(3).toInt, r.getLong(4).toInt)
        assert(r.getString(5) ===
          toks.slice(start, start + len).mkString(" "))
      }
      // chunk 0 starts at 0; the last chunk ends exactly at n_tokens;
      // starts advance by the stride
      val byK = chunks.sortBy(_.getLong(2))
      assert(byK.head.getLong(3) === 0L)
      assert(byK.last.getLong(3) + byK.last.getLong(4) === toks.length.toLong)
      byK.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(3) - a.getLong(3) === 24L)
        case _ =>
      }
    }
  }

  test("shardManifest: totals partition the corpus, layout is physical-" +
      "plan-independent") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = Packing.shardManifest(docs, "doc_id", "text", shards = 16)
      .orderBy($"shard").collect()
    val n = docs.count()
    // every doc lands in exactly one shard; ids cover [0, 16)
    assert(m.map(_.getAs[Long]("n_docs")).sum === n)
    assert(m.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 16
    })
    // the order checksum is a function of the DATA, not of the input's
    // physical layout: a different partitioning (and so different
    // window task boundaries) must reproduce every rank bit-for-bit
    val re = Packing.shardManifest(docs.repartition(7), "doc_id", "text",
        shards = 16)
      .orderBy($"shard").collect()
    assert(m.toSeq === re.toSeq)
    // counts view agrees with the manifest on the shared columns
    val c = Packing.shardCounts(docs, "doc_id", "text", shards = 16)
      .orderBy($"shard").collect()
    assert(c.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_tokens"))).toSeq ===
      m.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq)
  }

  test("shardPack: per-shard packing matches a brute-force replay") {
    import graft.functions.TextOps
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val budget = 512L
    val out = Packing.shardPack(docs, "doc_id", "text", shards = 16,
        budget = budget)
      .orderBy($"shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("n_straddle"), r.getAs[Long]("tail_fill_ppm")))
    // brute force: route, order by (h, id), simulate the concat-chop
    val rows = docs.select($"doc_id",
        TextOps.polyHashMixed($"text").as("h"),
        size(TextOps.tokens($"text")).cast("long").as("n"))
      .collect()
      .map(r => (r.getAs[Long]("h") % 16, r.getAs[Long]("h"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n")))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (shard, ds) =>
        val ordered = ds.sortBy(d => (d._2, d._3))
        var off = 0L; var straddle = 0L
        ordered.foreach { d =>
          if (off / budget != (off + d._4 - 1) / budget) straddle += 1
          off += d._4
        }
        val tail = if (off % budget == 0) 1000000L
          else (off % budget) * 1000000L / budget
        (shard, ordered.size.toLong, off,
          (off + budget - 1) / budget, straddle, tail)
    }
    assert(out.toSeq === expect)
  }

  test("paddingAudit: hand-checked waste under both batching orders") {
    // ids 1..6 with lengths 1,10,2,9,3,8 and batch=2:
    // arrival [1,10][2,9][3,8] -> padded 20+18+16=54, real 33
    // sorted  [1,2][3,8][9,10] -> padded 4+16+20=40, real 33
    val docs = Seq((1L, 1), (2L, 10), (3L, 2), (4L, 9), (5L, 3), (6L, 8))
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = graft.operators.Packing
      .paddingAudit(docs, "doc_id", "text", batch = 2)
      .collect().map(r => (r.getAs[String]("strategy"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_batches"),
        r.getAs[Long]("real_tokens"), r.getAs[Long]("padded_tokens"),
        r.getAs[Long]("waste_ppm")))
    assert(out.toSeq === Seq(
      ("arrival", 6L, 3L, 33L, 54L, 21000000L / 54L),
      ("sorted", 6L, 3L, 33L, 40L, 7000000L / 40L)))
  }

  test("paddingAudit: two-level ranks match a brute-force replay at sf") {
    val docs = graft.model.Tables.documents(spark, sf)
    val out = graft.operators.Packing
      .paddingAudit(docs, "doc_id", "text", batch = 16)
      .collect().map(r => (r.getAs[String]("strategy"),
        r.getAs[Long]("n_batches"), r.getAs[Long]("real_tokens"),
        r.getAs[Long]("padded_tokens"))).toSeq
    val lens = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def brute(ordered: Seq[Long]) = {
      val batches = ordered.grouped(16).toSeq
      (batches.size.toLong, ordered.sum,
        batches.map(b => b.size * b.max).sum)
    }
    val arr = brute(lens.sortBy(_._1).map(_._2))
    val srt = brute(lens.sortBy(t => (t._2, t._1)).map(_._2))
    assert(out === Seq(
      ("arrival", arr._1, arr._2, arr._3),
      ("sorted", srt._1, srt._2, srt._3)))
  }

  test("ffdAudit: hand-checked bins for all three strategies") {
    // lengths by id: 400,200,400,200; budget 512. Hand replay:
    //   arrival NF: 400->[112]; 200 no fit->[312]; 400 no->[112];
    //     200 no->[312]                              = 4 bins
    //   sorted NF (400,400,200,200): 400->[112]; 400->[112];
    //     200->[312]; 200 fits rem 312->[112]        = 3 bins
    //   ffd (400,400,200,200): [112]->[112,112]; 200 fits neither
    //     ->[112,112,312]; 200 fits bin3->[112,112,112] = 3 bins
    // (all three differ from each other in bins or layout — the
    // audit's separating example)
    val docs = Seq((1L, 400), (2L, 200), (3L, 400), (4L, 200))
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = graft.operators.Packing
      .ffdAudit(docs, "doc_id", "text", budget = 512L)
      .collect().map(r => (r.getAs[String]("strategy"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_bins"),
        r.getAs[Long]("real_tokens"), r.getAs[Long]("capacity_tokens"),
        r.getAs[Long]("waste_ppm"))).toSeq
    assert(out === Seq(
      ("arrival", 4L, 4L, 1200L, 2048L, 848L * 1000000L / 2048L),
      ("ffd", 4L, 3L, 1200L, 1536L, 336L * 1000000L / 1536L),
      ("sorted", 4L, 3L, 1200L, 1536L, 336L * 1000000L / 1536L)))
  }

  test("ffdAudit: per-shard folds match a brute-force replay at sf") {
    val budget = 512L
    val shardSize = 256 // small so the sf corpus spans several shards
    val docs = graft.model.Tables.documents(spark, sf)
    val out = graft.operators.Packing
      .ffdAudit(docs, "doc_id", "text", budget, shardSize)
      .collect().map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_bins"),
          r.getAs[Long]("real_tokens"))).toMap
    val lens = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), math.min(r.getLong(1), budget)))
      .filter(_._2 > 0).toSeq
    def nextFit(ordered: Seq[Long]): Long = {
      var bins = 0L; var rem = 0L
      ordered.foreach { n =>
        if (rem >= n) rem -= n else { bins += 1; rem = budget - n } }
      bins
    }
    def ffd(ordered: Seq[Long]): Long = {
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      ordered.foreach { n =>
        val i = bins.indexWhere(_ >= n)
        if (i >= 0) bins(i) -= n else bins += budget - n }
      bins.size.toLong
    }
    def sharded(ordered: Seq[Long], pack: Seq[Long] => Long): Long =
      ordered.grouped(shardSize).map(pack).sum
    val arrOrd = lens.sortBy(_._1).map(_._2)
    val decOrd = lens.sortBy(t => (-t._2, t._1)).map(_._2)
    val total = lens.map(_._2).sum
    assert(out("arrival") === (lens.size.toLong,
      sharded(arrOrd, nextFit), total))
    assert(out("sorted") === (lens.size.toLong,
      sharded(decOrd, nextFit), total))
    assert(out("ffd") === (lens.size.toLong,
      sharded(decOrd, ffd), total))
    // FFD never uses more bins than next-fit on the same order
    assert(out("ffd")._2 <= out("sorted")._2)
  }

  test("epochShuffle: reproducible per epoch, epochs differ, shuffle " +
      "breaks source runs, checksum catches a dropped doc") {
    import spark.implicits._
    import graft.operators.Packing
    // two sources in solid runs of 200 - unshuffled adjacency would
    // be 398; a mixing shuffle should land near the random level
    // (~199 expected over 16 shards) and far from run-level
    val docs = ((0L until 200L).map(i => (i, "aaa bbb ccc ddd", "s1")) ++
      (200L until 400L).map(i => (i, "aaa bbb ccc ddd", "s2")))
      .toDF("doc_id", "text", "source")
    type R = (Long, Long, Long, Long, Long)
    def run(epoch: Long): Seq[R] =
      Packing.epochShuffle(docs, "doc_id", "text", "source", epoch)
        .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("tok_mass"), r.getAs[Long]("same_src_adj"),
          r.getAs[Long]("pos_checksum"))).toSeq
    val e1 = run(1L)
    assert(run(1L) === e1, "same epoch must reproduce exactly")
    val e2 = run(2L)
    assert(e1 !== e2, "different epochs must permute differently")
    assert(e1.map(_._2).sum === 400L && e1.map(_._3).sum === 1600L)
    val adj = e1.map(_._4).sum
    assert(adj < 280L, s"shuffle left source runs intact: adj=$adj")
    // checksum is order-sensitive: dropping one doc changes at least
    // the shard it lived in
    val dropped = Packing.epochShuffle(docs.where($"doc_id" =!= 7L),
        "doc_id", "text", "source", 1L)
      .collect().map(r => (r.getAs[Long]("shard"),
        r.getAs[Long]("pos_checksum"))).toMap
    val orig = e1.map(t => t._1 -> t._5).toMap
    assert(dropped.exists { case (s2, c) => orig(s2) != c })
  }
}
