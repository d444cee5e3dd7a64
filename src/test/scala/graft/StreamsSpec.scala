package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.streaming.Streams

case class Raw(event_id: Long, ts: java.sql.Timestamp,
               user_id: Long, event_type: String, value: Double)

case class DocT(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** Drives the streaming operators through MemoryStream → writeStream
  * and checks parity with their batch flavors on the same events. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDf = Tables.events(spark, sf)
    .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    .orderBy($"ts", $"event_id")
  private lazy val rawRows = eventsDf.as[Raw].collect()

  test("streaming window counts equal batch window counts (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.windowCounts(ms.toDF())
      .writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("win")
      .orderBy($"hour_bucket", $"event_type").collect()
    val batch = Streams.windowCounts(eventsDf)
      .orderBy($"hour_bucket", $"event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming JSON window metrics equal batch (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"ts", $"event_type", $"props")
      .as[(java.sql.Timestamp, String, String)].collect()
    val ms = MemoryStream[(java.sql.Timestamp, String, String)]
    ms.addData(rows.toSeq)
    val q = Streams.jsonMetricsWindowed(
        ms.toDF().toDF("ts", "event_type", "props"))
      .writeStream.format("memory").queryName("jm")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("jm")
      .orderBy($"hour_bucket", $"event_type").collect()
    val batch = Streams.jsonMetricsWindowed(Tables.events(spark, sf))
      .orderBy($"hour_bucket", $"event_type").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("sessionTranscripts: hand-checked rendering, gap split, " +
      "id-ordered ties") {
    // user 1: a@0s, b@10s (same second-resolution offsets differ),
    // then c 40 min later -> new session; user 2: one event.
    // events 10/11 share the same timestamp -> id order breaks the tie
    val ev = Seq(
      (1L, 1L, "a", 0L, 0.0),
      (2L, 1L, "b", 10L * 1000000, 0.0),
      (3L, 1L, "c", 40L * 60 * 1000000, 0.0),
      (10L, 2L, "x", 5L * 1000000, 0.0),
      (11L, 2L, "y", 5L * 1000000, 0.0))
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val out = Streams.sessionTranscripts(ev, gapUs = 1800000000L)
      .orderBy($"user_id", $"start_us")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_us"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_s"), r.getAs[String]("transcript")))
      .toSeq
    assert(out === Seq(
      (1L, 0L, 2L, 10L, "a@0 b@10"),
      (1L, 2400000000L, 1L, 0L, "c@0"),
      (2L, 5000000L, 2L, 0L, "x@0 y@0")))
  }

  test("streaming sessionize emits the batch sessions (closed ones)") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000000L
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.sessionizeStreaming(ms.toDF(), gap)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("sess")
      .orderBy($"user_id", $"session_idx").collect()
    // append mode holds back each user's open (last) session
    val batch = Streams.sessionize(eventsDf, gap).toDF()
    val lastIdx = batch.groupBy($"user_id")
      .agg(max($"session_idx").as("last_idx"))
    val closed = batch.join(lastIdx, "user_id")
      .where($"session_idx" < $"last_idx")
      .select(batch.columns.map(col): _*)
      .orderBy($"user_id", $"session_idx").collect()
    assert(streamed.toSeq === closed.toSeq)
  }

  test("streaming session transcripts: emissions equal the closed " +
      "batch contract across a batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000000L
    val ms = MemoryStream[Raw]
    val (h1, h2) = rawRows.splitAt(rawRows.length / 2)
    val q = Streams.sessionTranscriptsStreaming(ms.toDF(), gap)
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      ms.addData(h1.toSeq); q.processAllAvailable()
      ms.addData(h2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("trans")
      .orderBy($"user_id", $"start_us").collect()
    val closed = Streams.sessionTranscriptsClosed(eventsDf, gap)
      .orderBy($"user_id", $"start_us").collect()
    // a session spanning the feed split must merge and render whole
    assert(streamed.nonEmpty && streamed.toSeq === closed.toSeq)
  }

  test("sessionize state carries across batches (boundary sessions merge)") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000000L
    val ms = MemoryStream[Raw]
    val (h1, h2) = rawRows.splitAt(rawRows.length / 2)
    val q = Streams.sessionizeStreaming(ms.toDF(), gap)
      .writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      ms.addData(h1.toSeq); q.processAllAvailable()
      ms.addData(h2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess2")
      .orderBy($"user_id", $"session_idx").collect()
    val batch = Streams.sessionize(eventsDf, gap).toDF()
    val lastIdx = batch.groupBy($"user_id")
      .agg(max($"session_idx").as("last_idx"))
    val closed = batch.join(lastIdx, "user_id")
      .where($"session_idx" < $"last_idx")
      .select(batch.columns.map(col): _*)
      .orderBy($"user_id", $"session_idx").collect()
    // a session spanning the batch boundary must merge, not split
    assert(streamed.toSeq === closed.toSeq)
  }

  test("append-mode windows emit exactly up to the advancing watermark") {
    implicit val sqlCtx = spark.sqlContext
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val maxTs = rawRows.map(_.ts.getTime).max
    val cutoff = maxTs - 3 * 3600 * 1000
    val (early, late) = rawRows.partition(_.ts.getTime < cutoff)
    val ms = MemoryStream[Raw]
    val q = Streams.windowCounts(ms.toDF())
      .writeStream.format("memory").queryName("winapp")
      .outputMode("append").start()
    try {
      ms.addData(early.toSeq); q.processAllAvailable()
      val afterFirst = spark.table("winapp").count()
      ms.addData(late.toSeq); q.processAllAvailable()
      val afterSecond = spark.table("winapp").count()
      assert(afterSecond > afterFirst, "advancing watermark emits more windows")
      // emitted set == batch windows whose end <= final watermark
      val wmMillis = maxTs - 2 * 3600 * 1000 // 2h watermark delay
      val expected = Streams.windowCounts(eventsDf).collect().filter { r =>
        val start = java.time.LocalDateTime
          .parse(r.getAs[String]("hour_bucket"), fmt)
        start.plusHours(1).toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli <= wmMillis
      }
      val emitted = spark.table("winapp").collect()
      assert(emitted.map(_.toString).sorted.toSeq ===
        expected.map(_.toString).sorted.toSeq)
    } finally q.stop()
  }

  test("streaming windowed top-k ranks closed windows across batches") {
    implicit val sqlCtx = spark.sqlContext
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val maxTs = rawRows.map(_.ts.getTime).max
    val cutoff = maxTs - 3 * 3600 * 1000
    val (early, late) = rawRows.partition(_.ts.getTime < cutoff)
    val collected =
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val ms = MemoryStream[Raw]
    val q = Streams.windowTopKStreaming(ms.toDF(), k = 5) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    try {
      ms.addData(early.toSeq); q.processAllAvailable()
      val afterFirst = collected.synchronized(collected.size)
      assert(afterFirst > 0, "first batch closes some windows")
      ms.addData(late.toSeq); q.processAllAvailable()
      assert(collected.synchronized(collected.size) > afterFirst,
        "advancing watermark closes more windows")
    } finally q.stop()
    // accumulated top-k == batch top-k over windows ended before the
    // final watermark (every row of a window closes in one batch, so
    // per-batch ranking is complete per window)
    val wmMillis = maxTs - 2 * 3600 * 1000
    val expected = Streams.windowTopK(eventsDf, 5).collect().filter { r =>
      val start = java.time.LocalDateTime
        .parse(r.getAs[String]("hour_bucket"), fmt)
      start.plusHours(1).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli <= wmMillis
    }
    assert(collected.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("stream-stream time-range join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.correlate(ms.toDF(), "click", "purchase", 3600000000L)
      .writeStream.format("memory").queryName("corr")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("corr")
      .orderBy($"user_id", $"a_id", $"b_id").collect()
    val batch = Streams.correlate(
        Tables.events(spark, sf), "click", "purchase", 3600000000L)
      .orderBy($"user_id", $"a_id", $"b_id").collect()
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("native session_window stream emits watermark-closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.sessionWindows(ms.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("sesswin")
      .orderBy($"user_id", $"start_us").collect()
    // append emits sessions whose end has passed the final watermark
    val wmUs = (rawRows.map(_.ts.getTime).max - 2 * 3600 * 1000) * 1000
    val expected = Streams.sessionWindows(eventsDf, "30 minutes")
      .where($"end_gap_us" <= wmUs)
      .orderBy($"user_id", $"start_us").collect()
    assert(streamed.nonEmpty && streamed.toSeq === expected.toSeq)
  }

  test("stream-stream LEFT OUTER join emits matches plus expired unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val horizon = 3600000000L
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.correlate(ms.toDF(), "click", "purchase", horizon,
        "left_outer")
      .writeStream.format("memory").queryName("lcorr")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("lcorr")
      .orderBy($"user_id", $"a_id", $"b_id").collect()
    // matched rows emit immediately; an unmatched click emits only
    // once the watermark proves no purchase can still arrive. The
    // global watermark is the MIN across both sides' watermark
    // operators (each side is its own filtered stream), and the
    // reconstruction here is ms-truncated while eviction compares
    // microseconds — assert between a strict and a loose bound.
    def maxTs(t: String) =
      rawRows.filter(_.event_type == t).map(_.ts.getTime).max
    val wmUs =
      (math.min(maxTs("click"), maxTs("purchase")) - 2 * 3600 * 1000) * 1000
    val margin = 2000L
    val batch = Streams.correlate(eventsDf, "click", "purchase", horizon,
      "left_outer")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    val mustHave = rows(batch
      .where($"b_id" =!= -1L || ($"a_us" + horizon) < wmUs - margin))
    val mayHave = rows(batch
      .where($"b_id" =!= -1L || ($"a_us" + horizon) < wmUs + margin))
    val got = streamed.map(_.toString).toSet
    assert(streamed.exists(_.getAs[Long]("b_id") === -1L),
      "some unmatched clicks must have been emitted")
    assert(mustHave.subsetOf(got), s"missing: ${mustHave.diff(got).take(3)}")
    assert(got.subsetOf(mayHave), s"extra: ${got.diff(mayHave).take(3)}")
  }

  test("streaming band claims match the batch novelty flags (ordered feed)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val bandRows = Dedup.bandBuckets(docs, "doc_id", "text", 16, 4)
      .select($"did", $"band_idx", $"band_val")
      .as[(Long, Int, Seq[Long])].collect()
      .sortBy(r => (r._1, r._2))
      .map { case (d, i, v) => Streams.BandRow(d, i, v) }
    val ms = MemoryStream[Streams.BandRow]
    ms.addData(bandRows.toSeq)
    val q = Streams.bandClaimStreaming(ms.toDS())
      .toDF("did", "band_idx", "novel_band")
      .writeStream.format("memory").queryName("claims")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamedNovel = spark.table("claims")
      .groupBy($"did")
      .agg(min(when($"novel_band", 1L).otherwise(0L)).as("novel"))
      .orderBy($"did").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val batchNovel = Dedup.nearDupNovelty(docs, "doc_id", "text", 16, 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(streamedNovel.toSeq === batchNovel.toSeq)
    assert(batchNovel.exists(_._2 == 0L), "corpus contains near-dups")
  }

  test("streaming dedup keeps the first arrival per key (ordered feed)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    ms.addData(rawRows.toSeq)
    val q = Streams.dedupStreaming(ms.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("dedup")
      .orderBy($"user_id", $"event_type").collect()
    val batch = Streams.firstPerKey(Tables.events(spark, sf))
      .orderBy($"user_id", $"event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("streaming windowed HLL matches batch estimates for closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Raw]
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = Streams.windowHllStreaming(ms.toDF()) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val maxTs = rawRows.map(_.ts.getTime).max
    val cutoff = maxTs - 3 * 3600 * 1000
    val (early, late) = rawRows.partition(_.ts.getTime < cutoff)
    try {
      ms.addData(early.toSeq); q.processAllAvailable()
      ms.addData(late.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[String]("hour_bucket"),
        r.getAs[String]("event_type"), r.getAs[Double]("hll_estimate")))
        .sorted.toSeq
    }
    // closed windows = those whose end precedes the final watermark
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val wmMillis = maxTs - 2 * 3600 * 1000
    val expected = Streams.windowHll(eventsDf).collect().filter { r =>
      val start = java.time.LocalDateTime
        .parse(r.getAs[String]("hour_bucket"), fmt)
      start.plusHours(1).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli <= wmMillis
    }.map(r => (r.getAs[String]("hour_bucket"),
      r.getAs[String]("event_type"), r.getAs[Double]("hll_estimate")))
      .sorted.toSeq
    assert(streamed.nonEmpty && streamed === expected)
  }

  test("streaming windowed Count-Min matches batch estimates for closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val users = Seq(1L, 2L, 3L, 4L, 5L)
    val ms = MemoryStream[Raw]
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = Streams.windowCmStreaming(ms.toDF(), users) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val maxTs = rawRows.map(_.ts.getTime).max
    val cutoff = maxTs - 3 * 3600 * 1000
    val (early, late) = rawRows.partition(_.ts.getTime < cutoff)
    try {
      ms.addData(early.toSeq); q.processAllAvailable()
      ms.addData(late.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[String]("hour_bucket"),
        r.getAs[Long]("user_id"), r.getAs[Long]("cm_est")))
        .sorted.toSeq
    }
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val wmMillis = maxTs - 2 * 3600 * 1000
    val expected = Streams.windowCm(eventsDf, users).collect().filter { r =>
      val start = java.time.LocalDateTime
        .parse(r.getAs[String]("hour_bucket"), fmt)
      start.plusHours(1).toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli <= wmMillis
    }.map(r => (r.getAs[String]("hour_bucket"),
      r.getAs[Long]("user_id"), r.getAs[Long]("cm_est")))
      .sorted.toSeq
    assert(streamed.nonEmpty && streamed === expected)
    // the sketch can only over-count
    val exact = Streams.windowCm(eventsDf, users).collect()
    assert(exact.forall(r =>
      r.getAs[Long]("cm_est") >= r.getAs[Long]("n_exact")))
  }

  test("stream-static contamination hits group to the batch pair counts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    val docs = Tables.documents(spark, sf)
    val isEval = pmod($"doc_id", lit(37)) === 0
    val evalSh = Streams.evalShingles(docs.where(isEval), "doc_id", "text")
    val arriving = docs.where(!isEval)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.contaminationHitsStreaming(evalSh,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("hits")
      .outputMode("append").start()
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hits")
      .groupBy($"train_id", $"eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy($"train_id", $"eval_id").collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"),
        r.getAs[Long]("n_shared"))).toSeq
    val batch = CorpusStats.contamination(docs, "doc_id", "text",
        isEval, minOverlap = 0.0)
      .orderBy($"train_id", $"eval_id").collect()
      .map(r => (r.getAs[Long]("train_id"), r.getAs[Long]("eval_id"),
        r.getAs[Long]("n_shared"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming corpus filter matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val base = java.nio.file.Files
      .createTempDirectory("graft-dedup-index").toString
    Dedup.writeIndex(corpus, "doc_id", "text", k = 48, bands = 24, base)
    val idx = Dedup.readIndex(spark, base)
    val ms = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    val q = Streams.corpusFilterStreaming(idx,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", tau = 0.5) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    // two micro-batches: decisions are per-doc independent, so the
    // split point must not matter
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep"),
        r.getAs[Long]("dup_of"))).sortBy(_._1).toSeq
    }
    val batch = Dedup.corpusFilter(idx,
        docs.where(pmod($"doc_id", lit(10)) >= 8), "doc_id", "text",
        tau = 0.5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keep"),
        r.getAs[Long]("dup_of"))).toSeq
    assert(streamed === batch)
    assert(batch.exists(_._2 == 0L), "some arriving docs must be blocked")
  }

  test("streaming cluster assignment matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    import graft.functions.VectorOps
    import graft.util.Barriers.BarrierOps
    val e = Tables.embeddings(spark, sf)
    val cent = Ann.kmeansFit(
        e.where(pmod($"vec_id", lit(10)) < 8)
          .select($"vec_id", $"embedding"),
        "vec_id", "embedding", k = 8, iters = 2)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
      .withColumn("cn", VectorOps.norm($"cv"))
      .barrier(true)
    val arriving = e.where(pmod($"vec_id", lit(10)) >= 8)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val ms = MemoryStream[(Long, Array[Float], Int)]
    val q = Streams.clusterAssignStreaming(
        ms.toDF().toDF("vec_id", "embedding", "label"), "embedding", cent)
      .select($"vec_id", $"cid", $"csim")
      .writeStream.format("memory").queryName("assigned")
      .outputMode("append").start()
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("assigned").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Double]("csim"))).sortBy(_._1).toSeq
    val batch = Ann.argmaxAssign(
        e.where(pmod($"vec_id", lit(10)) >= 8)
          .select($"vec_id", $"embedding"), "embedding", cent)
      .orderBy($"vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Double]("csim"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // every centroid id must come from the trained set
    val cids = cent.select($"cid").collect().map(_.getLong(0)).toSet
    assert(streamed.forall(t => cids.contains(t._2)))
  }

  test("streaming importance gate matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(10)) >= 8
    val w = CorpusStats.importanceWeights(docs.where(!isArr), "text",
      $"lang" === "en", buckets = 1024).barrier(true)
    val Array(nRaw, sumRaw) = CorpusStats.importanceScore(w,
        docs.where(!isArr).where($"lang" =!= "en"), "doc_id", "text",
        buckets = 1024)
      .agg(count(lit(1)), sum($"score")).as[(Long, Long)].head()
      .productIterator.map(_.asInstanceOf[Long]).toArray
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.importanceGateStreaming(w,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      buckets = 1024, nRaw = nRaw, sumRaw = sumRaw) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1).toSeq
    }
    val batch = CorpusStats.importanceScore(w, docs.where(isArr),
        "doc_id", "text", buckets = 1024)
      .where(expr(s"cast(score as decimal(38,0)) * $nRaw > $sumRaw"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"),
        r.getAs[Long]("n_tokens"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.length < arriving.length,
      "the gate must actually filter")
  }

  test("streaming chunking matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.chunkStreaming(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        win = 32L, stride = 24L)
      .writeStream.format("memory").queryName("chunked")
      .outputMode("append").start()
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("chunked").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text")))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = Packing.chunkDocs(
        docs.where(pmod($"doc_id", lit(10)) >= 8), "doc_id", "text",
        win = 32L, stride = 24L)
      .orderBy($"doc_id", $"chunk_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_tokens"),
        r.getAs[String]("chunk_text"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // multi-chunk docs must actually occur (win < some doc lengths)
    assert(streamed.exists(_._2 > 0L))
  }

  test("streaming chunk retrieval matches the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Retrieval
    import graft.functions.{TextOps, VectorOps}
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(10)) >= 8
    val chunks = Retrieval.chunkEmbed(docs.where(!isArr), "doc_id",
      "text", win = 32L, stride = 24L, dim = 16).barrier(true)
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.chunkRetrievalStreaming(chunks,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      dim = 16, k = 3) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Double]("sim"))).sortBy(t => (t._1, t._2)).toSeq
    }
    val batchQueries = docs.where(isArr)
      .select($"doc_id".as("q_id"), TextOps.polyHash($"text").as("h"))
      .select($"q_id", transform(VectorOps.mockEmbedding($"h", 16),
        x => x.cast("float")).as("q_emb"))
    val batch = Retrieval.chunkTopK(chunks, batchQueries, "doc_id", k = 3)
      .orderBy($"q_id", $"rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Double]("sim"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // every arriving doc gets exactly k answers (corpus >> k docs)
    assert(streamed.groupBy(_._1).forall(_._2.length == 3))
  }

  test("streaming vocab coverage: last emission equals batch coverage after drain") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val vocab = CorpusStats.tokenVocab(
        docs.where(pmod($"doc_id", lit(101)) =!= 0), "text")
      .barrier(true)
    val eval = docs.where(pmod($"doc_id", lit(7)) === 0)
    val arriving = eval.select($"source", $"text")
      .as[(String, String)].collect()
    var last: Seq[(String, Long, Long, Long, Long)] = Seq.empty
    var emissions = 0
    val ms = MemoryStream[(String, String)]
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"source").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("oov_occ"), r.getAs[Long]("oov_occ_min2"),
          r.getAs[Long]("occ_cov_ppm"))).toSeq
    val q = Streams.occCoverageStreaming(vocab,
      ms.toDF().toDF("source", "text"), "source", "text") { df =>
      val rows = snap(df)
      this.synchronized { last = rows; emissions += 1 }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = snap(
      CorpusStats.occCoverage(docs.where(pmod($"doc_id", lit(101)) =!= 0),
        eval, "source", "text"))
    assert(emissions >= 2, "expected one emission per micro-batch")
    assert(last.nonEmpty && last === batch)
  }

  test("streaming moore-lewis gate: union of emissions equals batch scores") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val train = docs.where(pmod($"doc_id", lit(101)) =!= 0)
    def b(lm0: CorpusStats.BigramLm) = CorpusStats.BigramLm(
      lm0.uni.barrier(true), lm0.big.barrier(true),
      lm0.ctx.barrier(true))
    val lmIn = b(CorpusStats.bigramLm(
      train.where($"lang" === "en"), "text"))
    val lmGen = b(CorpusStats.bigramLm(train, "text"))
    val eval = docs.where(pmod($"doc_id", lit(17)) === 0)
    val arriving = eval.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Boolean)]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.mooreLewisStreaming(lmIn, lmGen,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("bits_in_ppm"), r.getAs[Long]("bits_gen_ppm"),
          r.getAs[Long]("delta_ppm"), r.getAs[Boolean]("keep")))
      this.synchronized { got ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = CorpusStats.mooreLewisScore(lmIn, lmGen, eval,
        "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bits_in_ppm"), r.getAs[Long]("bits_gen_ppm"),
        r.getAs[Long]("delta_ppm"), r.getAs[Boolean]("keep"))).toSeq
    assert(got.nonEmpty && got.sortBy(_._1).toSeq === batch.sortBy(_._1))
  }

  test("streaming blob near-dup: union of emissions equals batch matches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val index = Multimodal.blockMeanHash(
        docs.where(pmod($"doc_id", lit(23)) =!= 0), "doc_id", "text")
      .barrier(true)
    val eval = docs.where(pmod($"doc_id", lit(23)) === 0)
    val arriving = eval.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.blobNearDupStreaming(index,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", tau = 12) { df =>
      val rows = df.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"),
          r.getAs[Long]("hamming")))
      this.synchronized { got ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = Multimodal.blobNearDupAgainst(index, eval,
        "doc_id", "text", tau = 12).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"),
        r.getAs[Long]("hamming"))).toSeq
    assert(got.sorted.toSeq === batch.sorted)
  }

  test("streaming pq encode: union of emissions equals batch codes") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val emb = Tables.embeddings(spark, sf)
    val cent = Ann.pqFit(emb.where(pmod($"vec_id", lit(29)) =!= 0),
      "vec_id", "embedding", m = 8, subDim = 8, k = 16, iters = 2)
      .barrier(true)
    val eval = emb.where(pmod($"vec_id", lit(29)) === 0)
    val arriving = eval.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long)]
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = Streams.pqEncodeStreaming(cent,
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 8, subDim = 8) { df =>
      val rows = df.collect()
        .map(r => (r.getAs[Long]("vid"), r.getAs[Int]("m"),
          r.getAs[Long]("code")))
      this.synchronized { got ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = Ann.pqCodes(eval, "vec_id", "embedding", cent,
        m = 8, subDim = 8).collect()
      .map(r => (r.getAs[Long]("vid"), r.getAs[Int]("m"),
        r.getAs[Long]("code"))).toSeq
    assert(got.nonEmpty && got.sorted.toSeq === batch.sorted)
  }

  test("streaming ivf append: drain equals the batch audit+verdict; " +
      "per-list arrivals monotone across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val e = Tables.embeddings(spark, sf)
    val base = e.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = e.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).barrier(true)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base,
        Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding").barrier(true))
    val arriving = arrivals.select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    type Row8 = (Long, Long, Long, Long, Long, Long, Long, Long)
    val emissions =
      scala.collection.mutable.ArrayBuffer.empty[Seq[Row8]]
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[Row8] =
      df.collect().map(r => (r.getAs[Long]("c_id"),
        r.getAs[Long]("n_base"), r.getAs[Long]("n_arrived"),
        r.getAs[Long]("growth_ppm"), r.getAs[Long]("base_sim_ppm"),
        r.getAs[Long]("arrived_sim_ppm"), r.getAs[Long]("drift_ppm"),
        r.getAs[Long]("retrain"))).sortBy(_._1).toSeq
    val ms = MemoryStream[(Long, Array[Float], Int)]
    val q = Streams.ivfAppendStreaming(idx,
        ms.toDF().toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding") { df =>
      val rows = toRows(df)
      this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(Ann.retrainVerdict(
      Ann.ivfAppendAudit(idx, arrivals, "vec_id", "embedding"),
      maxGrowthPpm = 250000L, maxDriftDownPpm = 70000L))
    assert(emissions.size === 3 && emissions.last === batch)
    // arrivals only accumulate: n_arrived per list is monotone
    val per = emissions.map(_.map(t => t._1 -> t._3).toMap)
    per.sliding(2).foreach { w =>
      w(0).foreach { case (cid, cnt) =>
        assert(cnt <= w(1).getOrElse(cid, Long.MaxValue),
          s"list $cid arrivals went backwards") }
    }
  }

  test("streaming retrain cycle: pending identity record before the " +
      "majority fires, frozen c80 audit after") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val e = Tables.embeddings(spark, sf)
    val base = e.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val arrivals = e.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).barrier(true)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base,
        Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding").barrier(true))
    val arriving = arrivals.select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    type Row7 = (Long, Long, Long, Long, Long, Long, Long)
    val emissions =
      scala.collection.mutable.ArrayBuffer.empty[Seq[Row7]]
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[Row7] =
      df.collect().map(r => (r.getAs[Long]("c_id"),
        r.getAs[Long]("retrain"), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_after"), r.getAs[Long]("delta_n"),
        r.getAs[Long]("move_ppm"), r.getAs[Long]("trigger_batch")))
        .sortBy(_._1).toSeq
    val ms = MemoryStream[(Long, Array[Float], Int)]
    val q = Streams.retrainCycleStreaming(idx,
        ms.toDF().toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding") { df =>
      val rows = toRows(df)
      this.synchronized { emissions += rows }
    }
    // batch 0 = two arrivals (at most 2 of 8 lists can flag -> the
    // 3/4 majority cannot fire); batch 1 = the rest (fires)
    val (b1, b2) = arriving.splitAt(2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(emissions.size === 2)
    // pending emission: index unchanged -> identity post-columns
    assert(emissions(0).forall(r => r._7 === -1L && r._6 === 1000000L
      && r._4 === r._3 && r._5 === 0L))
    // fired emission: the frozen c80 audit over ALL arrivals seen at
    // firing time, stamped with the firing batch id
    val expected = toRows(Ann.retrainAudit(idx, arrivals, "vec_id",
        "embedding", maxGrowthPpm = 300000L, maxDriftDownPpm = 20000L)
      .withColumn("trigger_batch", lit(1L)))
    assert(emissions(1) === expected)
  }

  test("streaming source drift: last emission equals batch drift after drain") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    val docs = Tables.documents(spark, sf)
    val arriving = docs.select($"source", $"text")
      .as[(String, String)].collect()
    var last: Seq[(String, Long, Long, Long)] = Seq.empty
    var emissions = 0
    val ms = MemoryStream[(String, String)]
    val q = Streams.sourceDriftStreaming(
      ms.toDF().toDF("source", "text"), "source", "text",
      buckets = 512) { df =>
      val rows = df.orderBy($"source").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_buckets"), r.getAs[Long]("l1_ppm"))).toSeq
      this.synchronized { last = rows; emissions += 1 }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = CorpusStats.sourceDrift(docs, "source", "text",
        buckets = 512)
      .orderBy($"source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_buckets"), r.getAs[Long]("l1_ppm"))).toSeq
    assert(emissions >= 2, "expected one emission per micro-batch")
    assert(last.nonEmpty && last === batch)
  }

  test("streaming shard router: last emission equals batch counts after drain") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    val arriving = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    var last: Seq[(Long, Long, Long)] = Seq.empty
    var emissions = 0
    val ms = MemoryStream[(Long, String)]
    val q = Streams.shardCountsStreaming(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", shards = 8) { df =>
      val rows = df.orderBy($"shard").collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"))).toSeq
      this.synchronized { last = rows; emissions += 1 }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = Packing.shardCounts(docs, "doc_id", "text", shards = 8)
      .orderBy($"shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSeq
    assert(emissions >= 2, "expected one emission per micro-batch")
    assert(last.nonEmpty && last === batch)
  }

  test("streaming bpe encode matches the batch apply across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(11)) === 0
    val merges = CorpusStats.bpeMerges(docs.where(!isArr), "doc_id",
        "text", k = 3)
      .barrier(true)
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.bpeEncodeStreaming(merges,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", k = 3) { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_raw"), r.getAs[Long]("n_enc"),
        r.getAs[Long]("saved_ppm")))
      this.synchronized { collected ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = CorpusStats.bpeApply(merges, docs.where(isArr), "doc_id",
        "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_raw"),
        r.getAs[Long]("n_enc"), r.getAs[Long]("saved_ppm"))).toSeq
    assert(collected.nonEmpty &&
      collected.sortBy(_._1).toSeq === batch)
  }

  test("streaming surprisal scoring matches the batch LM score across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(13)) === 0
    val lm0 = CorpusStats.bigramLm(docs.where(!isArr), "text")
    val lm = CorpusStats.BigramLm(lm0.uni.barrier(true),
      lm0.big.barrier(true), lm0.ctx.barrier(true))
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.surprisalScoreStreaming(lm,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bigram"),
        r.getAs[Long]("n_backoff"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("mean_bits_ppm")))
      this.synchronized { collected ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = CorpusStats.bigramScore(lm, docs.where(isArr), "doc_id",
        "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_bigram"), r.getAs[Long]("n_backoff"),
        r.getAs[Long]("n_oov"), r.getAs[Long]("mean_bits_ppm"))).toSeq
    assert(collected.nonEmpty && collected.sortBy(_._1).toSeq === batch)
  }

  test("streaming shard pack: final state equals the arrival-order batch " +
      "manifest") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    // id-ordered feed split across two batches (the d2/d3 convention)
    val arriving = docs.select($"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, String)].collect()
    val last = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.shardPackStreaming(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", shards = 16,
      budget = 512L) { df =>
      val rows = df.collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm")))
      this.synchronized { rows.foreach { case (k, v) => last(k) = v } }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val batch = Packing.shardPackArrival(docs, "doc_id", "text",
        shards = 16, budget = 512L)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm"))).toMap
    assert(last.nonEmpty && last.toMap === batch)
  }

  test("streaming indexed retrieval matches the batch IVF probe across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Ann, Retrieval}
    import graft.functions.{TextOps, VectorOps}
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(10)) >= 8
    val corpus = Retrieval.chunkIndexCorpus(docs.where(!isArr), "doc_id",
      "text", win = 32L, stride = 24L, dim = 16)
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "chunk-idx-spec").toString
    Ann.writeIndex(corpus, "ckey", "emb", k = 8, iters = 2, base)
    val idx = Ann.readIndex(spark, base)
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.indexedRetrievalStreaming(idx,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      dim = 16, nprobe = 2, k = 3) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Double]("sim"))).sortBy(t => (t._1, t._2)).toSeq
    }
    val batchQueries = docs.where(isArr)
      .select($"doc_id".as("q_id"), TextOps.polyHash($"text").as("h"))
      .select($"q_id", transform(VectorOps.mockEmbedding($"h", 16),
        x => x.cast("float")).as("q_emb"))
    val batch = Retrieval.indexedChunkTopK(idx, batchQueries, "doc_id",
        nprobe = 2, k = 3)
      .orderBy($"q_id", $"rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Double]("sim"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // every arriving doc gets exactly k answers (probed lists >> k docs)
    assert(streamed.groupBy(_._1).forall(_._2.length == 3))
  }

  test("streaming length gate matches the batch band across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sampling
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isArr = pmod($"doc_id", lit(10)) >= 8
    val th = Sampling.lengthThresholds(docs.where(!isArr), "text",
      loPpm = 50000L, hiPpm = 950000L).barrier(true)
    val arriving = docs.where(isArr)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.lengthGateStreaming(th,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n")))
        .sortBy(_._1).toSeq
    }
    val batch = graft.SparkEntry.queries("d25_stream_length_gate")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n")))
      .toSeq
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.length < arriving.length, "the gate must actually trim")
  }

  test("streaming funnel: final per-user state equals the batch staged " +
      "joins (ordered feed)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
    val feed = events.select($"user_id", $"event_type",
        unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, String, Long, Long)].collect()
      .sortBy(r => (r._3, r._4))
    val last = scala.collection.mutable.Map[Long, (Long, Long)]()
    val ms = MemoryStream[(Long, String, Long, Long)]
    val q = Streams.funnelStreaming(
      ms.toDF().toDF("user_id", "event_type", "us", "event_id")
        .withColumn("ts", timestamp_micros($"us"))) { df =>
      last.synchronized {
        df.collect().foreach { r =>
          last(r.getAs[Long]("user_id")) =
            (r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))
        }
      }
    }
    val (b1, b2) = feed.splitAt(feed.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = last.synchronized {
      last.toSeq.map { case (u, (st, e)) => (u, st, e) }.sortBy(_._1)
    }
    val batch = graft.SparkEntry.queries("d26_stream_funnel")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // the dense sf corpus converts every user — the staged rule is
    // pinned order-sensitively by FunnelCohortSpec instead
    assert(streamed.map(_._2).max === 3L)
  }

  test("streaming retention: summed novel emissions equal the batch " +
      "cohort matrix (ordered feed)") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
    val feed = events.select($"user_id",
        expr("unix_micros(ts) div 604800000000").as("week"), $"event_id")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3))
    val acc = scala.collection.mutable.Map[(Long, Long), Long]()
    val ms = MemoryStream[(Long, Long, Long)]
    val q = Streams.retentionStreaming(
      ms.toDF().toDF("user_id", "week", "event_id")
        .withColumn("ts", timestamp_micros($"week" * 604800000000L))) { df =>
      acc.synchronized {
        df.collect().foreach { r =>
          val k = (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"))
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
      }
    }
    val (b1, b2) = feed.splitAt(feed.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = acc.synchronized {
      acc.toSeq.map { case ((c, o), n) => (c, o, n) }.sortBy(t => (t._1, t._2))
    }
    val batch = graft.SparkEntry.queries("d27_stream_retention")(spark, sf)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // novelty is real: duplicate active weeks within a user count once
    assert(streamed.map(_._3).sum < feed.length)
  }

  test("streaming decontamination gate matches the batch scrub across " +
      "batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextOps
    import graft.util.Barriers.BarrierOps
    val docs = Tables.documents(spark, sf)
    val isEval = pmod($"doc_id", lit(37)) === 0
    val isArr = pmod($"doc_id", lit(10)) >= 8
    val evalSh = docs.where(isEval)
      .select($"doc_id".as("eval_id"),
        explode(array_distinct(TextOps.shingleHashes($"text"))).as("h"))
      .barrier(true)
    val evalSizes = evalSh.groupBy($"eval_id")
      .agg(count(lit(1)).as("n_eval_shingles")).barrier(true)
    val arriving = docs.where(isArr && !isEval)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.decontaminateStreaming(evalSh, evalSizes,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      minPpm = 100000L) { df =>
      collected.synchronized { collected ++= df.collect() }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("worst_ppm"))).sortBy(_._1).toSeq
    }
    val batch = graft.SparkEntry
      .queries("d28_stream_decontaminate")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("worst_ppm"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.length <= arriving.length)
  }

  test("streaming fuzzy decontamination gate matches the batch gate " +
      "across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val isEval = pmod($"doc_id", lit(37)) === 0
    val idx = Dedup.fuzzyEvalIndex(docs.where(isEval), "doc_id", "text")
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8 && !isEval)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.fuzzyDecontaminateStreaming(idx,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      minPpm = 300000L) { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("worst_j_ppm")))
      collected.synchronized { collected ++= rows }
    }
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized { collected.sortBy(_._1).toSeq }
    val batch = graft.SparkEntry
      .queries("d30_stream_fuzzy_decontaminate")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("worst_j_ppm"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.length <= arriving.length)
  }

  test("streaming span-redaction gate matches the batch gate " +
      "across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val widx = Dedup.WindowIndex(
      Dedup.buildWindowIndex(corpus, "doc_id", "text", w = 16))
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Long, Long, String)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.spanRedactStreaming(widx,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", w = 16) { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("kept_ppm"), r.getAs[String]("redacted_text")))
      collected.synchronized { collected ++= rows }
    }
    val third = arriving.length / 3
    val (b1, rest) = arriving.splitAt(third)
    val (b2, b3) = rest.splitAt(third)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      ms.addData(b3.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized { collected.sortBy(_._1).toSeq }
    val batch = graft.SparkEntry
      .queries("d33_stream_span_redact")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("kept_ppm"), r.getAs[String]("redacted_text")))
      .toSeq
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.length === arriving.length)
  }

  test("streaming filtered ANN matches the batch probe across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    val emb = Tables.embeddings(spark, sf)
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base, Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding"))
    val arriving = emb.where($"vec_id" >= 5 &&
        pmod($"vec_id", lit(10)) >= 8)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      (Long, Int, Long, Int, Long)]()
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val q = Streams.filteredAnnStreaming(idx,
      ms.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", "label", nprobe = 3, k = 3) { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("q_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Int]("label"), r.getAs[Long]("c_id")))
      collected.synchronized { collected ++= rows }
    }
    val third = arriving.length / 3
    val (b1, rest) = arriving.splitAt(third)
    val (b2, b3) = rest.splitAt(third)
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      ms.addData(b3.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.sortBy(r => (r._1, r._2)).toSeq
    }
    val batch = Ann.indexedFilteredTopK(idx,
        emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) >= 8),
        "vec_id", "embedding", "label", nprobe = 3, k = 3)
      .orderBy($"q_id", $"rank")
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Int]("label"),
        r.getAs[Long]("c_id"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming ANN freshness matches the batch replay and answers " +
      "include prior arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val emb = Tables.embeddings(spark, sf)
    val base = emb.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val centDf = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).barrier(true)
    val idx = Ann.IvfIndex(
      centDf.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base, Ann.centTable(centDf, "vec_id", "embedding"),
        "vec_id", "embedding").barrier(true))
    val arrivalsDf = emb.where($"vec_id" >= 5 &&
      pmod($"vec_id", lit(10)) >= 8)
    val arriving = arrivalsDf.select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val collected = scala.collection.mutable.ArrayBuffer[
      (Long, Int, Long, Long, Double, Long)]()
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val q = Streams.annFreshnessStreaming(idx,
      ms.toDF().toDF("vec_id", "embedding", "label"), "vec_id",
      "embedding", nprobe = 2, k = 3) { df =>
      val rows = df.collect().map(r => (r.getAs[Long]("q_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Long]("c_id"), r.getAs[Double]("sim"),
        r.getAs[Long]("fresh")))
      collected.synchronized { collected ++= rows }
    }
    // feed the replay's batch axis: slice i = vec_id mod 4 == i, in
    // batch order, so the stream's bid reproduces the contract
    try {
      (0 until 4).foreach { b =>
        ms.addData(arriving.filter(_._1 % 4 == b).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = collected.synchronized {
      collected.sortBy(r => (r._1, r._2)).toSeq
    }
    val batch = Ann.freshTopK(idx, arrivalsDf, "vec_id", "embedding",
        nBatches = 4, nprobe = 2, k = 3)
      .orderBy($"q_id", $"rank")
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Long]("c_id"),
        r.getAs[Double]("sim"), r.getAs[Long]("fresh"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
    // the freshness is real on this data: some answer is an arrival
    // a stale-index probe would have missed
    assert(streamed.exists(_._6 == 1L))
    // and batch-0 queries see only the base index
    val firstBatch = streamed.filter(_._1 % 4 == 0)
    assert(firstBatch.nonEmpty && firstBatch.forall(_._6 == 0L))
  }

  test("streaming keeper-upgrade monitor converges to the batch " +
      "challenge across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val idx = Dedup.buildIndex(corpus, "doc_id", "text", k = 48,
      bands = 24)
    val m = Dedup.deduplicate(corpus, "doc_id", "text", 0.5)
    val clusters = corpus.select($"doc_id".as("did"))
      .join(m.select($"doc_id".as("did"), $"keeper"), Seq("did"), "left")
      .select($"did", coalesce($"keeper", $"did").as("cluster"))
    val corpusQ = Dedup.qualityPpm(corpus, "doc_id", "text")
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"cluster").collect().map(r => (r.getAs[Long]("cluster"),
        r.getAs[Long]("n_challengers"), r.getAs[Long]("inc_best_id"),
        r.getAs[Long]("inc_best_q_ppm"), r.getAs[Long]("cur_best_id"),
        r.getAs[Long]("cur_best_q_ppm"), r.getAs[Long]("upgraded"))).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, Long, Long, Long, Long, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.keeperUpgradeStreaming(idx, clusters, corpusQ,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      tau = 0.5) { df =>
      val r = rows(df)
      emissions.synchronized { emissions += r }
    }
    val half = arriving.length / 2
    try {
      ms.addData(arriving.take(half)); q.processAllAvailable()
      ms.addData(arriving.drop(half)); q.processAllAvailable()
    } finally q.stop()
    val batch = rows(graft.SparkEntry
      .queries("d31_stream_keeper_upgrade")(spark, sf))
    val ems = emissions.synchronized { emissions.toSeq }
    assert(ems.length === 2 && ems.last === batch && batch.nonEmpty)
    // challenger sets only grow: every cluster in emission 1 is
    // still challenged in emission 2 with >= as many challengers
    val first = ems.head.map(r => r._1 -> r._2).toMap
    val last = ems.last.map(r => r._1 -> r._2).toMap
    assert(first.keySet.subsetOf(last.keySet))
    assert(first.forall { case (c, n) => last(c) >= n })
  }

  // ---- event-time disorder hardening (r6 verdict item 3) ----------
  // Real streams are disordered within the watermark. The stateful
  // trackers fold each micro-batch's per-key group in (event-time,
  // id) order INSIDE flatMapGroupsWithState, so any within-batch
  // arrival order must produce the identical final state. These cases
  // feed the same two-batch splits as the ordered-feed tests above
  // but PERMUTE each batch's rows (fixed seed); expectations are the
  // same batch-replay oracles, unchanged.

  private def permuted[T](rows: Seq[T], seed: Int): Seq[T] =
    new scala.util.Random(seed).shuffle(rows)

  test("sessionize is invariant under permuted within-batch arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000000L
    val ms = MemoryStream[Raw]
    val q = Streams.sessionizeStreaming(ms.toDF(), gap)
      .writeStream.format("memory").queryName("sess_perm")
      .outputMode("append").start()
    val (b1, b2) = rawRows.toSeq.splitAt(rawRows.length / 2)
    try {
      ms.addData(permuted(b1, 7)); q.processAllAvailable()
      ms.addData(permuted(b2, 11)); q.processAllAvailable()
    } finally { q.stop() }
    val streamed = spark.table("sess_perm")
      .orderBy($"user_id", $"session_idx").collect()
    val batch = Streams.sessionize(eventsDf, gap).toDF()
    val lastIdx = batch.groupBy($"user_id")
      .agg(max($"session_idx").as("last_idx"))
    val closed = batch.join(lastIdx, "user_id")
      .where($"session_idx" < $"last_idx")
      .select(batch.columns.map(col): _*)
      .orderBy($"user_id", $"session_idx").collect()
    assert(streamed.toSeq === closed.toSeq)
  }

  test("ooo sessionize: cross-batch disordered feed equals the batch " +
      "sessions (watermark-bounded reorder buffer)") {
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800000000L
    // three ts-ordered parts; a deterministic slice of each part's
    // 36h event-time TAIL (inside the 48h watermark) arrives one
    // batch LATE, shuffled among the next part's events — the
    // cross-batch disorder the ordered-feed flavor cannot absorb
    val ordered = rawRows.toSeq
    val n = ordered.length
    val parts = Seq(ordered.slice(0, n / 3),
      ordered.slice(n / 3, 2 * n / 3), ordered.slice(2 * n / 3, n))
    val H36 = 36L * 3600 * 1000
    def splitLate(p: Seq[Raw]) = {
      val maxMs = p.map(_.ts.getTime).max
      p.partition(r =>
        r.ts.getTime >= maxMs - H36 && r.event_id % 3 == 0)
    }
    val (late1, on1) = splitLate(parts(0))
    val (late2, on2) = splitLate(parts(1))
    assert(late1.nonEmpty && late2.nonEmpty, "the lateness window is empty")
    val rnd = new scala.util.Random(13)
    val b2 = rnd.shuffle(late1 ++ on2)
    val b3 = rnd.shuffle(late2 ++ parts(2))
    // a far-future sentinel on a synthetic user advances the global
    // watermark past every real event, so the event-time timeouts
    // fold every buffer (each real user's open tail stays unemitted,
    // same as the ordered flavor)
    val maxMs = ordered.map(_.ts.getTime).max
    val sentinel = Raw(-1L,
      new java.sql.Timestamp(maxMs + 90L * 24 * 3600 * 1000),
      -1L, "view", 0.0)
    val ms = MemoryStream[Raw]
    val q = Streams.sessionizeStreamingOoo(ms.toDF(), gap, delay = "48 hours")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    try {
      ms.addData(on1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_ooo").where($"user_id" =!= -1L)
      .orderBy($"user_id", $"session_idx").collect()
    val batch = Streams.sessionize(eventsDf, gap).toDF()
    val lastIdx = batch.groupBy($"user_id")
      .agg(max($"session_idx").as("last_idx"))
    val closed = batch.join(lastIdx, "user_id")
      .where($"session_idx" < $"last_idx")
      .select(batch.columns.map(col): _*)
      .orderBy($"user_id", $"session_idx").collect()
    assert(streamed.toSeq === closed.toSeq)
  }

  test("streaming funnel is invariant under permuted within-batch arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
    val feed = events.select($"user_id", $"event_type",
        unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, String, Long, Long)].collect()
      .sortBy(r => (r._3, r._4))
    val last = scala.collection.mutable.Map[Long, (Long, Long)]()
    val ms = MemoryStream[(Long, String, Long, Long)]
    val q = Streams.funnelStreaming(
      ms.toDF().toDF("user_id", "event_type", "us", "event_id")
        .withColumn("ts", timestamp_micros($"us"))) { df =>
      last.synchronized {
        df.collect().foreach { r =>
          last(r.getAs[Long]("user_id")) =
            (r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))
        }
      }
    }
    val (b1, b2) = feed.toSeq.splitAt(feed.length / 2)
    try {
      ms.addData(permuted(b1, 7)); q.processAllAvailable()
      ms.addData(permuted(b2, 11)); q.processAllAvailable()
    } finally q.stop()
    val streamed = last.synchronized {
      last.toSeq.map { case (u, (st, e)) => (u, st, e) }.sortBy(_._1)
    }
    val batch = graft.SparkEntry.queries("d26_stream_funnel")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming retention is invariant under permuted within-batch arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sf)
    val feed = events.select($"user_id",
        expr("unix_micros(ts) div 604800000000").as("week"), $"event_id")
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3))
    val acc = scala.collection.mutable.Map[(Long, Long), Long]()
    val ms = MemoryStream[(Long, Long, Long)]
    val q = Streams.retentionStreaming(
      ms.toDF().toDF("user_id", "week", "event_id")
        .withColumn("ts", timestamp_micros($"week" * 604800000000L))) { df =>
      acc.synchronized {
        df.collect().foreach { r =>
          val k = (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"))
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
      }
    }
    val (b1, b2) = feed.toSeq.splitAt(feed.length / 2)
    try {
      ms.addData(permuted(b1, 7)); q.processAllAvailable()
      ms.addData(permuted(b2, 11)); q.processAllAvailable()
    } finally q.stop()
    val streamed = acc.synchronized {
      acc.toSeq.map { case ((c, o), n) => (c, o, n) }.sortBy(t => (t._1, t._2))
    }
    val batch = graft.SparkEntry.queries("d27_stream_retention")(spark, sf)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming shard pack is invariant under permuted within-batch arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    val arriving = docs.select($"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, String)].collect()
    val last = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Long)]()
    val ms = MemoryStream[(Long, String)]
    val q = Streams.shardPackStreaming(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", shards = 16,
      budget = 512L) { df =>
      val rows = df.collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm")))
      this.synchronized { rows.foreach { case (k, v) => last(k) = v } }
    }
    val (b1, b2) = arriving.toSeq.splitAt(arriving.length / 2)
    try {
      ms.addData(permuted(b1, 7)); q.processAllAvailable()
      ms.addData(permuted(b2, 11)); q.processAllAvailable()
    } finally q.stop()
    val batch = Packing.shardPackArrival(docs, "doc_id", "text",
        shards = 16, budget = 512L)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm"))).toMap
    assert(last.nonEmpty && last.toMap === batch)
  }

  /** Slices the ts-ordered event feed into three batches with
    * deterministic CROSS-BATCH disorder: a slice of each of the first
    * two thirds' 36h event-time tails (inside a 48h watermark)
    * arrives one batch late, shuffled into the next third — the
    * disorder an ordered-feed tracker cannot absorb. Returns the
    * three batches plus a far-future sentinel row (synthetic user
    * -1) that advances the global watermark past every real event so
    * the event-time timeouts drain every reorder buffer. */
  private def disorderedFeed(seed: Int): (Seq[Raw], Seq[Raw], Seq[Raw], Raw) = {
    val ordered = rawRows.toSeq
    val n = ordered.length
    val parts = Seq(ordered.slice(0, n / 3),
      ordered.slice(n / 3, 2 * n / 3), ordered.slice(2 * n / 3, n))
    val H36 = 36L * 3600 * 1000
    def splitLate(p: Seq[Raw]) = {
      val maxMs = p.map(_.ts.getTime).max
      p.partition(r => r.ts.getTime >= maxMs - H36 && r.event_id % 3 == 0)
    }
    val (late1, on1) = splitLate(parts(0))
    val (late2, on2) = splitLate(parts(1))
    assert(late1.nonEmpty && late2.nonEmpty, "the lateness window is empty")
    val rnd = new scala.util.Random(seed)
    val maxMs = ordered.map(_.ts.getTime).max
    val sentinel = Raw(-1L,
      new java.sql.Timestamp(maxMs + 90L * 24 * 3600 * 1000),
      -1L, "view", 0.0)
    (on1, rnd.shuffle(late1 ++ on2), rnd.shuffle(late2 ++ parts(2)), sentinel)
  }

  test("streaming dedup churn converges to the batch snapshot audit " +
      "across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val v1 = docs.where(pmod($"doc_id", lit(10)) < 8)
    val oldIdx = Dedup.buildIndex(v1, "doc_id", "text", k = 48,
      bands = 24)
    val sources = docs.select($"doc_id".as("sid"), $"source".as("src"))
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 2)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    val emissions = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(String, Long, Long, Long)]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.dedupChurnStreaming(oldIdx, sources,
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      tau = 0.5) { df =>
      val rows = df.orderBy($"status").collect()
        .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("j_ppm_sum"), r.getAs[Long]("n_cross_source")))
        .toSeq
      emissions.synchronized { emissions += rows }
    }
    val third = arriving.length / 3
    try {
      ms.addData(arriving.slice(0, third)); q.processAllAvailable()
      ms.addData(arriving.slice(third, 2 * third)); q.processAllAvailable()
      ms.addData(arriving.drop(2 * third)); q.processAllAvailable()
    } finally q.stop()
    val batch = graft.SparkEntry.queries("d29_stream_dedup_churn")(spark, sf)
      .collect().map(r => (r.getAs[String]("status"),
        r.getAs[Long]("n_pairs"), r.getAs[Long]("j_ppm_sum"),
        r.getAs[Long]("n_cross_source"))).toSeq
    val ems = emissions.synchronized { emissions.toSeq }
    assert(ems.length === 3, "one emission per micro-batch")
    assert(ems.last === batch)
    // mid-stream the monitor reads "as if the stream ended now":
    // every old pair not yet re-verified counts resolved, so the
    // resolved counter is monotonically non-increasing
    val resolved = ems.map(_.collectFirst {
      case ("resolved", n, _, _) => n }.getOrElse(0L))
    assert(resolved.sliding(2).forall { case Seq(a, b) => b <= a })
  }

  test("ooo shard pack: cross-batch disordered feed equals the batch " +
      "arrival-order manifest (watermark-bounded reorder buffer)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Packing
    val docs = Tables.documents(spark, sf)
    // synthetic ingest time monotone in doc_id, 10 min apart — each
    // third of the 500-doc feed spans ~28h, inside the 48h watermark,
    // so a late slice from anywhere in a third is still foldable
    val baseMs = 1700000000000L
    val arriving = docs.select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
      .map { case (i, t) =>
        DocT(i, t, new java.sql.Timestamp(baseMs + i * 600000L)) }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3),
      arriving.slice(n / 3, 2 * n / 3), arriving.slice(2 * n / 3, n))
    val (late1, on1) = parts(0).partition(_.doc_id % 3 == 0)
    val (late2, on2) = parts(1).partition(_.doc_id % 3 == 0)
    assert(late1.nonEmpty && late2.nonEmpty)
    val rnd = new scala.util.Random(23)
    val b2 = rnd.shuffle(late1 ++ on2)
    val b3 = rnd.shuffle(late2 ++ parts(2))
    val maxMs = arriving.map(_.ts.getTime).max
    val sentinel = DocT(-1L, "watermark sentinel",
      new java.sql.Timestamp(maxMs + 90L * 24 * 3600 * 1000))
    val last = scala.collection.mutable.Map[Long,
      (Long, Long, Long, Long, Long)]()
    val sawEmpty = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ms = MemoryStream[DocT]
    val q = Streams.shardPackStreamingOoo(ms.toDF(), "doc_id", "text",
      shards = 16, budget = 512L, delay = "48 hours") { df =>
      val rows = df.collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm")))
      // a shard whose docs are all still held in the reorder buffer
      // must not emit a manifest row (an empty state would read as a
      // fully-filled tail: n_tokens=0 -> tail_fill_ppm=1000000)
      if (rows.exists(_._2._1 == 0L)) sawEmpty.set(true)
      last.synchronized { rows.foreach { case (k, v) => last(k) = v } }
    }
    try {
      ms.addData(on1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    // the sentinel doc itself never folds (always above watermark) —
    // its shard's last emission covers exactly the real docs
    val batch = Packing.shardPackArrival(docs, "doc_id", "text",
        shards = 16, budget = 512L)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddle"),
          r.getAs[Long]("tail_fill_ppm"))).toMap
    val streamed = last.synchronized { last.toMap }
    assert(streamed.nonEmpty && streamed === batch)
    assert(!sawEmpty.get(), "a nothing-folded-yet shard emitted a manifest row")
  }

  test("ooo funnel: cross-batch disordered feed equals the batch " +
      "staged-min-join (watermark-bounded reorder buffer)") {
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2, b3, sentinel) = disorderedFeed(17)
    val last = scala.collection.mutable.Map[Long, (Long, Long)]()
    val ms = MemoryStream[Raw]
    val q = Streams.funnelStreamingOoo(ms.toDF(), delay = "48 hours") { df =>
      last.synchronized {
        df.collect().foreach { r =>
          last(r.getAs[Long]("user_id")) =
            (r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))
        }
      }
    }
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val streamed = last.synchronized {
      last.toSeq.collect { case (u, (st, e)) if u >= 0 => (u, st, e) }
        .sortBy(_._1)
    }
    val batch = graft.SparkEntry.queries("d26_stream_funnel")(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("stage"), r.getAs[Long]("entry_us"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("ooo retention: cross-batch disordered feed equals the batch " +
      "cohort cells (first-event reorder buffer)") {
    implicit val sqlCtx = spark.sqlContext
    val (b1, b2, b3, sentinel) = disorderedFeed(19)
    val sentinelWeek = sentinel.ts.getTime * 1000L / 604800000000L
    val acc = scala.collection.mutable.Map[(Long, Long), Long]()
    val ms = MemoryStream[Raw]
    val q = Streams.retentionStreamingOoo(ms.toDF(), delay = "48 hours") { df =>
      acc.synchronized {
        df.collect().foreach { r =>
          val k = (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"))
          acc(k) = acc.getOrElse(k, 0L) + 1L
        }
      }
    }
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(b3); q.processAllAvailable()
      ms.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val streamed = acc.synchronized {
      acc.toSeq.collect { case ((c, o), cnt) if c != sentinelWeek =>
        (c, o, cnt) }.sortBy(t => (t._1, t._2))
    }
    val batch = graft.SparkEntry.queries("d27_stream_retention")(spark, sf)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_active"))).toSeq
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("streaming sketch fold: drained emission equals the d40 batch " +
      "sketch; per-bucket counts are monotone across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{CorpusStats, QuantileSketch}
    val docs = Tables.documents(spark, sf)
    val lm = CorpusStats.bigramLm(
      docs.where(pmod($"doc_id", lit(10)) < 8), "text")
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val marks = Seq("p50" -> 500000L, "p90" -> 900000L,
      "p99" -> 990000L)
    type Row8 = (Long, Long, Long, Long, Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[Row8] =
      df.collect().map(r => (r.getAs[Long]("bucket"),
        r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n"),
        r.getAs[Long]("cum"), r.getAs[Long]("p50"),
        r.getAs[Long]("p90"), r.getAs[Long]("p99")))
        .sortBy(_._1).toSeq
    val emissions =
      scala.collection.mutable.ArrayBuffer.empty[Seq[Row8]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.sketchFoldStreaming(lm,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text", marks,
        stateProbe = { st =>
          val c = st.count()
          val d = st.select($"bucket").distinct().count()
          this.synchronized { stateRows += ((c, d)) }
        }) {
      df => val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(
      graft.SparkEntry.queries("d40_stream_sketch_fold")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // the sketch only accumulates: per-bucket n is monotone
    val per = emissions.map(_.map(t => t._1 -> t._4).toMap)
    per.sliding(2).foreach { w =>
      w(0).foreach { case (b, cnt) =>
        assert(cnt <= w(1).getOrElse(b, Long.MaxValue),
          s"bucket $b count went backwards") }
    }
    // cross-batch state is COMPACTED at fold time: the materialized
    // partials hold exactly one row per occupied bucket after every
    // batch — never O(batches × buckets) — and stay under the 252
    // HDR-bucket bound however long the stream runs
    assert(stateRows.size === 3)
    stateRows.foreach { case (c, d) =>
      assert(c === d, s"state carries duplicate bucket rows ($c vs $d)")
      assert(c <= 252L)
    }
  }

  test("streaming KS monitor: drained emission equals the d42 batch " +
      "contract under arbitrary slicing") {
    implicit val sqlCtx = spark.sqlContext
    val arriving = Tables.documents(spark, sf)
      .where(pmod($"doc_id", lit(10)) >= 8)
      .select($"source",
        size(graft.functions.TextOps.tokens($"text")).cast("long")
          .as("v"))
      .as[(String, Long)].collect()
    val emissions = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(String, Long, Long)]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ms = MemoryStream[(String, Long)]
    val q = Streams.ksDriftStreaming(
        ms.toDF().toDF("source", "v"), "source", "v",
        stateProbe = { st =>
          val c = st.count()
          val d = st.select($"source", $"bucket").distinct().count()
          this.synchronized { stateRows += ((c, d)) }
        }) { df =>
      val rows = df.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("ks_ppm")))
        .sortBy(_._1).toSeq
      this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = graft.SparkEntry.queries("d42_stream_ks_monitor")(
        spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("ks_ppm"))).sortBy(_._1).toSeq
    assert(emissions.size === 3 && emissions.last === batch)
    // compacted-at-fold state: one row per (source, bucket) after
    // every batch, bounded by |sources| × 252 — not by batch count
    assert(stateRows.size === 3)
    stateRows.foreach { case (c, d) =>
      assert(c === d, s"state carries duplicate (source,bucket) rows")
      assert(c <= 4L * 252L)
    }
  }

  test("streaming bottom-k fold: drained emission equals the d43 batch " +
      "contract under arbitrary slicing; estimate monotone; state " +
      "bounded by strata x k") {
    implicit val sqlCtx = spark.sqlContext
    val arriving = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
    type R = (String, Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("rk"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("h"), r.getAs[Long]("est_distinct")))
        .sortBy(t => (t._1, t._2)).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(String, Long, String)]
    val q = Streams.bottomKFoldStreaming(
        ms.toDF().toDF("source", "doc_id", "text"),
        "source", "doc_id", "text",
        stateProbe = { st =>
          val c = st.count(); this.synchronized { stateRows += c }
        }) { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries("d43_stream_bottomk_fold")(
      spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // the estimate only refines upward: h_k is non-increasing under
    // the fold, so est = (k-1)P div h_k is non-decreasing per source
    // once the stratum holds k rows
    val perSrc = emissions.map(_.groupBy(_._1).view
      .mapValues(rs => (rs.size, rs.map(_._5).max)).toMap)
    perSrc.sliding(2).foreach { w =>
      w(0).foreach { case (src, (cnt, est)) =>
        if (cnt == 8)
          assert(est <= w(1)(src)._2, s"$src estimate went backwards")
      }
    }
    // state bounded: never more than |sources| x k rows
    val nSources = arriving.map(_._1).distinct.length
    assert(stateRows.size === 3)
    stateRows.foreach(c => assert(c <= nSources.toLong * 8L))
  }

  test("streaming priority fold: drained emission equals the d47 batch " +
      "contract under arbitrary slicing; state bounded by strata x (k+1)") {
    implicit val sqlCtx = spark.sqlContext
    val arriving = Tables.documents(spark, sf)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
    type R = (String, Long, Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("rk"), r.getAs[Long]("did"), r.getAs[Long]("w"),
        r.getAs[Long]("priority"), r.getAs[Long]("est_mass")))
        .sortBy(t => (t._1, t._2)).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(String, Long, String)]
    val q = Streams.priorityFoldStreaming(
        ms.toDF().toDF("source", "doc_id", "text"),
        "source", "doc_id", "text",
        stateProbe = { st =>
          val c = st.count(); this.synchronized { stateRows += c }
        }) { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries(
      "d47_stream_priority_fold")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // state bounded: never more than |sources| x (k+1) rows
    val nSources = arriving.map(_._1).distinct.length
    assert(stateRows.size === 3)
    stateRows.foreach(c => assert(c <= nSources.toLong * 9L))
    // the kept sample is mass-biased: kept docs' mean token count
    // exceeds the corpus mean (the point of priority sampling)
    val keptW = emissions.last.map(_._4)
    val corpusMeanTimesKept = Tables.documents(spark, sf)
      .select(size(split($"text", " ")).cast("long").as("w"))
      .agg(avg($"w")).as[Double].head() * keptW.size
    assert(keptW.sum > corpusMeanTimesKept,
      s"priority sample not mass-biased: ${keptW.sum} vs $corpusMeanTimesKept")
  }

  test("streaming edit-verify gate: union of per-batch emissions " +
      "equals the d49 batch contract; a planted near-copy is flagged " +
      "in its own batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // plant: an exact copy of a corpus doc arrives in the LAST batch
    val copied = corpus.select($"text").as[String].head()
    val planted = (990000L, copied)
    type R = (Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("dist"), r.getAs[Long]("sim_ppm"))).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.editVerifyStreaming(corpus,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 2).toSeq,
      (arriving.slice(n / 2, n) :+ planted).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    assert(emissions.size === 2)
    // the planted exact copy is flagged in its own batch at sim 1e6
    assert(emissions.last.exists(r => r._1 === 990000L && r._3 === 0L
      && r._4 === 1000000L))
    // stateless gate: union of emissions (minus the plant) equals the
    // batch contract over the same arrivals
    val got = emissions.flatten.filterNot(_._1 == 990000L)
      .sortBy(t => (t._1, t._2))
    val batch = toRows(graft.SparkEntry.queries(
      "d49_stream_edit_verify")(spark, sf)).sortBy(t => (t._1, t._2))
    assert(got === batch)
  }

  test("streaming split router: union of per-batch emissions equals " +
      "the d50 batch contract; a planted corpus near-copy inherits " +
      "its cluster's split") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val idx = Dedup.buildIndex(corpus, "doc_id", "text", 48, 24)
    val keepers = Dedup.deduplicate(corpus, "doc_id", "text", 0.5)
      .cache()
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // plant an exact copy of a corpus doc as a new arrival
    val (srcId, srcText) = corpus.select($"doc_id", $"text")
      .as[(Long, String)].head()
    val planted = (990000L, srcText)
    type R = (Long, Long, Long, String)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("matched"), r.getAs[Long]("keeper"),
        r.getAs[String]("split"))).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.splitRouteStreaming(idx, keepers,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 2).toSeq,
      (arriving.slice(n / 2, n) :+ planted).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    assert(emissions.size === 2)
    // the plant matched and inherited the CORPUS doc's cluster split
    val srcKeeper = keepers.where($"doc_id" === srcId)
      .select($"keeper").as[Long].collect().headOption.getOrElse(srcId)
    val plantRow = emissions.last.find(_._1 == 990000L).get
    assert(plantRow._2 === 1L && plantRow._3 === srcKeeper)
    // stateless: union of emissions (minus the plant) equals the
    // batch contract
    val got = emissions.flatten.filterNot(_._1 == 990000L)
      .sortBy(_._1)
    val batch = toRows(graft.SparkEntry.queries(
      "d50_stream_split_router")(spark, sf)).sortBy(_._1)
    assert(got === batch)
    // every arrival got exactly one route
    assert(got.map(_._1) === arriving.map(_._1).sorted.toSeq)
  }

  test("streaming contamination route: union of per-batch emissions " +
      "equals the d51 batch contract; a planted verbatim arrival is " +
      "flagged in its own batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf)
    val train = docs.where(pmod($"doc_id", lit(97)) =!= 0)
      .select($"doc_id".as("did"), $"text".as("t"))
    val idx = Retrieval.contaminationIndex(train)
    val arriving = docs.where(pmod($"doc_id", lit(97)) === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val copied = train.select($"t").as[String].head()
    val planted = (990000L, copied)
    type R = (Long, Long, Long, String)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("eval_id"),
        r.getAs[Long]("verbatim"), r.getAs[Long]("j_max_ppm"),
        r.getAs[String]("verdict"))).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.contaminationRouteStreaming(idx,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 2).toSeq,
      (arriving.slice(n / 2, n) :+ planted).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    assert(emissions.size === 2)
    val plantRow = emissions.last.find(_._1 == 990000L).get
    assert(plantRow._2 === 1L && plantRow._4 === "verbatim")
    val got = emissions.flatten.filterNot(_._1 == 990000L).sortBy(_._1)
    val batch = toRows(graft.SparkEntry.queries(
      "d51_stream_contamination_route")(spark, sf)).sortBy(_._1)
    assert(got === batch)
  }

  test("streaming rate monitor: drained emission equals the d52 batch " +
      "contract under arbitrary slicing; a planted burst hour is " +
      "flagged; spikes are pure functions of the folded grid") {
    implicit val sqlCtx = spark.sqlContext
    val arriving = Tables.events(spark, sf)
      .select($"event_type", unix_micros($"ts").as("us"))
      .as[(String, Long)].collect()
    type R = (String, Long, Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("hr"), r.getAs[Long]("n"),
        r.getAs[Long]("trail_sum"), r.getAs[Long]("trail_hours"),
        r.getAs[Long]("spike")))
        .sortBy(t => (t._1, t._2)).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(String, Long)]
    val toEvents = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"event_type", timestamp_micros($"us").as("ts"))
    val q = Streams.rateMonitorStreaming(
        toEvents(ms.toDF().toDF("event_type", "us"))) { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries(
      "d52_stream_rate_monitor")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // planted burst: a quiet baseline then a 10x hour must flag, and
    // the identical stream sliced differently agrees (pure function)
    val base = (0 until 24).flatMap(h =>
      Seq.fill(4)(("burst", h * 3600000000L + 1L)))
    val burst = Seq.fill(40)(("burst", 24 * 3600000000L + 1L))
    val emissions2 = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms2 = MemoryStream[(String, Long)]
    val q2 = Streams.rateMonitorStreaming(
        toEvents(ms2.toDF().toDF("event_type", "us"))) { df =>
      val rows = toRows(df); this.synchronized { emissions2 += rows }
    }
    try Seq(base, burst).foreach { p =>
      ms2.addData(p); q2.processAllAvailable()
    } finally q2.stop()
    val burstRow = emissions2.last.find(r => r._1 == "burst" && r._2 == 24L).get
    // trailing day holds 96 events over all 24 hours -> mean 4/hr;
    // 40 > 12 -> spike
    assert(burstRow === (("burst", 24L, 40L, 96L, 24L, 1L)))
    // ramp-up hours (partial trailing day) are never flagged
    assert(emissions2.last.filter(_._2 < 24L).forall(_._6 === 0L))
  }

  test("streaming containment gate: union of per-batch emissions " +
      "equals the d53 batch contract; a planted quote arrival flags " +
      "at full containment with low jaccard") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(97)) =!= 0)
    val arriving = docs.where(pmod($"doc_id", lit(97)) === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // plant: the first 8 tokens of a long corpus doc as a new arrival
    val (srcId, srcText) = corpus
      .where(size(split($"text", " ")) >= 40)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val planted = (990000L, srcText.split(" ").take(8).mkString(" "))
    type R = (Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("c_arr_ppm"), r.getAs[Long]("j_ppm"))).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.containmentGateStreaming(corpus,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 2).toSeq,
      (arriving.slice(n / 2, n) :+ planted).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    assert(emissions.size === 2)
    // the planted quote is fully contained in its source doc while
    // jaccard sits deep in its blind region
    val plantRow = emissions.last
      .find(r => r._1 == 990000L && r._2 == srcId).get
    assert(plantRow._3 === 1000000L && plantRow._4 < 300000L)
    val got = emissions.flatten.filterNot(_._1 == 990000L)
      .sortBy(t => (t._1, t._2))
    val batch = toRows(graft.SparkEntry.queries(
      "d53_stream_containment_gate")(spark, sf)).sortBy(t => (t._1, t._2))
    assert(got === batch)
  }

  test("streaming kmv set-ops fold: drained emission equals the d48 " +
      "batch contract under arbitrary slicing; state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val arriving = Tables.documents(spark, sf)
      .select($"source", $"text")
      .as[(String, String)].collect()
    type R = (String, String, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("src_a"),
        r.getAs[String]("src_b"), r.getAs[Long]("shared_in_topk"),
        r.getAs[Long]("est_union"), r.getAs[Long]("est_inter")))
        .sortBy(t => (t._1, t._2)).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(String, String)]
    val q = Streams.kmvSetOpsStreaming(
        ms.toDF().toDF("source", "text"), "source", "text",
        stateProbe = { st =>
          val c = st.count(); this.synchronized { stateRows += c }
        }) { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries(
      "d48_stream_kmv_setops")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    val nSources = arriving.map(_._1).distinct.length
    assert(stateRows.size === 3)
    stateRows.foreach(c => assert(c <= nSources.toLong * 64L))
  }

  test("streaming pca fold: drained emission equals c96 and the d44 " +
      "batch contract under arbitrary slicing; state stays dims^2") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    val e = Tables.embeddings(spark, sf)
    val scale = Ann.pcaScale(e, "vec_id", "embedding")
    val arriving = e.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    type R = (Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("dim"),
        r.getAs[Long]("code_sum"), r.getAs[Long]("v_fix")))
        .sortBy(_._1).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ms = MemoryStream[(Long, Array[Float])]
    val q = Streams.pcaFoldStreaming(scale,
        ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        stateProbe = { st =>
          val c = st.count(); this.synchronized { stateRows += c }
        }) { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries("d44_stream_pca_fold")(
      spark, sf))
    val c96out = toRows(graft.SparkEntry.queries("c96_embedding_pca")(
      spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // the Gram route and c96's matrix-free route are integer-identical
    assert(batch === c96out)
    // state compacted at fold time: exactly dims^2 rows every batch
    assert(stateRows.size === 3 && stateRows.forall(_ === 64L * 64L))
  }

  test("streaming perplexity router: drained emission equals the d45 " +
      "batch contract under arbitrary slicing; state bounded") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CorpusStats
    val docs = Tables.documents(spark, sf)
    val (lm, th) = CorpusStats.perplexityThresholds(
      docs.where(pmod($"doc_id", lit(10)) < 8), "doc_id", "text")
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    type R = (String, String, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("source"),
        r.getAs[String]("bucket_label"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("sum_bits_ppm")))
        .sortBy(t => (t._1, t._2)).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String, String)]
    val q = Streams.perplexityRouteStreaming(lm, th,
        ms.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries(
      "d45_stream_perplexity_router")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // state bound: never more than |sources| x 3 label rows
    val nSources = arriving.map(_._3).distinct.length
    emissions.foreach(e => assert(e.size <= nSources * 3))
    // counts only accumulate across batches
    val tot = emissions.map(_.map(_._3).sum)
    assert(tot === tot.sorted)
  }

  test("streaming gopher gate: drained emission equals the d46 batch " +
      "contract under arbitrary slicing; state bounded; counts accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val arriving = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect()
    type R = (String, Long, Long, Long, Long, Long, Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("fail_len"),
        r.getAs[Long]("fail_wordlen"), r.getAs[Long]("fail_symbol"),
        r.getAs[Long]("fail_alpha"), r.getAs[Long]("fail_stop"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"),
        r.getAs[Long]("kept_ppm"))).sortBy(_._1).toSeq
    val emissions = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val ms = MemoryStream[(Long, String, String)]
    val q = Streams.gopherGateStreaming(
        ms.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source") { df =>
      val rows = toRows(df); this.synchronized { emissions += rows }
    }
    val n = arriving.length
    val parts = Seq(arriving.slice(0, n / 3).toSeq,
      arriving.slice(n / 3, 2 * n / 3).toSeq,
      arriving.slice(2 * n / 3, n).toSeq)
    try parts.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(graft.SparkEntry.queries(
      "d46_stream_gopher_gate")(spark, sf))
    assert(emissions.size === 3 && emissions.last === batch)
    // state bound: one row per source, whatever the stream length
    val nSources = arriving.map(_._3).distinct.length
    emissions.foreach(e => assert(e.size <= nSources))
    // counts only accumulate across batches
    val tot = emissions.map(_.map(_._2).sum)
    assert(tot === tot.sorted)
  }

  test("streaming span re-price: replay at the d41 slicing equals the " +
      "batch contract; a cross-batch duplicate redacts fully") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arrivals = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text")
    val widx0 = Dedup.WindowIndex(
      Dedup.buildWindowIndex(corpus, "doc_id", "text", 16))
    type R = (Long, Long, Long, Long, String)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("kept_ppm"), r.getAs[String]("redacted_text"))).toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.spanRepriceStreaming(widx0,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text", 16) { df =>
      val rows = toRows(df); this.synchronized { got ++= rows }
    }
    val slices = (0L to 3L).map(b => arrivals
      .where(pmod(expr("doc_id div 10").cast("long"), lit(4L)) === b)
      .as[(Long, String)].collect().toSeq)
    try slices.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(
      graft.SparkEntry.queries("d41_stream_span_reprice")(spark, sf))
    assert(got.sortBy(_._1).toSeq === batch.sortBy(_._1))
    // the semantic win over d33: a 16+-token doc unseen by the corpus
    // index, fed in batch 0 and pasted again in batch 1 — the copy is
    // fully redacted (every window now in the state), the original
    // untouched
    val novel = (0 until 20).map(i => s"q$i").mkString(" ")
    val got2 = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms2 = MemoryStream[(Long, String)]
    val q2 = Streams.spanRepriceStreaming(widx0,
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text", 16) { df =>
      val rows = toRows(df); this.synchronized { got2 ++= rows }
    }
    try {
      ms2.addData(Seq((100001L, novel))); q2.processAllAvailable()
      ms2.addData(Seq((100002L, novel))); q2.processAllAvailable()
    } finally q2.stop()
    val byId = got2.map(r => r._1 -> r).toMap
    assert(byId(100001L)._3 === 0L && byId(100001L)._4 === 1000000L,
      "first arrival of a novel doc must keep every token")
    assert(byId(100002L)._3 === 20L && byId(100002L)._5 === "",
      "the cross-batch copy must redact fully")
  }

  test("streaming print append: replay at the d41 slicing equals the " +
      "batch contract; a cross-batch re-paste hits on its own prints") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arrivals = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text")
    val idx0 = Dedup.buildPrintIndex(corpus, "doc_id", "text", 4, 4)
    type R = (Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_prints"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_new"))).toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.printAppendStreaming(idx0,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, 4) { df =>
      val rows = toRows(df); this.synchronized { got ++= rows }
    }
    val slices = (0L to 3L).map(b => arrivals
      .where(pmod(expr("doc_id div 10").cast("long"), lit(4L)) === b)
      .as[(Long, String)].collect().toSeq)
    try slices.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(
      graft.SparkEntry.queries("d54_stream_print_append")(spark, sf))
    assert(got.sortBy(_._1).toSeq === batch.sortBy(_._1))
    // the self-audit identity: n_new + n_hits = n_prints, every row
    got.foreach(r => assert(r._2 === r._3 + r._4, s"row $r"))
    // the semantic win over a frozen-index gate: a novel doc in batch
    // 0 has zero hits; its verbatim re-paste in batch 1 hits on EVERY
    // print (the prints folded into the state between batches)
    val novel = (0 until 12).map(i => s"zq$i").mkString(" ")
    val got2 = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms2 = MemoryStream[(Long, String)]
    val q2 = Streams.printAppendStreaming(idx0,
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text", 4, 4) { df =>
      val rows = toRows(df); this.synchronized { got2 ++= rows }
    }
    try {
      ms2.addData(Seq((200001L, novel))); q2.processAllAvailable()
      ms2.addData(Seq((200002L, novel))); q2.processAllAvailable()
    } finally q2.stop()
    val byId = got2.map(r => r._1 -> r).toMap
    assert(byId(200001L)._3 === 0L &&
      byId(200001L)._4 === byId(200001L)._2 && byId(200001L)._2 > 0L,
      "first arrival of a novel doc must be all-new prints")
    assert(byId(200002L)._3 === byId(200002L)._2 &&
      byId(200002L)._4 === 0L,
      "the cross-batch re-paste must hit on every print")
  }

  test("streaming postings ingest: replay at the d55 slicing equals " +
      "the batch contract; a cross-batch coined token hits") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod($"doc_id", lit(10)) < 8)
    val arrivals = docs.where(pmod($"doc_id", lit(10)) >= 8)
      .select($"doc_id", $"text")
    val toks0 = Retrieval.postings(corpus, "doc_id", "text")
      .select($"tok").distinct().localCheckpoint(true)
    type R = (Long, Long, Long, Long)
    def toRows(df: org.apache.spark.sql.DataFrame): Seq[R] =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_new"))).toSeq
    val got = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms = MemoryStream[(Long, String)]
    val q = Streams.postingsIngestStreaming(toks0,
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { got ++= rows }
    }
    val slices = (0L to 3L).map(b => arrivals
      .where(pmod(expr("doc_id div 10").cast("long"), lit(4L)) === b)
      .as[(Long, String)].collect().toSeq)
    try slices.foreach { p => ms.addData(p); q.processAllAvailable() }
    finally q.stop()
    val batch = toRows(
      graft.SparkEntry.queries("d55_stream_postings_ingest")(spark, sf))
    assert(got.sortBy(_._1).toSeq === batch.sortBy(_._1))
    // self-audit identity: n_hits + n_new = n_toks on every row
    got.foreach(r => assert(r._2 === r._3 + r._4, s"row $r"))
    // cross-batch semantics: a coined token is all-new in batch 0 and
    // a pure hit when re-used in batch 1 (the fold between batches)
    val got2 = scala.collection.mutable.ArrayBuffer.empty[R]
    val ms2 = MemoryStream[(Long, String)]
    val q2 = Streams.postingsIngestStreaming(toks0,
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text") { df =>
      val rows = toRows(df); this.synchronized { got2 ++= rows }
    }
    try {
      ms2.addData(Seq((300001L, "zzcoined1 zzcoined2")))
      q2.processAllAvailable()
      ms2.addData(Seq((300002L, "zzcoined1 zzcoined2")))
      q2.processAllAvailable()
    } finally q2.stop()
    val byId = got2.map(r => r._1 -> r).toMap
    assert(byId(300001L) === ((300001L, 2L, 0L, 2L)),
      s"coined tokens must be all-new on first arrival: ${byId(300001L)}")
    assert(byId(300002L) === ((300002L, 2L, 2L, 0L)),
      s"the cross-batch re-use must hit on every token: ${byId(300002L)}")
  }

  test("streaming delete feed: replayed batches equal the one-shot " +
      "union delete (dir state) and audits match the d39 batch contract") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Ann
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    def rm(d: String): Unit = {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(d)).deleteRecursively()
    }
    val e = Tables.embeddings(spark, sf)
    val base = e.where($"vec_id" >= 5 && pmod($"vec_id", lit(10)) < 8)
    val dirA = tmp("graft-delfeed-live")
    val dirB = tmp("graft-delfeed-oneshot")
    try {
      // two byte-independent but content-identical indexes (writeIndex
      // is deterministic): A takes the streamed feed, B the union delete
      Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, dirA)
      Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, dirB)
      val pre = Ann.readIndex(spark, dirA)
      // the d39 slicing: takedown set vec_id%10==5, batch = (id/10)%4;
      // ids arrive as DATA (collected), never as a view of the index
      val delRows = base.where(pmod($"vec_id", lit(10)) === 5)
        .select($"vec_id",
          pmod(floor($"vec_id" / 10).cast("long"), lit(4L)).as("b"))
        .as[(Long, Long)].collect()
      val batches = (0L to 3L).map(b =>
        delRows.filter(_._2 == b).map(_._1).toSeq)
      // expected audits from the PRE-delete lists (the batch contract)
      val listOf = pre.lists.select($"n_id", $"c_id")
        .as[(Long, Long)].collect().toMap
      val nb0 = listOf.size.toLong
      val expected = batches.zipWithIndex
        .scanLeft((-1L, 0L, 0L, nb0)) { case ((_, _, _, left), (ids, i)) =>
          val present = ids.filter(listOf.contains)
          (i.toLong, present.size.toLong,
            present.map(listOf).distinct.size.toLong,
            left - present.size)
        }.drop(1)
      val emissions = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, Long, Long, Long)]]
      val ms = MemoryStream[Long]
      val q = Streams.deleteFeedStreaming(dirA,
          ms.toDF().toDF("n_id"), "n_id") { df =>
        val rows = df.collect().map(r => (r.getAs[Long]("batch"),
          r.getAs[Long]("n_deleted"), r.getAs[Long]("lists_touched"),
          r.getAs[Long]("n_after"))).toSeq
        this.synchronized { emissions += rows }
      }
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      // emission parity: the final audit is one row per batch, each
      // matching the pre-delete arithmetic (audits were barriered
      // BEFORE each in-place compaction replaced the files they read)
      assert(emissions.size === 4 && emissions.last === expected)
      // dir-state parity: sequential feed == one-shot union delete
      Ann.deleteFromIndexDir(spark, dirB,
        delRows.map(_._1).toSeq.toDF("n_id"))
      def memb(d: String) = Ann.readIndex(spark, d).lists
        .select($"c_id", $"n_id").as[(Long, Long)].collect().toSet
      val a = memb(dirA)
      assert(a === memb(dirB) && a.size.toLong === expected.last._4)
    } finally { rm(dirA); rm(dirB) }
  }
}
