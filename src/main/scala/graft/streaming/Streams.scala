package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream processing: the same transformations serve the batch
  * correctness gate (Verify oracle parity) and the Structured
  * Streaming path (specs drive them through MemoryStream →
  * writeStream). Watermarks bound state; sessionization state is
  * O(active users), not O(events).
  */
object Streams {

  case class Ev(event_id: Long, user_id: Long, event_type: String,
                us: Long, value: Double)
  case class Session(user_id: Long, session_idx: Long, n_events: Long,
                     start_us: Long, end_us: Long, dur_us: Long)
  /** Public: Spark codegens the state (de)serializer for this type. */
  case class SessState(start_us: Long, last_us: Long, n: Long, idx: Long)

  /** Tumbling-window counts per event type. Works on batch and
    * streaming frames alike; on streaming input the 2h watermark
    * bounds window state. */
  def windowCounts(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    withWm
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Windowed metrics over a SEMI-STRUCTURED payload — the telemetry
    * staple (a21's schema-on-read extraction composed with
    * event-time windows): `$.k` is pulled from each event's JSON
    * props by codegen'd path extraction riding the scan (a pure
    * projection — the payload never reaches the shuffle), then the
    * d1 tumbling-window shape aggregates all-integer metrics per
    * (hour, type). Identical on batch and streaming frames; the
    * streaming side watermarks ts like [[windowCounts]]. */
  def jsonMetricsWindowed(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    withWm
      .select(col("ts"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("k")).cast("long").as("k_sum"),
        max(col("k")).cast("long").as("k_max"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("event_type"), col("n_events"), col("k_sum"), col("k_max"))
  }

  /** Gap-based sessionization via Spark's NATIVE session_window —
    * the engine merges per-user event windows [ts, ts+gap) into
    * sessions (end = last event + gap). Works identically on batch
    * and streaming frames; on streaming input the watermark closes
    * and evicts sessions. This is the declarative counterpart of
    * [[sessionize]]/[[sessionizeStreaming]]: same shuffle (user_id),
    * state managed by the engine's session-window store. */
  def sessionWindows(events: DataFrame, gap: String): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    withWm
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_gap_us"),
        col("n_events"), col("sum_value"))
  }

  /** Per-hour-window per-user aggregate — the shared first stage of
    * [[windowTopK]] (batch) and [[windowTopKStreaming]]. On a stream
    * the 2h watermark closes windows for append-mode emission. Keeps
    * the sum as decimal(25,6): exact, order-independent, and the
    * ranking key (a double sum's value could depend on fold order). */
  def windowUserAgg(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    withWm
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).as("sum_dec"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("user_id"), col("n_events"), col("sum_dec"))
  }

  /** Top-k rows per hour bucket by exact decimal sum, via the bounded
    * -heap TopKPerKey operator (O(buckets*k) state, map-side partial
    * heaps before the shuffle). */
  def topKPerWindow(agg: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey(agg, Seq(col("hour_bucket")),
        Seq(col("sum_dec").desc, col("user_id")), k)
      .select(col("hour_bucket"), col("rank"), col("user_id"),
        col("n_events"), col("sum_dec").cast("double").as("sum_value"))

  /** Windowed top-k, batch flavor: per hour window, the k users with
    * the largest value sums. */
  def windowTopK(events: DataFrame, k: Int): DataFrame =
    topKPerWindow(windowUserAgg(events), k)

  /** Streaming flavor: the watermarked window aggregate emits each
    * (window, user) row exactly once — when the watermark passes the
    * window end, so every row of a window lands in the SAME
    * micro-batch — and foreachBatch ranks those closed windows with
    * the identical TopKPerKey stage the batch path uses. State is the
    * engine's windowed-agg store (bounded by the watermark); the
    * per-batch top-k adds O(closed windows * k). */
  def windowTopKStreaming(events: DataFrame, k: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowUserAgg(events)
      .writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(topKPerWindow(batch, k))
      }
      .start()

  private def toEv(events: DataFrame): Dataset[Ev] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("value")).as[Ev]
  }

  /** Gap-based sessionization, batch flavor: lag → gap flag → running
    * sum → group. One shuffle on user_id; the per-user window is
    * sort-based (WindowExec spills), so a hot user streams through
    * disk instead of materializing an in-memory array, and the
    * follow-up groupBy reuses the user_id partitioning (its key is a
    * superset), so no second shuffle. */
  def sessionize(events: DataFrame, gapUs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    toEv(events).toDF()
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"), col("dur_us"))
      .as[Session]
  }

  /** Session TRANSCRIPTS — corpus assembly from event logs: each
    * gap-delimited session renders as one ordered text line
    * (`type@offset_s` tokens, offsets in whole seconds from session
    * start), the behavioral-corpus shape that turns telemetry into
    * trainable documents (and feeds the c8-c11/c37 text pipeline
    * downstream). Same single-shuffle core as [[sessionize]]: the
    * per-user window and the (user, session) groupBy share the
    * user_id hash partitioning, and the in-group event order is the
    * deterministic id-ordered fold (`sort_array(collect_list(...))`
    * — the §4 idiom), so the rendered line is identical under any
    * physical partitioning. Per-session state is bounded by the
    * session length; no corpus-wide ordering exists anywhere. */
  def sessionTranscripts(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    toEv(events).toDF()
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        sort_array(collect_list(struct(col("us"), col("event_id"),
          col("event_type")))).as("evs"))
      .withColumn("transcript", array_join(
        transform(col("evs"), x => concat(x("event_type"), lit("@"),
          ((x("us") - col("start_us")) / lit(1000000L)).cast("long")
            .cast("string"))), " "))
      .select(col("user_id"), col("start_us"), col("n_events"),
        ((col("end_us") - col("start_us")) / lit(1000000L)).cast("long")
          .as("duration_s"),
        col("transcript"))
  }

  /** The CLOSED-session restriction of [[sessionTranscripts]] — the
    * batch contract of the streaming emitter: a gap-close emitter on
    * an ordered feed can only emit a user's session once a LATER
    * event of the same user proves the gap passed, so each user's
    * final session stays open (in state) at any cutoff. Relationally:
    * drop each user's last session. */
  def sessionTranscriptsClosed(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    sessionTranscripts(events, gapUs)
      .withColumn("__last", max(col("start_us")).over(w))
      .where(col("start_us") < col("__last"))
      .drop("__last")
  }

  /** Public: Spark codegens the state (de)serializer for this type. */
  case class TransEv(us: Long, event_id: Long, event_type: String)
  case class TransState(evs: Seq[TransEv])
  case class Transcript(user_id: Long, start_us: Long, n_events: Long,
                        duration_s: Long, transcript: String)

  /** [[sessionTranscripts]] AT INGEST — corpus assembly as the log
    * arrives: flatMapGroupsWithState keyed by user holds the OPEN
    * session's events (state bounded by session length, exactly the
    * rows the batch fold would buffer), and the gap closing renders
    * and emits the finished line — the same `type@offset_s` integer
    * rendering as the batch op, so emissions match
    * [[sessionTranscriptsClosed]] row for row (StreamsSpec parity
    * pin). Same ordered-feed convention as [[sessionizeStreaming]];
    * a disordered feed takes the watermark-bounded reorder buffer
    * class (sessionizeStreamingOoo) in front. */
  def sessionTranscriptsStreaming(events: DataFrame,
                                  gapUs: Long): Dataset[Transcript] = {
    val spark = events.sparkSession
    import spark.implicits._
    def render(evs: Seq[TransEv]): Transcript = {
      val sorted = evs.sortBy(e => (e.us, e.event_id))
      val start = sorted.head.us
      Transcript(0L, start, sorted.length.toLong,
        (sorted.last.us - start) / 1000000L,
        sorted.map(e => s"${e.event_type}@${(e.us - start) / 1000000L}")
          .mkString(" "))
    }
    toEv(events.withWatermark("ts", "2 hours"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Transcript](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[TransState]) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transcript]
          var open = state.getOption.map(_.evs.toVector)
            .getOrElse(Vector.empty)
          evs.foreach { e =>
            if (open.nonEmpty && e.us - open.last.us > gapUs) {
              out += render(open).copy(user_id = uid)
              open = Vector.empty
            }
            open = open :+ TransEv(e.us, e.event_id, e.event_type)
          }
          state.update(TransState(open))
          out.iterator
      }
  }

  /** Streaming flavor: flatMapGroupsWithState keyed by user, emitting
    * a session when the gap passes (or on state timeout). Each
    * micro-batch's per-key group is folded in (event-time, id) order,
    * so WITHIN a batch arrival order is irrelevant (StreamsSpec pins
    * invariance under permuted arrivals); ACROSS batches a key's
    * events must still be time-ordered — an emitted session cannot be
    * retracted in append mode, so a cross-batch straggler needs a
    * watermark-bounded reorder buffer — which is exactly
    * [[sessionizeStreamingOoo]]; this flavor stays the cheap path for
    * feeds that ARE ordered (documented convention, same as
    * d20/d26/d27). */
  def sessionizeStreaming(events: DataFrame, gapUs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    toEv(events.withWatermark("ts", "2 hours"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.getOrElse(SessState(-1L, -1L, 0L, 0L))
          evs.foreach { e =>
            if (st.n == 0L || e.us - st.last_us > gapUs) {
              if (st.n > 0L)
                out += Session(uid, st.idx, st.n, st.start_us, st.last_us,
                  st.last_us - st.start_us)
              st = SessState(e.us, e.us, 1L, st.idx + 1)
            } else st = st.copy(last_us = e.us, n = st.n + 1)
          }
          state.update(st)
          out.iterator
      }
  }

  /** [[Ev]] still carrying the WATERMARKED ts column — the
    * event-time-timeout checker requires the watermark column to
    * survive into the grouped dataset. */
  case class EvT(event_id: Long, user_id: Long, event_type: String,
                 us: Long, value: Double, ts: java.sql.Timestamp)

  case class OooSess(buf: Seq[EvT], st: SessState)

  /** [[sessionizeStreaming]] hardened for CROSS-BATCH event-time
    * disorder — the watermark-bounded reorder buffer the ordered-feed
    * convention otherwise requires upstream. Per key the state holds
    * (buffer of not-yet-safe events, session machine): each
    * invocation buffers arrivals, folds ONLY events strictly below
    * the current watermark (no future in-contract arrival can precede
    * them — anything later must carry ts ≥ watermark or be dropped at
    * the door as contract-breaking), in (ts, id) order through the
    * same machine as [[sessionizeStreaming]], and re-arms an
    * event-time timeout at watermark+1 ms while the buffer is
    * nonempty so the next watermark advance folds the newly-safe
    * prefix even when the key receives no data. State bound:
    * O(per-key events inside the watermark horizon) — exactly the
    * disorder window being tolerated, the minimum any correct
    * reorderer holds. Emission contract matches the ordered flavor
    * (closed sessions; each key's open tail stays in state), so
    * StreamsSpec pins it against the SAME batch oracle under
    * cross-batch permuted feeds. */
  def sessionizeStreamingOoo(events: DataFrame, gapUs: Long,
      delay: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"), col("ts"))
      .as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OooSess, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvT], state: GroupState[OooSess]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val os = state.getOption.getOrElse(
            OooSess(Nil, SessState(-1L, -1L, 0L, 0L)))
          // below-watermark arrivals broke the lateness contract and
          // cannot be interleaved behind already-folded events
          val buf = os.buf ++ it.filter(_.us >= wmUs)
          val (safe, hold) = buf.partition(_.us < wmUs)
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = os.st
          safe.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (st.n == 0L || e.us - st.last_us > gapUs) {
              if (st.n > 0L)
                out += Session(uid, st.idx, st.n, st.start_us, st.last_us,
                  st.last_us - st.start_us)
              st = SessState(e.us, e.us, 1L, st.idx + 1)
            } else st = st.copy(last_us = e.us, n = st.n + 1)
          }
          state.update(OooSess(hold, st))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          out.iterator
      }
  }

  /** First event per (user, type): the deterministic batch analogue of
    * streaming dropDuplicates-within-watermark. */
  def firstPerKey(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("us").as("first_us"))
  }

  /** Event correlation: for every `typeA` event, the `typeB` events of
    * the same user within `horizonUs` after it — a stream-stream
    * time-range join. On streaming inputs both sides get watermarks so
    * the join state is bounded by the horizon; on batch inputs it is
    * the plain range join the oracle replays. */
  def correlate(events: DataFrame, typeA: String, typeB: String,
                horizonUs: Long, joinType: String = "inner"): DataFrame = {
    def side(t: String, pfx: String) = {
      val base = events.where(col("event_type") === t)
      val wm = if (base.isStreaming) base.withWatermark("ts", "2 hours") else base
      wm.select(col("user_id").as(s"${pfx}_user"),
        col("event_id").as(s"${pfx}_id"), col("ts").as(s"${pfx}_ts"))
    }
    val a = side(typeA, "a")
    val b = side(typeB, "b")
    // Both bounds as plain timestamp arithmetic: StreamingJoinHelper
    // can only derive state-eviction watermarks from interval algebra,
    // not from unix_micros() — the function form silently made the
    // join state unbounded.
    // left_outer: unmatched A rows emit with -1 sentinels (never null
    // — the driver compare needs total row ordering). On a stream the
    // unmatched row is emitted when the watermark passes the end of
    // A's join window (a_ts + horizon), i.e. when a match is provably
    // impossible.
    a.join(b,
        col("a_user") === col("b_user") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonUs MICROSECOND"),
        joinType)
      .select(col("a_user").as("user_id"), col("a_id"),
        coalesce(col("b_id"), lit(-1L)).as("b_id"),
        unix_micros(col("a_ts")).as("a_us"),
        coalesce(unix_micros(col("b_ts")), lit(-1L)).as("b_us"))
  }

  case class BandRow(did: Long, band_idx: Int, band_val: Seq[Long])

  /** Streaming near-dup state machine: one OWNER per MinHash band
    * bucket. Each arriving (doc, band) row either claims its bucket
    * (novel band) or finds it owned by an earlier doc (collision ≈
    * near-dup evidence). A doc is novel iff every band row was fresh
    * — the batch mirror is [[graft.operators.Dedup.nearDupNovelty]]
    * (owner = min doc id per bucket). State is O(distinct buckets);
    * an arriving doc costs `bands` probes and no join — the online
    * ingest-filter shape. */
  def bandClaimStreaming(banded: Dataset[BandRow]): Dataset[(Long, Int, Boolean)] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupByKey(r => (r.band_idx, r.band_val))
      .flatMapGroupsWithState[Long, (Long, Int, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Seq[Long]), it: Iterator[BandRow], state: GroupState[Long]) =>
          val rows = it.toArray.sortBy(_.did)
          var owner = state.getOption
          rows.iterator.map { r =>
            val novel = owner.isEmpty
            if (novel) { owner = Some(r.did); state.update(r.did) }
            (r.did, key._1, novel)
          }
      }
  }

  /** Per-(hour window, event type) HLL registers — the shared first
    * stage of [[windowHll]] (batch) and [[windowHllStreaming]]. The
    * register fold is a MAX, so the engine's windowed aggregation
    * sketches incrementally with O(windows * types * 64) state and
    * the watermark closes each window's registers for append-mode
    * emission. */
  def windowHllAgg(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    val (b, r) = graft.operators.Sketches.hllRowCols(col("user_id"))
    withWm
      .select(col("ts"), col("event_type"), b.as("b"), r.as("r"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("b"))
      .agg(max(col("r")).as("m"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("event_type"), col("b"), col("m"))
  }

  /** Windowed approx-distinct users, batch flavor: per (hour, type),
    * the deterministic HLL estimate next to the exact count. */
  def windowHll(events: DataFrame): DataFrame = {
    val est = graft.operators.Sketches.hllEstimateFromRegs(
      windowHllAgg(events), Seq("hour_bucket", "event_type"))
    val exact = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("event_type"), col("n_exact"))
    // no rel_err column here (unlike hllDistinct): tiny per-window
    // exact counts (3-5 users) make round(est/n, 4) land on exact
    // decimal-tie boundaries where the engines' double-rounding modes
    // diverge — the reader divides the two columns instead
    exact.join(est, Seq("hour_bucket", "event_type"))
      .select(col("hour_bucket"), col("event_type"), col("n_exact"),
        col("hll_estimate"))
  }

  /** Streaming flavor: the watermark closes a window's registers all
    * in one micro-batch (same emission argument as
    * [[windowTopKStreaming]]); foreachBatch folds them into the
    * estimate with the identical stage the batch path uses. The
    * exact count is deliberately absent — not keeping per-user state
    * is the sketch's point. */
  def windowHllStreaming(events: DataFrame)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowHllAgg(events)
      .writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Sketches.hllEstimateFromRegs(batch,
          Seq("hour_bucket", "event_type")))
      }
      .start()

  /** Shared register stage of [[windowCm]] (batch) and
    * [[windowCmStreaming]]: per (hour window, Count-Min row, bucket)
    * the event-count counter — a plain watermarked SUM, so the
    * streaming agg folds arriving events into O(windows × D × W)
    * counters and never keeps per-user state (the sketch's point:
    * frequency monitoring over an unbounded key space in fixed
    * memory). */
  def windowCmAgg(events: DataFrame): DataFrame = {
    import graft.operators.Sketches
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    val h = graft.functions.TextOps.polyHash(col("user_id").cast("string"))
    withWm
      .select(col("ts"), Sketches.cmPairs(h).as("ib"))
      .groupBy(window(col("ts"), "1 hour"),
        col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("i"), col("b"), col("c"))
  }

  /** Point-probe a fixed user set against per-window CM registers:
    * the (window × user × row) grid LEFT-joins the counters so an
    * absent counter reads as 0 (min over rows then gives the true CM
    * estimate, including 0 for users with no events). The probe set
    * is tiny and broadcast; registers are never reshuffled. */
  def cmProbe(regs: DataFrame, users: Seq[Long]): DataFrame = {
    import graft.operators.Sketches
    val spark = regs.sparkSession
    import spark.implicits._
    val probes = users.toDF("user_id")
      .select(col("user_id"),
        Sketches.cmPairs(graft.functions.TextOps.polyHash(
          col("user_id").cast("string"))).as("ib"))
      .select(col("user_id"), col("ib.i").as("i"), col("ib.b").as("b"))
    val grid = regs.select(col("hour_bucket")).distinct()
      .crossJoin(broadcast(probes))
    grid.join(regs, Seq("hour_bucket", "i", "b"), "left")
      .groupBy(col("hour_bucket"), col("user_id"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
  }

  /** Windowed approximate per-user event counts, batch flavor: the
    * Count-Min estimate for a fixed probe set next to the exact
    * count (estimate >= exact always — collisions only add). */
  def windowCm(events: DataFrame, users: Seq[Long]): DataFrame = {
    val est = cmProbe(windowCmAgg(events), users)
    val exact = events
      .where(col("user_id").isin(users: _*))
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour_bucket"),
        col("user_id"), col("n_exact"))
    est.join(exact, Seq("hour_bucket", "user_id"), "left")
      .select(col("hour_bucket"), col("user_id"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"), col("cm_est"))
  }

  /** Streaming flavor: watermark-closed windows' counters arrive in
    * one micro-batch (same emission argument as
    * [[windowHllStreaming]]); foreachBatch probes them with the
    * identical stage the batch path uses. Exact counts deliberately
    * absent — fixed-memory frequency monitoring is the point. */
  def windowCmStreaming(events: DataFrame, users: Seq[Long])
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    windowCmAgg(events)
      .writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink(cmProbe(batch, users))
      }
      .start()

  /** Contamination evidence as a TRUE stream-static join: arriving
    * docs explode to distinct shingle hashes and inner-join the
    * (static, broadcastable — eval sets are small) eval shingle
    * table; each output row is one shared shingle between an
    * arriving doc and an eval doc, emitted append-mode with no
    * state, no watermark, and no foreachBatch — the pattern where
    * the static side is planned per micro-batch against unbounded
    * input. Downstream consumers aggregate hits per (doc, eval)
    * pair; StreamsSpec pins the grouped hits to the batch
    * contamination operator's n_shared. `evalShingles` must carry
    * (eval_id, h). */
  def contaminationHitsStreaming(evalShingles: DataFrame,
                                 docs: DataFrame, id: String,
                                 text: String): DataFrame =
    docs.select(col(id).as("train_id"),
        explode(array_distinct(
          graft.functions.TextOps.shingleHashes(col(text)))).as("h"))
      .join(broadcast(evalShingles), "h")
      .select(col("train_id"), col("eval_id"), col("h"))

  /** Streaming cluster routing: each arriving embedding is assigned
    * its nearest trained centroid MAP-SIDE ([[graft.operators.Ann
    * .argmaxAssign]] — fold-argmax over the one-row broadcast
    * centroid array). A pure stream-static projection: no state, no
    * watermark, no shuffle of the stream side, so micro-batch
    * boundaries can never change an assignment and the accumulated
    * stream output equals the batch operator over the same vectors
    * (StreamsSpec pins it cross-batch). The routing stage in front
    * of per-cluster downstream sinks (curation-by-domain, per-topic
    * quality gates). `cent` must carry (cid, cv, cn) and is planned
    * per micro-batch — train once with Ann.kmeansFit and barrier (or
    * persist via DiskCache) so training never re-runs. */
  def clusterAssignStreaming(vecs: DataFrame, vec: String,
                             cent: DataFrame): DataFrame =
    graft.operators.Ann.argmaxAssign(vecs, vec, cent)

  /** Streaming document chunking: each arriving document is cut into
    * its overlapping token windows ([[graft.operators.Packing
    * .chunkDocs]]) as it lands — the ingest stage that feeds a
    * retrieval index or a long-document training sink chunk-by-chunk
    * instead of buffering whole corpora. A pure stateless per-row
    * Generate: no state, no watermark, no shuffle, chunks depend
    * only on their own document, so micro-batch boundaries can never
    * change the output and the accumulated stream equals the batch
    * operator over the same docs (StreamsSpec pins it cross-batch). */
  def chunkStreaming(docs: DataFrame, id: String, text: String,
                     win: Long, stride: Long): DataFrame =
    graft.operators.Packing.chunkDocs(docs, id, text, win, stride)

  /** Streaming retrieval against the static chunk index — the "RAG
    * query" path: each arriving document is embedded whole and
    * answered with its top-`k` corpus documents by best-chunk cosine
    * ([[graft.operators.Retrieval.chunkTopK]] — the arriving batch
    * broadcasts as the query side, the chunk index streams
    * map-side). Answers are per-doc independent given the index, so
    * micro-batch boundaries never change them and the accumulated
    * stream equals the batch operator over the same docs (StreamsSpec
    * pins it cross-batch). Build `chunks` once with
    * [[graft.operators.Retrieval.chunkEmbed]] and barrier (or
    * persist) so the index never recomputes per batch. */
  def chunkRetrievalStreaming(chunks: DataFrame, docs: DataFrame,
      id: String, text: String, dim: Int, k: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val queries = batch
          .select(col(id).as("q_id"),
            graft.functions.TextOps.polyHash(col(text)).as("h"))
          .select(col("q_id"),
            transform(graft.functions.VectorOps.mockEmbedding(col("h"), dim),
              x => x.cast("float")).as("q_emb"))
        sink(graft.operators.Retrieval.chunkTopK(chunks, queries, id, k))
      }
      .start()

  /** Streaming retrieval through the PERSISTED chunk IVF index — the
    * scale path for the d15 RAG query ([[chunkRetrievalStreaming]]'s
    * exact full-index scan is the parity baseline): each arriving
    * document is embedded whole and answered by
    * [[graft.operators.Retrieval.indexedChunkTopK]], which probes
    * only the `nprobe` nearest centroid partitions of the lists scan
    * (dynamic partition pruning) instead of scoring every corpus
    * chunk per micro-batch. Answers are per-doc independent given
    * the index, so micro-batch boundaries never change them and the
    * accumulated stream equals the batch probe over the same docs
    * (StreamsSpec pins it cross-batch). Build the index once with
    * [[graft.operators.Ann.writeIndex]] over
    * [[graft.operators.Retrieval.chunkIndexCorpus]] (DiskCache it
    * per corpus fingerprint, like c29). */
  def indexedRetrievalStreaming(idx: graft.operators.Ann.IvfIndex,
      docs: DataFrame, id: String, text: String, dim: Int,
      nprobe: Int, k: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val queries = batch
          .select(col(id).as("q_id"),
            graft.functions.TextOps.polyHash(col(text)).as("h"))
          .select(col("q_id"),
            transform(graft.functions.VectorOps.mockEmbedding(col("h"), dim),
              x => x.cast("float")).as("q_emb"))
        sink(graft.operators.Retrieval.indexedChunkTopK(
          idx, queries, id, nprobe, k))
      }
      .start()

  /** Stateful streaming source drift — c43 as a RUNNING streaming
    * aggregate: the per-(source, bucket) token counters fold arriving
    * docs with no window or watermark (state = O(sources × buckets)
    * counters BY CONSTRUCTION — the hashed bucket space is fixed, so
    * unbounded vocabulary and unbounded docs never grow the state),
    * and every micro-batch derives the full drift table (corpus
    * marginal, totals, dense grid, integer-ppm l1) from the CURRENT
    * counter state with the identical batch stages. The counter agg
    * publishes in COMPLETE mode: update mode would emit only the
    * counters a batch changed, but the drift score is a function of
    * the whole counter table — state size is the same either way,
    * and the emitted table IS the running ingest-QA monitor. After
    * the stream drains, the last emission equals the batch operator
    * over the same docs (StreamsSpec pins it cross-batch). */
  def sourceDriftStreaming(docs: DataFrame, group: String, text: String,
      buckets: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.CorpusStats
      .sourceDriftCounters(docs, group, text, buckets)
      .writeStream.outputMode(OutputMode.Complete)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats
          .sourceDriftFromCounters(batch, group))
      }
      .start()

  /** Streaming occurrence-level vocabulary-coverage monitor: arriving
    * docs explode map-side and join the STATIC [[graft.operators
    * .CorpusStats.tokenVocab]] artifact (trained once, barriered —
    * the d13/d18/d19 static-artifact seam), folding into per-group
    * (n_occ, oov_occ, oov_occ_min2) counters — O(groups) state BY
    * CONSTRUCTION (type-level coverage would need a seen-token set
    * per group, i.e. unbounded state: that audit stays batch-side in
    * c53). COMPLETE mode because the emitted table IS the running
    * coverage monitor (the d16/d17 counter reasoning); each emission
    * derives the ppm ratios from the whole counter state. After the
    * stream drains, the last emission equals the batch
    * CorpusStats.occCoverage over the same docs (StreamsSpec pins it
    * cross-batch). */
  def occCoverageStreaming(vocab: DataFrame, docs: DataFrame,
      group: String, text: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.CorpusStats
      .occCoverageCounters(vocab, docs, group, text)
      .writeStream.outputMode(OutputMode.Complete)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats
          .occCoverageFromCounters(batch, group))
      }
      .start()

  /** Streaming shard router with a running balance monitor: each
    * arriving doc routes to its content-hash shard map-side
    * (graft.operators.Packing.shardAssign — stateless, so micro-batch
    * boundaries can never change an assignment; the sink appends the
    * doc to its shard file) while a running per-shard (n_docs,
    * n_tokens) aggregate watches balance. State is O(shards) BY
    * CONSTRUCTION — `shards` keys, two long counters each; COMPLETE
    * mode because the emitted table IS the whole running manifest
    * (same reasoning as [[sourceDriftStreaming]]'s counters). After
    * the stream drains the last emission equals the batch
    * Packing.shardCounts over the same docs (StreamsSpec pins it
    * cross-batch). */
  def shardCountsStreaming(docs: DataFrame, id: String, text: String,
      shards: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.Packing.shardCounts(docs, id, text, shards)
      .writeStream.outputMode(OutputMode.Complete)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()

  /** Keyed state of [[shardPackStreaming]]: running totals of one
    * shard's append-order packing. */
  case class PackSt(n_docs: Long, n_tokens: Long, n_straddle: Long)

  /** Per-user funnel state: highest stage reached (0 = no view yet)
    * and that stage's entry timestamp (-1 before any view). */
  case class FunnelSt(stage: Long, entryUs: Long)

  /** Streaming conversion-funnel tracker: keyed state per user holds
    * exactly (stage, entry time) — O(users) state, two longs each —
    * advanced by the strict staged rule (a click counts only
    * STRICTLY after the view entry, a purchase only after the click
    * entry; a19's batch semantics). Events are folded in (ts,
    * event_id) order within each batch — any within-batch arrival
    * order yields the same state (StreamsSpec pins invariance under
    * permuted arrivals); with an ordered feed across batches (the
    * d2/d3 convention) the final per-user emission equals the batch
    * staged-min-join query, StreamsSpec-pinned. A cross-batch
    * straggler can lower a stage's entry time only via an upstream
    * reorder buffer — the staged-min semantics are not incrementally
    * recomputable without retaining the event set. Update mode: each
    * batch re-emits the users it touched. */
  def funnelStreaming(events: DataFrame)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelSt, (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String, Long, Long)],
         state: GroupState[FunnelSt]) =>
          val rows = it.toArray.sortBy(r => (r._3, r._4))
          var st = state.getOption.getOrElse(FunnelSt(0L, -1L))
          rows.foreach { case (_, t, us, _) =>
            if (st.stage == 0L && t == "view")
              st = FunnelSt(1L, us)
            else if (st.stage == 1L && t == "click" && us > st.entryUs)
              st = FunnelSt(2L, us)
            else if (st.stage == 2L && t == "purchase" && us > st.entryUs)
              st = FunnelSt(3L, us)
          }
          state.update(st)
          Iterator((uid, st.stage, st.entryUs))
      }
      .toDF("user_id", "stage", "entry_us")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  case class FEvT(user_id: Long, event_type: String, us: Long,
                  event_id: Long, ts: java.sql.Timestamp)
  case class OooFunnel(buf: Seq[FEvT], st: FunnelSt)

  /** [[funnelStreaming]] hardened for CROSS-BATCH event-time disorder
    * — the same watermark-bounded reorder buffer as
    * [[sessionizeStreamingOoo]], applied to the funnel machine: fold
    * only events strictly below the watermark (so the staged-min rule
    * sees them in true event-time order no matter how batches sliced
    * them), hold the rest, drop below-watermark arrivals at the door,
    * re-arm an event-time timeout at wm+1 ms while holding. Emits the
    * key's (stage, entry) after every fold (Update-mode contract —
    * last emission per user wins), so the accumulated sink equals the
    * batch staged-min-join query once the feed drains past the
    * watermark. */
  def funnelStreamingOoo(events: DataFrame, delay: String = "2 hours")
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("ts"))
      .as[FEvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OooFunnel, (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FEvT], state: GroupState[OooFunnel]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val os = state.getOption.getOrElse(
            OooFunnel(Nil, FunnelSt(0L, -1L)))
          val buf = os.buf ++ it.filter(_.us >= wmUs)
          val (safe, hold) = buf.partition(_.us < wmUs)
          var st = os.st
          safe.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (st.stage == 0L && e.event_type == "view")
              st = FunnelSt(1L, e.us)
            else if (st.stage == 1L && e.event_type == "click" &&
                e.us > st.entryUs)
              st = FunnelSt(2L, e.us)
            else if (st.stage == 2L && e.event_type == "purchase" &&
                e.us > st.entryUs)
              st = FunnelSt(3L, e.us)
          }
          state.update(OooFunnel(hold, st))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          Iterator((uid, st.stage, st.entryUs))
      }
      .toDF("user_id", "stage", "entry_us")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  /** Streaming per-shard sequence packing — the stateful streaming
    * completion of the batch shard-pack manifest: arriving docs route
    * to their content-hash shard and APPEND to that shard's running
    * concatenation in arrival order (within a micro-batch: by id, so
    * any within-batch arrival order packs identically — StreamsSpec
    * pins invariance under permuted arrivals; across batches the
    * d2/d3 ordered-feed convention), so each shard key carries
    * exactly (doc count, token offset, straddler count) —
    * O(shards) state BY CONSTRUCTION, the offsets a streaming
    * training-data writer needs to chop `budget`-token sequences as
    * files grow. Each batch emits every updated shard's running
    * manifest row (same columns as the batch operator). After the
    * stream drains over an id-ordered feed, the final per-shard rows
    * equal Packing.shardPackArrival (StreamsSpec pins it
    * cross-batch). */
  def shardPackStreaming(docs: DataFrame, id: String, text: String,
      shards: Int, budget: Long)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    val assigned = graft.operators.Packing
      .shardAssign(docs, id, text, shards)
      .select(col("shard"), col(id).as("doc_id"),
        size(graft.functions.TextOps.tokens(col(text)))
          .cast("long").as("n_tok"))
      .as[(Long, Long, Long)]
    assigned
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackSt,
          (Long, Long, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[PackSt]) =>
          val rows = it.toArray.sortBy(_._2)
          var st = state.getOption.getOrElse(PackSt(0L, 0L, 0L))
          rows.foreach { case (_, _, n) =>
            val off = st.n_tokens
            val straddles =
              if (off / budget != (off + n - 1) / budget) 1L else 0L
            st = PackSt(st.n_docs + 1, off + n, st.n_straddle + straddles)
          }
          state.update(st)
          val tail =
            if (st.n_tokens % budget == 0) 1000000L
            else st.n_tokens % budget * 1000000L / budget
          Iterator((shard, st.n_docs, st.n_tokens,
            (st.n_tokens + budget - 1) / budget, st.n_straddle, tail))
      }
      .toDF("shard", "n_docs", "n_tokens", "n_seqs", "n_straddle",
        "tail_fill_ppm")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  case class PkEvT(shard: Long, doc_id: Long, n_tok: Long, us: Long,
                   ts: java.sql.Timestamp)
  case class OooPack(buf: Seq[PkEvT], st: PackSt)

  /** [[shardPackStreaming]] hardened for CROSS-BATCH event-time
    * disorder — the sessionize/funnel watermark-bounded reorder
    * buffer applied to the packer: docs carry an ingest timestamp
    * (`ts`), each shard folds only docs strictly below the watermark
    * into its running concatenation — in (ts, id) order, so the
    * offsets are the true ingest-order offsets no matter how batches
    * sliced the feed — holds the rest, drops below-watermark
    * arrivals at the door, re-arms an event-time timeout at wm+1 ms
    * while holding. State per shard = three PackSt longs + the
    * held slice, bounded by the watermark horizon's doc rate (the
    * price of disorder tolerance; the ordered-feed flavor stays the
    * O(shards)-only path). Update mode re-emits each touched shard's
    * running manifest; after the feed drains past the watermark the
    * last row per shard equals Packing.shardPackArrival over the
    * same docs with ts monotone in id (StreamsSpec pins it on a
    * deliberately disordered feed). */
  def shardPackStreamingOoo(docs: DataFrame, id: String, text: String,
      shards: Int, budget: Long, ts: String = "ts",
      delay: String = "2 hours")
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    val assigned = docs.withWatermark(ts, delay)
      .select(graft.operators.Packing.shardOf(col(text), shards).as("shard"),
        col(id).as("doc_id"),
        size(graft.functions.TextOps.tokens(col(text)))
          .cast("long").as("n_tok"),
        unix_micros(col(ts)).as("us"), col(ts).as("ts"))
      .as[PkEvT]
    assigned.groupByKey(_.shard)
      .flatMapGroupsWithState[OooPack,
          (Long, Long, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (shard: Long, it: Iterator[PkEvT], state: GroupState[OooPack]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val os = state.getOption.getOrElse(
            OooPack(Nil, PackSt(0L, 0L, 0L)))
          val buf = os.buf ++ it.filter(_.us >= wmUs)
          val (safe, hold) = buf.partition(_.us < wmUs)
          var st = os.st
          safe.sortBy(e => (e.us, e.doc_id)).foreach { e =>
            val off = st.n_tokens
            val straddles =
              if (off / budget != (off + e.n_tok - 1) / budget) 1L else 0L
            st = PackSt(st.n_docs + 1, off + e.n_tok,
              st.n_straddle + straddles)
          }
          state.update(OooPack(hold, st))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          // A touched shard that has folded nothing yet (all docs still
          // held in the reorder buffer — first appearance, or the
          // watermark-sentinel shard) must not emit: n_tokens=0 would
          // hit the %budget==0 branch and claim a fully-filled tail
          // (tail_fill_ppm=1000000) for an empty shard.
          if (st.n_docs == 0L) Iterator.empty
          else {
            val tail =
              if (st.n_tokens % budget == 0) 1000000L
              else st.n_tokens % budget * 1000000L / budget
            Iterator((shard, st.n_docs, st.n_tokens,
              (st.n_tokens + budget - 1) / budget, st.n_straddle, tail))
          }
      }
      .toDF("shard", "n_docs", "n_tokens", "n_seqs", "n_straddle",
        "tail_fill_ppm")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  /** Streaming tokenizer encode: each arriving micro-batch of docs is
    * encoded map-side with the STATIC trained merge table
    * (graft.operators.CorpusStats.bpeApply — k broadcast one-row
    * joins + framed-string replaces, no pair counting). Encodings are
    * per-doc independent given the merges, so micro-batch boundaries
    * can never change them and the accumulated stream output equals
    * the batch operator over the same docs (StreamsSpec pins it
    * cross-batch). Train the merges once with CorpusStats.bpeMerges
    * and barrier/persist them so the training loop never re-runs per
    * batch — the d13 static-model argument applied to the tokenizer
    * artifact. */
  def bpeEncodeStreaming(merges: DataFrame, docs: DataFrame, id: String,
      text: String, k: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats.bpeApply(merges, batch, id,
          text, k))
      }
      .start()

  /** Streaming LM-surprisal scoring: each arriving micro-batch of
    * docs is scored against the STATIC trained bigram LM
    * (graft.operators.CorpusStats.bigramScore over a [[graft.operators.CorpusStats.BigramLm]]
    * whose tables were trained once and barriered/persisted — the
    * d13/d18 static-artifact seam). Scores are per-doc independent
    * given the LM tables, so micro-batch boundaries can never change
    * them and the accumulated stream output equals the batch operator
    * over the same docs (StreamsSpec pins it cross-batch). The
    * hit/backoff/OOV counts ride along, so the same stream drives a
    * perplexity gate or an ingest-QA monitor. */
  def surprisalScoreStreaming(lm: graft.operators.CorpusStats.BigramLm,
      docs: DataFrame, id: String, text: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats.bigramScore(lm, batch, id, text))
      }
      .start()

  /** Streaming fold of the c90 quantile sketch over LM-scored
    * arrivals — d40's live path and the reason the sketch is
    * mergeable at all: each arriving micro-batch is scored against
    * the STATIC bigram LM ([[surprisalScoreStreaming]]'s artifact
    * seam), bucketed into the ≤252-row QuantileSketch state, and
    * FOLDED into the running per-bucket partials (counts add — the
    * d9/d11 set-aggregate class, so drain parity with the batch
    * sketch is exact and batch slicing can never change a number;
    * StreamsSpec pins it cross-batch). Every batch re-emits the full
    * quantile frame (bounds, cumulative counts, nearest-rank marks)
    * — the live ingest-quality distribution monitor. Cross-batch
    * state = the (bucket, n) partials only, never doc-scale. Same
    * at-least-once batchId guard as dedupChurnStreaming. */
  def sketchFoldStreaming(lm: graft.operators.CorpusStats.BigramLm,
      docs: DataFrame, id: String, text: String,
      marks: Seq[(String, Long)],
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{CorpusStats, QuantileSketch}
    import graft.util.Barriers.BarrierOps
    var partials: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // fold AND compact inside the guard: the materialized state
        // really is the ≤252-row merged sketch whatever the stream
        // length (counts add, so compacting at fold time changes no
        // number), and a redelivered batch re-emits nothing — the
        // emission-parity contract counts frames
        if (bid > lastApplied) {
          val p = QuantileSketch.sketch(
            CorpusStats.bigramScore(lm, batch, id, text),
            "mean_bits_ppm")
          partials = Some(QuantileSketch.merge(
              partials.toSeq :+ p).barrier(true))
          lastApplied = bid
          stateProbe(partials.get)
          sink(QuantileSketch.quantiles(partials.get, marks))
        }
      }
      .start()
  }

  /** Streaming span-redaction gate WITH per-batch index re-price —
    * d41: the d33 gate plus the c91 append folded into the loop.
    * Batch b is redacted against the corpus WindowIndex ∪ every
    * EARLIER batch's windows (prefix semantics — a doc pasted twice
    * across arrivals is caught the second time, the cross-arrival
    * match d33 deliberately excludes), then its own windows fold
    * into the state via incrementWindowIndex (counts add, one linear
    * batch pass — never a corpus rescan). Cross-batch state = the
    * (h, nd) count artifact, exactly what the persisted index holds;
    * production checkpoints it with appendToWindowIndexDir at the
    * same cadence. Contract is PREFIX-ordered by construction, so
    * the spec pins parity against the batch replay at the SAME
    * slicing (not slicing-invariance — that is d33's contract).
    * Gate-then-fold runs inside the batchId guard: an at-least-once
    * redelivery neither re-emits nor double-counts. */
  def spanRepriceStreaming(widx: graft.operators.Dedup.WindowIndex,
      docs: DataFrame, id: String, text: String, w: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers.BarrierOps
    var state = widx.hashes.barrier(true)
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val cur = Dedup.WindowIndex(state)
          sink(Dedup.spanRedactGate(cur, batch, id, text, w))
          state = Dedup.incrementWindowIndex(cur, batch, id, text, w)
            .barrier(true)
          lastApplied = bid
        }
      }
      .start()
  }

  /** Streaming KS-drift monitor — c92 LIVE: each arriving batch's
    * per-(source, bucket) sketch rows fold into the running partials
    * (counts add — the same set-aggregate state as [[sketchFoldStreaming]],
    * ≤252 rows per source), and every batch re-emits the per-source
    * KS distance against the CURRENT blend
    * (QuantileSketch.ksDriftFromState over the re-aggregated state —
    * no raw row is ever re-read). The ingest answer to "is one
    * source's length distribution walking away from the mix?", drain
    * parity with the batch c92 contract exact by construction
    * (StreamsSpec pins it). Same at-least-once batchId guard as
    * dedupChurnStreaming. */
  def ksDriftStreaming(docs: DataFrame, key: String, value: String,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.QuantileSketch
    import graft.util.Barriers.BarrierOps
    var partials: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // fold AND compact inside the guard (the d40 shape): state
        // stays ≤252 rows per source however many batches arrive,
        // and a redelivered batch re-emits no duplicate frame
        if (bid > lastApplied) {
          val p = QuantileSketch.sketchBy(batch, key, value)
          partials = Some(partials.map(_.unionAll(p)).getOrElse(p)
            .groupBy(col(key), col("bucket"))
            .agg(sum(col("n")).cast("long").as("n")).barrier(true))
          lastApplied = bid
          stateProbe(partials.get)
          sink(QuantileSketch.ksDriftFromState(partials.get, key))
        }
      }
      .start()
  }

  /** Streaming Moore-Lewis selection gate: arriving docs are scored
    * against TWO static trained bigram LMs (in-domain + general,
    * both barriered — the d19 static-artifact seam doubled) and
    * keep/drop-decided by the cross-entropy difference, map-reduce
    * per batch with NO cross-batch state: scores are per-doc
    * independent given the LM tables, so micro-batch boundaries can
    * never change a decision. The threshold gate (delta ≥ 0) is the
    * streaming-shaped selection — c55's global topK needs a total
    * order over all candidates and stays batch-side. */
  def mooreLewisStreaming(lmIn: graft.operators.CorpusStats.BigramLm,
      lmGen: graft.operators.CorpusStats.BigramLm,
      docs: DataFrame, id: String, text: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats
          .mooreLewisScore(lmIn, lmGen, batch, id, text))
      }
      .start()

  /** Streaming blob near-dup filter against a persisted hash index:
    * each arriving micro-batch of blobs hashes map-side
    * (blockMeanHash — per-doc, no shuffle) and band-joins the STATIC
    * [[graft.operators.Multimodal.blockMeanHash]] index built once
    * on the corpus (barriered — the d18/d19 static-artifact seam;
    * c25's batch-vs-persisted-index shape for the multimodal
    * column). Matches are per-doc independent given the index, so
    * micro-batch boundaries can never change them — NO cross-batch
    * state. */
  def blobNearDupStreaming(index: DataFrame, docs: DataFrame,
      id: String, text: String, tau: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Multimodal
          .blobNearDupAgainst(index, batch, id, text, tau))
      }
      .start()

  /** Streaming PQ encode-at-ingest: each arriving micro-batch of
    * vectors is compressed to its PQ codes against the STATIC
    * codebooks ([[graft.operators.Ann.pqFit]], trained once,
    * barriered — the static-artifact seam) — a broadcast join +
    * per-(vector, subspace) argmin, no shuffle of the stream, no
    * cross-batch state (codes are per-vector independent given the
    * codebooks). This is the production write path of a compressed
    * vector index: floats arrive, codes + the stored norm land in
    * the index, the floats can be archived. */
  def pqEncodeStreaming(cent: DataFrame, vectors: DataFrame,
      id: String, vec: String, m: Int, subDim: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Ann
          .pqCodes(batch, id, vec, cent, m, subDim))
      }
      .start()

  /** Static eval-side shingle table for [[contaminationHitsStreaming]]. */
  def evalShingles(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("eval_id"),
      explode(array_distinct(
        graft.functions.TextOps.shingleHashes(col(text)))).as("h"))

  /** Streaming ingest filter against a persisted corpus: each
    * micro-batch of arriving docs is keep/drop-decided by
    * [[graft.operators.Dedup.corpusFilter]] — banded candidates
    * against the corpus index, exact-Jaccard verify on candidates
    * only. Decisions are per-doc independent (corpus-only pairs), so
    * micro-batch boundaries never change them and the accumulated
    * stream output equals the batch operator over the same docs
    * (StreamsSpec pins it cross-batch). Cross-arrival novelty
    * composes via [[bandClaimStreaming]]. */
  def corpusFilterStreaming(index: graft.operators.Dedup.DedupIndex,
      docs: DataFrame, id: String, text: String, tau: Double)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.corpusFilter(index, batch, id, text, tau))
      }
      .start()

  /** Streaming importance gate: each arriving micro-batch of docs is
    * scored map-side against the STATIC hashed contrastive model
    * ([[graft.operators.CorpusStats.importanceScore]] — a broadcast
    * join on the fixed-size dense bucket table, then a per-doc sum
    * that never leaves the batch).
    * Decisions are per-doc independent given the model, so
    * micro-batch boundaries never change them and the accumulated
    * stream output equals the batch operator over the same docs
    * (StreamsSpec pins it cross-batch). Train the weights once with
    * importanceWeights and barrier (or persist) so the model never
    * re-derives per batch. The gate threshold is part of the trained
    * artifact: keep iff score exceeds the MEAN raw-train score,
    * compared as score·nRaw > sumRaw — an integer multiply, no
    * division, so truncate-vs-floor on negative means can never
    * diverge between engines (§4). */
  def importanceGateStreaming(weights: DataFrame, docs: DataFrame,
      id: String, text: String, buckets: Int, nRaw: Long, sumRaw: Long)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.CorpusStats
          .importanceScore(weights, batch, id, text, buckets)
          .where(expr(s"cast(score as decimal(38,0)) * $nRaw > $sumRaw")))
      }
      .start()

  /** Streaming length-band gate: arriving docs are kept iff their
    * token count lies inside the TRAINED [lo, hi] percentile band
    * (Sampling.lengthThresholds over the static corpus — barrier the
    * row so the histogram pass never re-runs per batch; the d13/d19
    * static-artifact seam). Per-doc decisions are threshold-static and
    * independent, so micro-batch boundaries can never change them;
    * the gate itself is a broadcast one-row join + a map filter. */
  def lengthGateStreaming(thresholds: DataFrame, docs: DataFrame,
      id: String, text: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(batch
          .select(col(id),
            size(graft.functions.TextOps.tokens(col(text)))
              .cast("long").as("n"))
          .crossJoin(broadcast(thresholds))
          .where(col("n").between(col("lo"), col("hi")))
          .select(col(id), col("n")))
      }
      .start()

  /** Per-user retention state: first-seen week and a bitmask of the
    * week offsets (0..63) already counted. */
  case class RetSt(cohortWeek: Long, seenBits: Long)

  /** Streaming retention tracker — a20's cohort triangle maintained
    * live: keyed state per user holds (first-seen week, bitmask of
    * counted offsets) — O(users) state, two longs — and each batch
    * emits the user's NOVEL (cohort_week, week_offset) cells, so the
    * accumulated emissions count each active week exactly once per
    * user (the sink/downstream agg builds the matrix by summing).
    * Each batch's per-user group folds in (week, id) order, so
    * within-batch arrival order is irrelevant (StreamsSpec pins
    * invariance under permuted arrivals), and the seen-bitmask makes
    * LATER weeks order-free even across batches; only the FIRST
    * event must not arrive late across batches (the d2/d3
    * convention) — and if it does, the offset guard throws rather
    * than miscounting the cohort. Offsets are capped at 63 by
    * the bitmask — a 64-week horizon; production monitors roll the
    * window, and the cap is an explicit guard here, not a silent
    * truncation (events beyond it throw). */
  def retentionStreaming(events: DataFrame)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"),
        col("event_id"))
      .as[(Long, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[RetSt, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[RetSt]) =>
          val rows = it.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(RetSt(-1L, 0L))
          val novel = Seq.newBuilder[(Long, Long)]
          rows.foreach { case (_, wk, _) =>
            if (st.cohortWeek < 0) st = RetSt(wk, 0L)
            val off = wk - st.cohortWeek
            require(off >= 0 && off < 64,
              s"retention offset $off outside the 64-week horizon")
            if ((st.seenBits & (1L << off)) == 0L) {
              novel += ((st.cohortWeek, off))
              st = RetSt(st.cohortWeek, st.seenBits | (1L << off))
            }
          }
          state.update(st)
          novel.result().iterator
      }
      .toDF("cohort_week", "week_offset")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  case class REvT(user_id: Long, week: Long, event_id: Long, us: Long,
                  ts: java.sql.Timestamp)
  case class OooRet(buf: Seq[REvT], st: RetSt)

  /** [[retentionStreaming]] hardened for CROSS-BATCH event-time
    * disorder. Only the FIRST event is order-sensitive (it fixes the
    * cohort week; later weeks are order-free through the seen-bitmask),
    * so the reorder buffer is MINIMAL: a key buffers arrivals only
    * until its first event is watermark-final — once any event folds
    * from strictly below the watermark, no earlier event can still
    * arrive (below-watermark arrivals are dropped at the door), the
    * cohort is fixed forever, and everything buffered or arriving
    * folds immediately (their weeks are ≥ the cohort week by the
    * watermark ordering). State beyond the two RetSt longs therefore
    * exists only during each key's first watermark interval. Emits
    * novel (cohort_week, week_offset) cells exactly like the ordered
    * flavor. */
  def retentionStreamingOoo(events: DataFrame, delay: String = "2 hours")
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"),
        col("event_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[REvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OooRet, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[REvT], state: GroupState[OooRet]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val os = state.getOption.getOrElse(OooRet(Nil, RetSt(-1L, 0L)))
          val buf = os.buf ++ it.filter(_.us >= wmUs)
          var st = os.st
          val novel = Seq.newBuilder[(Long, Long)]
          def fold(evs: Seq[REvT]): Unit =
            evs.sortBy(e => (e.us, e.event_id)).foreach { e =>
              if (st.cohortWeek < 0) st = RetSt(e.week, 0L)
              val off = e.week - st.cohortWeek
              require(off >= 0 && off < 64,
                s"retention offset $off outside the 64-week horizon")
              if ((st.seenBits & (1L << off)) == 0L) {
                novel += ((st.cohortWeek, off))
                st = RetSt(st.cohortWeek, st.seenBits | (1L << off))
              }
            }
          val keep: Seq[REvT] =
            if (st.cohortWeek >= 0) { fold(buf); Nil }
            else {
              val (safe, hold) = buf.partition(_.us < wmUs)
              if (safe.nonEmpty) { fold(safe); fold(hold); Nil }
              else hold
            }
          state.update(OooRet(keep, st))
          if (keep.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          novel.result().iterator
      }
      .toDF("cohort_week", "week_offset")
      .writeStream.outputMode(OutputMode.Update)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
  }

  /** Streaming decontamination gate — c68's scrub applied AT INGEST:
    * arriving docs are dropped when they share ≥ minPpm of any eval
    * doc's distinct shingles. `evalSh` (eval_id, h) and `evalSizes`
    * (eval_id, n_eval_shingles) are the STATIC eval-suite artifact
    * (barrier them — built once, never per batch; eval suites are
    * small so the shingle join is broadcast map-side, c27's shape).
    * Decisions are per-doc independent given the eval set, so batch
    * boundaries can never change them. Emits the KEPT docs with
    * their worst overlap. */
  def decontaminateStreaming(evalSh: DataFrame, evalSizes: DataFrame,
      docs: DataFrame, id: String, text: String, minPpm: Long)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tr = batch.select(col(id),
          explode(array_distinct(
            graft.functions.TextOps.shingleHashes(col(text)))).as("h"))
        val worst = tr.join(broadcast(evalSh), "h")
          .groupBy(col(id), col("eval_id"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(evalSizes), "eval_id")
          .select(col(id),
            expr("(cast(n_shared as decimal(38,0)) * 1000000)" +
              " div n_eval_shingles").cast("long").as("overlap_ppm"))
          .groupBy(col(id))
          .agg(max(col("overlap_ppm")).as("worst_ppm"))
        sink(batch.select(col(id))
          .join(worst, Seq(id), "left")
          .withColumn("worst_ppm", coalesce(col("worst_ppm"), lit(0L)))
          .where(col("worst_ppm") < minPpm))
      }
      .start()

  /** Streaming dedup-churn monitor — c74's snapshot audit kept LIVE
    * while the new corpus version ingests: the OLD snapshot is its
    * persisted band index (static, barriered once, never rescanned);
    * arriving docs build the new side INCREMENTALLY (the c25
    * index-append pattern: each batch is indexed once, pairs are
    * discovered by batch×arrived + batch-self banded joins only —
    * standing pairs are never re-verified), and every batch re-emits
    * the headline counters (Dedup.churnCounters) over the diff of
    * old-pairs vs pairs-found-so-far. Mid-stream the counters read
    * "as if the stream ended now" — an old pair whose endpoints
    * haven't arrived counts `resolved` until they do — and at drain
    * they equal the batch snapshotDiff+churnCounters exactly
    * (StreamsSpec pins it cross-batch; doc sets make this
    * order-independent, so no reorder buffer is needed). State = the
    * arrived index + discovered pair set, barriered per batch — at
    * cluster scale both are the parquet-append artifacts c25/c29
    * persist, priced once per corpus, not per batch. `sources` =
    * (sid, src) metadata for every id either snapshot can name.
    * foreachBatch is at-least-once, so state mutation is guarded on
    * the batchId — a retried batch re-emits the counters from the
    * already-applied state instead of re-unioning itself into the
    * arrived index (which would double-count intersections). The
    * in-memory state spans ONE query lifetime; across restarts,
    * production re-seeds from the persisted parquet-append artifacts
    * (the c25/c29 pattern) rather than this object's vars. */
  def dedupChurnStreaming(oldIdx: graft.operators.Dedup.DedupIndex,
      sources: DataFrame, docs: DataFrame, id: String, text: String,
      tau: Double, k: Int = 48, bands: Int = 24)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers.BarrierOps
    val oldP = Dedup.indexPairs(oldIdx, tau)
      .select(col("id_a"), col("id_b"), col("j_ppm").as("j_old"))
      .barrier(true)
    val srcs = sources.barrier(true)
    var arrived: Option[Dedup.DedupIndex] = None
    var newP: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val inc = Dedup.buildIndex(batch, id, text, k, bands)
          val found = Dedup.incrementPairs(arrived, inc, tau)
          newP = Some(newP.map(_.unionAll(found)).getOrElse(found)
            .barrier(true))
          arrived = Some(arrived.map(a => Dedup.DedupIndex(
              a.shingles.unionAll(inc.shingles).barrier(true),
              a.bands.unionAll(inc.bands).barrier(true)))
            .getOrElse(inc))
          lastApplied = bid
        }
        val diff = oldP.join(
            newP.get.select(col("id_a"), col("id_b"),
              col("j_ppm").as("j_new")),
            Seq("id_a", "id_b"), "full_outer")
          .select(col("id_a"), col("id_b"),
            when(col("j_old").isNotNull && col("j_new").isNotNull,
              lit("persisting"))
              .when(col("j_new").isNotNull, lit("new"))
              .otherwise(lit("resolved")).as("status"),
            coalesce(col("j_new"), col("j_old")).as("j_ppm"))
        sink(Dedup.churnCounters(diff, srcs))
      }
      .start()
  }

  /** Streaming paraphrase-level decontamination gate — c76's fuzzy
    * detector applied AT INGEST (the d28 shape with the bigram
    * MinHash unit): arriving docs are dropped when their worst
    * bigram Jaccard against any eval doc reaches `minPpm`. The eval
    * side is the STATIC [[graft.operators.Dedup.FuzzyEvalIndex]]
    * (barriered once — never rebuilt per batch; eval suites are
    * small, so its bands broadcast map-side). Decisions are per-doc
    * independent given the eval artifact, so batch boundaries can
    * never change them; emits the KEPT docs with their worst ppm. */
  def fuzzyDecontaminateStreaming(idx: graft.operators.Dedup.FuzzyEvalIndex,
      docs: DataFrame, id: String, text: String, minPpm: Long,
      k: Int = 48, bands: Int = 24)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.fuzzyGate(idx, batch, id, text,
          minPpm, k, bands))
      }
      .start()

  /** Streaming span-level redaction gate — c78's ExactSubstr deletion
    * applied AT INGEST ([[graft.operators.Dedup.spanRedactGate]]):
    * each arriving doc loses the tokens covered by w-token windows
    * that exist in the persisted corpus
    * [[graft.operators.Dedup.WindowIndex]] or repeat within the doc
    * itself. The gate is stateless given the artifact (per-doc
    * decisions; cross-arrival matches are out of contract by design),
    * so batch boundaries can never change an output row — StreamsSpec
    * pins slicing parity against the one-batch run. At 100 TB the
    * per-batch cost is one equi-join of the batch's windows against
    * the hash-keyed index artifact. */
  def spanRedactStreaming(widx: graft.operators.Dedup.WindowIndex,
      docs: DataFrame, id: String, text: String, w: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Dedup.spanRedactGate(widx, batch, id,
          text, w))
      }
      .start()

  /** Streaming FILTERED vector search — c83's metadata-constrained
    * probe applied to arriving vectors
    * ([[graft.operators.Ann.indexedFilteredTopK]]): each arriving
    * vector finds its top-k same-label neighbors in the persisted
    * index. The micro-batch IS the (small, broadcast) query side —
    * the probe join DPP-prunes the lists scan per batch — and
    * answers are per-query independent given the index, so batch
    * boundaries can never change a row (StreamsSpec pins slicing
    * parity). */
  def filteredAnnStreaming(idx: graft.operators.Ann.IvfIndex,
      vecs: DataFrame, id: String, vec: String, labelCol: String,
      nprobe: Int, k: Int)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateless
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.Ann.indexedFilteredTopK(idx, batch, id,
          vec, labelCol, nprobe, k))
      }
      .start()

  /** Streaming keeper-upgrade monitor — c77's quality-aware keeper
    * question asked AT INGEST, kept live across batches: arriving
    * docs that near-dup a corpus doc (banded crossPairs against the
    * STATIC persisted corpus index) challenge that doc's cluster for
    * keeper-ship on quality. Static artifacts (index, full cluster
    * map with singletons as self-clusters, per-doc corpus quality)
    * are barriered once; the only cross-batch state is the
    * accumulated (cluster, challenger, q_ppm) set — bounded by docs
    * that actually near-dup the corpus, the near-dup sparsity bound.
    * Each batch re-emits the per-cluster verdict
    * (Dedup.keeperVerdict); at drain it equals the batch
    * Dedup.keeperChallenge exactly (set semantics — batch slicing
    * can only delay, never change, a verdict; StreamsSpec pins it
    * cross-batch). */
  def keeperUpgradeStreaming(idx: graft.operators.Dedup.DedupIndex,
      corpusClusters: DataFrame, corpusQ: DataFrame, docs: DataFrame,
      id: String, text: String, tau: Double, k: Int = 48,
      bands: Int = 24)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers.BarrierOps
    val clB = corpusClusters.barrier(true)
    val qB = corpusQ.barrier(true)
    var challengers: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        // at-least-once guard (see dedupChurnStreaming): a retried
        // batch id must not re-union its challengers; it just
        // re-emits the verdict from the already-applied state.
        if (bid > lastApplied) {
          val bIdx = Dedup.buildIndex(batch, id, text, k, bands)
          val ch = Dedup.crossPairs(idx, bIdx, tau)
            .join(clB.select(col("did").as("id_a"), col("cluster")),
              Seq("id_a"))
            .select(col("cluster"), col("id_b")).distinct()
            .join(Dedup.qualityPpm(batch, id, text)
              .select(col("did").as("id_b"), col("q_ppm")), Seq("id_b"))
            .select(col("cluster"), col("id_b").as("did"), col("q_ppm"))
          challengers = Some(challengers.map(_.unionAll(ch)).getOrElse(ch)
            .barrier(true))
          lastApplied = bid
        }
        sink(Dedup.keeperVerdict(challengers.get, clB, qB))
      }
      .start()
  }

  /** Streaming incremental IVF append monitor — c79's index-forever
    * question asked AT INGEST: each arriving micro-batch of vectors
    * is assigned MAP-SIDE to the persisted index's STATIC centroids
    * (Ann.arrivalAssign — one-row broadcast centroid array, the
    * batch is never shuffled) and folded into the running per-list
    * arrival stats; every batch re-emits the c79 audit (per-list
    * growth + assignment-quality drift vs the training distribution
    * — the retrain signal, live). Cross-batch state = per-list
    * partial sums only (≤ k rows per batch, re-aggregated exactly —
    * floor-mean over TOTALS, never a mean of means), so drain parity
    * with the batch Ann.ivfAppendAudit is exact and batch slicing
    * can never change a number (set-aggregate semantics; StreamsSpec
    * pins it cross-batch). Same at-least-once batchId guard as
    * dedupChurnStreaming; production re-seeds the partials from the
    * parquet-appended lists on restart. */
  def ivfAppendStreaming(idx: graft.operators.Ann.IvfIndex,
      arrivals: DataFrame, id: String, vec: String,
      maxGrowthPpm: Long = 250000L, maxDriftDownPpm: Long = 70000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val baseB = Ann.ivfBaseStats(idx).barrier(true)
    var partials: Option[DataFrame] = None
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = Ann.arrivalAssign(idx, batch, id, vec)
            .groupBy(col("c_id"))
            .agg(count(lit(1)).cast("long").as("n"),
              sum(col("sim_ppm") + lit(1000000L)).as("s"))
          partials = Some(partials.map(_.unionAll(p)).getOrElse(p)
            .barrier(true))
          lastApplied = bid
        }
        val arrived = partials.get.groupBy(col("c_id"))
          .agg(sum(col("n")).cast("long").as("n_arrived"),
            expr("(sum(s) div sum(n)) - 1000000").cast("long")
              .as("arrived_sim_ppm"))
        sink(Ann.retrainVerdict(Ann.auditJoin(baseB, arrived),
          maxGrowthPpm, maxDriftDownPpm).orderBy(col("c_id")))
      }
      .start()
  }

  /** Streaming takedown feed — c89's physical delete applied AT
    * ARRIVAL against a persisted IVF index directory: each batch of
    * delete ids compacts the index in place (Ann.deleteFromIndexDir —
    * only the touched `c_id=` partitions rewrite, the c81 seam) and
    * emits the running per-batch audit (ids actually present, lists
    * touched, members remaining). Deletes are idempotent row
    * removals, so the d29-style batchId guard makes at-least-once
    * redelivery harmless; cross-batch state is the accumulated audit
    * rows (one per batch), nothing corpus-sized. The audit rows are
    * barriered before the next batch's overwrite so no emission ever
    * lazily reads files a later compaction replaced. Sequential
    * batches equal the one-shot delete of their union
    * (delete-is-an-anti-join — order-free; StreamsSpec pins it). */
  def deleteFeedStreaming(baseDir: String, deletes: DataFrame,
      id: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    var acc: Option[DataFrame] = None
    var lastApplied = -1L
    deletes.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val s = batch.sparkSession
        if (bid > lastApplied) {
          val dset = batch.select(col(id).as("n_id")).distinct()
            .barrier(true)
          val memb = s.read.parquet(s"$baseDir/lists")
            .select(col("n_id"), col("c_id").cast("long").as("c_id"))
          // Materialize the pre-delete audit BEFORE the compaction
          // rewrites the `c_id=` partitions it reads — a lazy `hit`
          // evaluated after deleteFromIndexDir would scan the
          // replaced files (n_deleted=0 or FileNotFoundException).
          val hit = memb.join(dset, Seq("n_id"), "left_semi")
            .agg(count(lit(1)).cast("long").as("n_deleted"),
              countDistinct(col("c_id")).cast("long")
                .as("lists_touched"))
            .withColumn("batch", lit(bid))
            .barrier(true)
          Ann.deleteFromIndexDir(s, baseDir, dset)
          val after = s.read.parquet(s"$baseDir/lists")
            .agg(count(lit(1)).cast("long").as("n_after"))
          val row = hit.crossJoin(after)
            .select(col("batch"), col("n_deleted"),
              col("lists_touched"), col("n_after"))
            .barrier(true)
          acc = Some(acc.map(_.unionAll(row)).getOrElse(row)
            .barrier(true))
          lastApplied = bid
        }
        sink(acc.get.orderBy(col("batch")))
      }
      .start()
  }

  /** The retrain-cycle DRIVER live — d32's alarm composed with c80's
    * apply AT INGEST (the batch contract is Ann.retrainCycle; here
    * the stream's own micro-batch id IS the batch axis): each batch
    * folds into the d32 per-list partials, the index-level decision
    * fires at the first batch where flagged lists reach `majorityPpm`
    * of k, and firing freezes the cycle record — c80's retrainAudit
    * over base + the arrivals seen so far, stamped with the firing
    * batch id. Before the cycle fires, every emission carries the
    * live verdict with IDENTITY post-columns (n_after = n_before,
    * delta_n = 0, move_ppm = 1e6, trigger_batch = -1): the index is
    * unchanged until the cycle actually runs. Cross-batch state =
    * the k-row partials + the accumulated arrival set (the c80 audit
    * needs the vectors themselves — bounded by the arrivals between
    * retrains, which a fired cycle folds into the index); the firing
    * probe is a k-row isEmpty control action, the migrateIndexDir
    * class. Same at-least-once batchId guard as dedupChurnStreaming.
    */
  def retrainCycleStreaming(idx: graft.operators.Ann.IvfIndex,
      arrivals: DataFrame, id: String, vec: String,
      majorityPpm: Long = 750000L, maxGrowthPpm: Long = 300000L,
      maxDriftDownPpm: Long = 20000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    val baseB = Ann.ivfBaseStats(idx).barrier(true)
    val kDf = idx.centroids.agg(count(lit(1)).as("k"))
    var partials: Option[DataFrame] = None
    var arrAcc: Option[DataFrame] = None
    var cycle: Option[DataFrame] = None
    var lastApplied = -1L
    def liveVerdict(): DataFrame =
      Ann.retrainVerdict(
        Ann.auditJoin(baseB, partials.get.groupBy(col("c_id"))
          .agg(sum(col("n")).cast("long").as("n_arrived"),
            expr("(sum(s) div sum(n)) - 1000000").cast("long")
              .as("arrived_sim_ppm"))),
        maxGrowthPpm, maxDriftDownPpm)
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = Ann.arrivalAssign(idx, batch, id, vec)
            .groupBy(col("c_id"))
            .agg(count(lit(1)).cast("long").as("n"),
              sum(col("sim_ppm") + lit(1000000L)).as("s"))
          partials = Some(partials.map(_.unionAll(p)).getOrElse(p)
            .barrier(true))
          arrAcc = Some(arrAcc.map(_.unionAll(batch)).getOrElse(batch)
            .barrier(true))
          lastApplied = bid
          if (cycle.isEmpty) {
            val fire = !liveVerdict()
              .agg(coalesce(sum(col("retrain")), lit(0L)).as("nf"))
              .crossJoin(kDf)
              .where(col("nf") * 1000000L >= col("k") * majorityPpm)
              .isEmpty
            if (fire) cycle = Some(
              Ann.retrainAudit(idx, arrAcc.get, id, vec, maxGrowthPpm,
                  maxDriftDownPpm)
                .withColumn("trigger_batch", lit(bid))
                .barrier(true))
          }
        }
        sink(cycle.getOrElse(liveVerdict()
            .select(col("c_id"), col("retrain"),
              (col("n_base") + col("n_arrived")).as("n_before"))
            .withColumn("n_after", col("n_before"))
            .withColumn("delta_n", lit(0L))
            .withColumn("move_ppm", lit(1000000L))
            .withColumn("trigger_batch", lit(-1L)))
          .orderBy(col("c_id")))
      }
      .start()
  }

  /** Live-insert vector search AT INGEST — the batch contract is
    * Ann.freshTopK; here the stream's own micro-batch id IS the batch
    * axis: each arriving batch first PROBES the base index plus every
    * prior arrival (so a query's answers include what just landed —
    * the near-dup-of-recent-data case a stale index misses), then
    * appends its own map-side assignment to the accumulated state.
    * Probe-before-append gives the same strictly-earlier visibility
    * as the replay's `batch <`, so feeding the replay's slices
    * reproduces freshTopK row for row (StreamsSpec parity pin).
    * Cross-batch state = the assigned arrivals since the index was
    * last refreshed (exactly what appendIndexDir folds in at the next
    * append — live state and the physical index stay in sync by
    * construction). Same at-least-once batchId guard as
    * dedupChurnStreaming. */
  def annFreshnessStreaming(idx: graft.operators.Ann.IvfIndex,
      arrivals: DataFrame, id: String, vec: String,
      nprobe: Int = 2, k: Int = 3)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    var acc: Option[DataFrame] = None
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          sink(Ann.freshProbe(idx, acc, batch, id, vec, nprobe, k)
            .orderBy(col("q_id"), col("rank")))
          val a = Ann.arrivalAssign(idx, batch, id, vec)
            .select(col("c_id"), col("n_id"), col("n_vec"), col("n_nrm"))
          acc = Some(acc.map(_.unionAll(a)).getOrElse(a).barrier(true))
          lastApplied = bid
        }
      }
      .start()
  }

  /** Streaming fold of the c95 bottom-k-by-hash sample — d43: each
    * arriving batch's per-(stratum, hash) representatives merge into
    * the running bottom-k state (bottom-k of a union = bottom-k of
    * the two bottom-k's; rep ids combine by min — the KMV synopsis is
    * mergeable exactly like c90's sketch, so drain parity with the
    * batch operator is by construction and slicing can never change a
    * row). Every applied batch re-emits the current sample plus the
    * live KMV distinct estimate — the ingest-side "how much NEW
    * content is actually arriving" monitor (duplication-invariant: a
    * re-crawl storm of known docs moves nothing). Cross-batch state ≤
    * |strata| × k rows by construction (the TopKPerKey compaction IS
    * the fold); gate-then-fold inside the batchId guard — an
    * at-least-once redelivery neither re-emits nor double-folds. */
  def bottomKFoldStreaming(docs: DataFrame, stratum: String,
      id: String, text: String, k: Int = 8,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = batch
            .select(col(stratum), TextOps.polyHashMixed(col(text)).as("h"),
              col(id).cast("long").as("rep0"))
            .groupBy(col(stratum), col("h"))
            .agg(min(col("rep0")).as("rep_id"))
          val merged = state.map(_.unionByName(p)).getOrElse(p)
            .groupBy(col(stratum), col("h"))
            .agg(min(col("rep_id")).as("rep_id"))
          val topk = graft.plans.TopKPerKey(merged, Seq(col(stratum)),
            Seq(col("h"), col("rep_id")), k, rankName = "rk")
            .barrier(true)
          state = Some(topk.drop("rk"))
          lastApplied = bid
          stateProbe(state.get)
          val kth = topk.groupBy(col(stratum))
            .agg(max(col("h")).as("h_k"), count(lit(1)).as("n_kept"))
          sink(topk
            .join(broadcast(kth), Seq(stratum))
            .withColumn("est_distinct",
              when(col("n_kept") >= k,
                expr(s"${(k - 1).toLong * TextOps.P} div h_k"))
                .otherwise(col("n_kept")))
            .select(col(stratum), col("rk").cast("long").as("rk"),
              col("rep_id"), col("h"), col("est_distinct"))
            .orderBy(col(stratum), col("rk")))
        }
      }
      .start()
  }

  /** Streaming fold of the c97 token-mass-weighted priority sample —
    * d47: each arriving doc's priority (id-hash div token count) is a
    * per-doc CONSTANT, so the bottom-(k+1)-by-priority state merges
    * exactly like d43's bottom-k-by-hash (bottom-k of a union =
    * bottom-k of the two bottom-k's) — the k+1th row rides along
    * because the DLT threshold estimator needs it: τ = P div p_(k+1),
    * est_mass = Σ_kept max(w, τ), re-emitted per applied batch as the
    * live "how much token mass is arriving per source" monitor whose
    * sample stays ∝ token mass under any arrival order. Batch
    * contract = c97 minus the exact totals (deliberately NOT
    * mergeable from a (k+1)-row state — c95/d43's discipline). State
    * ≤ |strata| × (k+1) rows; gate-then-fold inside the batchId
    * guard. */
  def priorityFoldStreaming(docs: DataFrame, stratum: String,
      id: String, text: String, k: Int = 8,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = batch.select(col(stratum),
              col(id).cast("long").as("did"),
              size(TextOps.tokens(col(text))).cast("long").as("w"),
              TextOps.polyHashMixed(
                concat(col(stratum), lit(":"), col(id).cast("string")))
                .as("u"))
            .withColumn("priority", expr("u div greatest(w, 1L)"))
            .select(col(stratum), col("did"), col("w"), col("priority"))
          val merged = state.map(_.unionByName(p)).getOrElse(p)
          val topk1 = graft.plans.TopKPerKey(merged, Seq(col(stratum)),
            Seq(col("priority"), col("did")), k + 1, rankName = "rk")
            .barrier(true)
          state = Some(topk1.drop("rk"))
          lastApplied = bid
          stateProbe(state.get)
          val tau = topk1.groupBy(col(stratum))
            .agg(max(when(col("rk") === k + 1,
              expr(s"${TextOps.P} div greatest(priority, 1L)"))).as("tau"))
          val kept = topk1.where(col("rk") <= k)
          val est = kept.join(broadcast(tau), Seq(stratum))
            .groupBy(col(stratum))
            .agg(sum(greatest(col("w"), coalesce(col("tau"), lit(0L))))
              .cast("long").as("est_mass"))
          sink(kept
            .join(broadcast(est), Seq(stratum))
            .select(col(stratum), col("rk").cast("long").as("rk"),
              col("did"), col("w"), col("priority"), col("est_mass"))
            .orderBy(col(stratum), col("rk")))
        }
      }
      .start()
  }

  /** Streaming edit-verify gate — d49, c106's live half against a
    * FROZEN corpus (the static-artifact seam): the corpus winnowing
    * print index and its texts are built once (c103's persisted
    * artifact in production); each arriving batch winnows its OWN
    * prints, candidates come from the print equi-join against the
    * index, and only candidates with >= minShared shared prints pay
    * the Levenshtein DP against the matched corpus text — the live
    * "is this arrival a near-copy of something we already have?"
    * gate whose per-batch work is bounded by the arrival's own
    * candidate count whatever the corpus size. STATELESS across
    * batches (each arrival verifies against the frozen index), so
    * drain parity with the c106-shaped batch contract is immediate;
    * emission inside the batchId guard (no duplicate frames on
    * at-least-once redelivery). */
  def editVerifyStreaming(corpus: DataFrame, arrivals: DataFrame,
      id: String, text: String, kg: Int = 4, w: Int = 4,
      minShared: Long = 2L, tauPpm: Long = 500000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers.BarrierOps
    val cp = Dedup.winnowingPrints(corpus, id, text, kg, w)
      .withColumnRenamed("did", "c_id").barrier(true)
    val ctext = corpus.select(col(id).as("c_id"), col(text).as("tb"))
      .barrier(true)
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          val ap = Dedup.winnowingPrints(batch, id, text, kg, w)
            .withColumnRenamed("did", "a_id")
          sink(ap.join(cp, "h")
            .groupBy(col("a_id"), col("c_id"))
            .agg(count(lit(1)).as("n_shared"))
            .where(col("n_shared") >= minShared)
            .join(batch.select(col(id).as("a_id"), col(text).as("ta")),
              "a_id")
            .join(ctext, "c_id")
            .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
            .withColumn("maxlen",
              greatest(length(col("ta")), length(col("tb"))).cast("long"))
            .withColumn("sim_ppm",
              expr("cast(cast(maxlen - dist as decimal(38,0)) * 1000000 div maxlen as bigint)"))
            .where(col("sim_ppm") >= tauPpm)
            .select(col("a_id"), col("c_id"), col("n_shared"),
              col("dist"), col("sim_ppm"))
            .orderBy(col("a_id"), col("c_id")))
        }
      }
      .start()
  }

  /** Per-(event_type, hour) counts off the events table — the grid
    * [[rateSpikes]] audits and the d52 fold maintains (counts add). */
  def hourCounts(events: DataFrame): DataFrame =
    // FLOOR division (a - pmod(a,b)) div b, not `div` (truncate toward
    // zero): the DuckDB mirror uses `//` (floor), and for pre-epoch
    // timestamps the two differ by one hour — floor keeps the bucket
    // grid consistent across engines for any ts.
    events.select(col("event_type"),
        expr("""(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))
                div 3600000000""").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))

  /** Rate-spike audit over an (event_type, hr, n) grid: an hour is a
    * spike when its count exceeds 3× the trailing-24h hourly mean
    * (cross-multiplied integers — n·24 > 3·trail, §4), with a RANGE
    * frame so missing hours count as zero (a ROWS frame would
    * silently skip gaps and compare against the wrong day), and the
    * WARM-UP rule: flag only when all 24 trailing hours were
    * observed — a ramping or sparse type compares against a partial
    * day and would false-alarm forever otherwise. The window
    * partitions on event_type — per-group size = the hour horizon
    * (§8l bounded class: the grid is the monitor's own output). */
  def rateSpikes(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-24, -1)
    counts
      .withColumn("trail_sum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("trail_hours",
        coalesce(count(col("n")).over(w), lit(0L)))
      .withColumn("spike",
        when(col("trail_hours") === 24L &&
          col("n") * 24L > col("trail_sum") * 3L, 1L).otherwise(0L))
      .select(col("event_type"), col("hr"), col("n"), col("trail_sum"),
        col("trail_hours"), col("spike"))
  }

  /** Streaming rate-spike monitor — d52: arriving events' per-(type,
    * hour) counts FOLD by addition into the running grid (compacted
    * at fold time), and every applied batch re-emits the full spike
    * audit recomputed from the grid alone — trailing sums and spike
    * flags are pure functions of the counts, so drain parity with
    * the batch contract is exact under any slicing (late events
    * simply add to their hour and the audit re-evaluates — the
    * at-least-once-friendly shape). State = the (type, hour) grid
    * itself, bounded by types × the stream's hour horizon (the
    * monitor's own output size); gate-then-fold inside the batchId
    * guard. */
  def rateMonitorStreaming(events: DataFrame,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    events.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = hourCounts(batch)
          state = Some(state.map(_.unionByName(p)).getOrElse(p)
            .groupBy(col("event_type"), col("hr"))
            .agg(sum(col("n")).cast("long").as("n"))
            .barrier(true))
          lastApplied = bid
          stateProbe(state.get)
          sink(rateSpikes(state.get)
            .orderBy(col("event_type"), col("hr")))
        }
      }
      .start()
  }

  /** Streaming containment gate — d53, c112's live half against a
    * FROZEN corpus shingle index (the d49/d51 stateless-probe seam):
    * an arriving doc whose shingle set is mostly contained in
    * existing content is flagged with its evidence — the quote-farm
    * / re-post arrival a symmetric-Jaccard gate misses because the
    * arrival is small against a big match. Stateless per batch
    * (frozen index), drain parity immediate, emission inside the
    * batchId guard. */
  def containmentGateStreaming(corpus: DataFrame, arrivals: DataFrame,
      id: String, text: String, tauPpm: Long = 800000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers.BarrierOps
    val csh = corpus.select(col(id).as("c_id"),
        explode(graft.functions.TextOps.shingleHashes(col(text))).as("s"))
      .barrier(true)
    val csz = csh.groupBy(col("c_id")).agg(count(lit(1)).as("nb"))
      .barrier(true)
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          val ash = batch.select(col(id).as("a_id"),
            explode(graft.functions.TextOps.shingleHashes(col(text)))
              .as("s"))
          val asz = ash.groupBy(col("a_id")).agg(count(lit(1)).as("na"))
          sink(ash.join(csh, "s")
            .groupBy(col("a_id"), col("c_id"))
            .agg(count(lit(1)).as("c"))
            .join(asz, "a_id").join(csz, "c_id")
            .withColumn("c_arr_ppm",
              expr("cast(cast(c as decimal(38,0)) * 1000000 div na as bigint)"))
            .withColumn("j_ppm",
              expr("cast(cast(c as decimal(38,0)) * 1000000 div (na + nb - c) as bigint)"))
            .where(col("c_arr_ppm") >= tauPpm)
            .select(col("a_id"), col("c_id"), col("na"), col("nb"),
              col("c_arr_ppm"), col("j_ppm"))
            .orderBy(col("a_id"), col("c_id")))
        }
      }
      .start()
  }

  /** Streaming split router — d50, c109's live half (batch contract =
    * Dedup.splitRoute): arrivals route to train/val/test against the
    * FROZEN corpus index + cluster map — a near-dup of corpus content
    * inherits the corpus cluster's split (the same c109 keeper-hash
    * bucket, so ingest can never put a near-copy of a test doc into
    * train), a novel arrival routes by its own content hash
    * (exact-copy arrivals co-route). Stateless across batches (the
    * frozen-index seam; novel-vs-novel near-dups resolve at the next
    * index refresh — the d33/d49 cross-arrival contract), so drain
    * parity is immediate; emission inside the batchId guard. */
  def splitRouteStreaming(corpusIdx: graft.operators.Dedup.DedupIndex,
      corpusKeepers: DataFrame, arrivals: DataFrame, id: String,
      text: String, tau: Double = 0.5)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          sink(Dedup.splitRoute(corpusIdx, corpusKeepers, batch, id,
            text, tau).orderBy(col(id)))
        }
      }
      .start()
  }

  /** Streaming contamination router — d51, c110's live half: the four
    * train-side evidence artifacts (content-hash set, shingle index,
    * BM25 impact index, train embeddings) are FROZEN once
    * (Retrieval.contaminationIndex — each persists to parquet in
    * production), and every arriving batch probes all four legs with
    * only its OWN side computing (Retrieval.contaminationProbe):
    * the online eval-protection gate — verbatim / near-dup verdicts
    * + lexical/dense evidence per arrival, cost tracking the batch,
    * never the corpus. Stateless across batches (frozen artifacts),
    * so drain parity with the c110-shaped batch contract is
    * immediate; emission inside the batchId guard. */
  def contaminationRouteStreaming(idx: graft.operators.Retrieval.ContamIndex,
      arrivals: DataFrame, id: String, text: String,
      tau: Double = 0.5, dim: Int = 16)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Retrieval
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          sink(Retrieval.contaminationProbe(idx,
              batch.select(col(id).as("did"), col(text).as("t")),
              tau, dim)
            .orderBy(col("eval_id")))
        }
      }
      .start()
  }

  /** Streaming fold of the c107 KMV set-operation estimates — d48:
    * arriving batches' per-source distinct content hashes fold into
    * the running bottom-k-per-source state (d43's merge, the same
    * KMV synopsis), and every applied batch re-emits the FULL
    * pairwise union/intersection estimate matrix from the folded
    * states alone (Sampling.setOpsEstimate — ≤ |sources|·k rows in,
    * ≤ |sources|²/2 rows out, no corpus re-read): the live "which
    * sources are converging on the same content?" monitor — a mirror
    * site's est_inter climbs toward its est_union as the crawl
    * progresses. Batch contract = c107 minus the exact audit columns
    * (not mergeable from a k-row state, c95/d43's discipline); state
    * ≤ |sources| × k rows; gate-then-fold inside the batchId guard. */
  def kmvSetOpsStreaming(docs: DataFrame, source: String, text: String,
      k: Int = 64,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    import graft.operators.Sampling
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = batch
            .select(col(source).as("src"),
              TextOps.polyHashMixed(col(text)).as("h"))
            .distinct()
          val merged = state.map(_.unionByName(p)).getOrElse(p).distinct()
          val topk = graft.plans.TopKPerKey(merged, Seq(col("src")),
            Seq(col("h")), k, rankName = "rk")
            .select(col("src"), col("h")).barrier(true)
          state = Some(topk)
          lastApplied = bid
          stateProbe(state.get)
          sink(Sampling.setOpsEstimate(state.get, k)
            .orderBy(col("src_a"), col("src_b")))
        }
      }
      .start()
  }

  /** Streaming fold of c96's spectral health — d44: each arriving
    * batch's Gram sufficient statistics (n, per-dim sums m, the full
    * dims² Gram — all exact-integer sums under the FROZEN quant
    * scale, the d40 static-artifact seam) fold into the running
    * state by addition, and every applied batch re-emits the top
    * principal component power-iterated FROM THE STATE ONLY
    * (Ann.pcaFromState — never a corpus re-read, the d40/d42
    * artifact-only compute on the spectral side). z = n·G·v − m·(m·v)
    * is integer-identical to c96's matrix-free form, so the drained
    * stream equals the c96 batch output digit-for-digit whatever the
    * slicing. Cross-batch state = dims² (j, l, g, mj, n) rows,
    * compacted AT FOLD TIME by the groupBy; gate-then-fold inside the
    * batchId guard. The live "is the embedding collapsing?" monitor
    * an ingest pipeline runs next to d42's length drift. */
  def pcaFoldStreaming(scale: DataFrame, vecs: DataFrame,
      id: String, vec: String,
      stateProbe: DataFrame => Unit = _ => ())
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    vecs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = Ann.gramStats(batch, id, vec, scale)
          state = Some(state.map(_.unionByName(p)).getOrElse(p)
            .groupBy(col("j"), col("l"))
            .agg(sum(col("g")).cast("decimal(38,0)").as("g"),
              sum(col("mj")).cast("decimal(38,0)").as("mj"),
              sum(col("n")).cast("decimal(38,0)").as("n"))
            .barrier(true))
          lastApplied = bid
          stateProbe(state.get)
          sink(Ann.pcaFromState(state.get))
        }
      }
      .start()
  }

  /** Streaming perplexity router — d45, c99's live half: arriving
    * docs are scored against the FROZEN reference LM and labeled
    * head/middle/tail against the FROZEN tercile threshold bins
    * (CorpusStats.perplexityThresholds — the d13/d19 static-artifact
    * seam: the triage bands are learned once from the reference
    * corpus and cannot drift with the arrival mix, the online CCNet
    * shape). Per-batch audits FOLD by addition into the running
    * per-(source, label) counts (≤ |sources|·3 rows, compacted at
    * fold time), and every applied batch re-emits the cumulative
    * audit — drain parity with the batch contract is exact because
    * counts add, so slicing can never change a number. Gate-then-
    * fold inside the batchId guard. */
  def perplexityRouteStreaming(lm: graft.operators.CorpusStats.BigramLm,
      th: DataFrame, docs: DataFrame, id: String, text: String,
      source: String)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.CorpusStats
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = CorpusStats.perplexityRoute(lm, th, batch, id, text,
            source)
          state = Some(state.map(_.unionByName(p)).getOrElse(p)
            .groupBy(col(source), col("bucket_label"))
            .agg(sum(col("n_docs")).cast("long").as("n_docs"),
              sum(col("tokens")).cast("long").as("tokens"),
              sum(col("sum_bits_ppm")).cast("long").as("sum_bits_ppm"))
            .barrier(true))
          lastApplied = bid
          sink(state.get.orderBy(col(source), col("bucket_label")))
        }
      }
      .start()
  }

  /** Streaming Gopher rule gate — d46, c101's live half: every
    * arriving doc is flagged against the five word-level Gopher rules
    * (TextQuality.gopherFlags — per-row integer comparisons, no
    * trained artifact needed: the rules are constants, the simplest
    * static-seam case), and the per-(source, rule) fail counts +
    * kept doc/token mass FOLD by addition into the running
    * ≤ |sources|-row state, compacted at fold time. kept_ppm is a
    * ratio, so it is computed at EMISSION from the folded sums, never
    * folded itself (the d40/d42 discipline) — which is exactly why
    * drain parity with the c101 batch contract is exact under any
    * batch slicing. Gate-then-fold inside the batchId guard. */
  def gopherGateStreaming(docs: DataFrame, id: String, text: String,
      source: String, minTok: Long = 50L, maxTok: Long = 100000L)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.TextQuality
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var lastApplied = -1L
    docs.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          val p = TextQuality.gopherAuditRaw(
            TextQuality.gopherFlags(batch, id, text, source,
              minTok, maxTok), source)
          state = Some(state.map(_.unionByName(p)).getOrElse(p)
            .groupBy(col(source))
            .agg(sum(col("n_docs")).cast("long").as("n_docs"),
              sum(col("fail_len")).cast("long").as("fail_len"),
              sum(col("fail_wordlen")).cast("long").as("fail_wordlen"),
              sum(col("fail_symbol")).cast("long").as("fail_symbol"),
              sum(col("fail_alpha")).cast("long").as("fail_alpha"),
              sum(col("fail_stop")).cast("long").as("fail_stop"),
              sum(col("n_kept")).cast("long").as("n_kept"),
              sum(col("tokens_kept")).cast("long").as("tokens_kept"))
            .barrier(true))
          lastApplied = bid
          sink(TextQuality.gopherFinalize(state.get, source))
        }
      }
      .start()
  }

  /** Streaming print-index APPEND loop — d54, c114's live half (the
    * d41 discipline applied to the winnowing print index): batch b
    * is probed against the corpus print index ∪ every EARLIER
    * batch's prints (prefix semantics — a doc pasted twice across
    * arrivals hits the second time) via [[graft.operators.Dedup
    * .printGate]], then its own prints fold into the state — a pure
    * per-doc-row UNION, the in-memory flavor of c114's
    * appendToPrintIndexDir (prints are per-doc independent, so the
    * fold is an insert with nothing to merge). Emission = one row
    * per arriving doc (n_prints / n_hits / n_new); n_new is exactly
    * the rows the fold inserts, which is what makes gate-then-fold
    * self-auditing. Cross-batch state = the (did, h) print rows —
    * the index artifact itself; production checkpoints it with
    * appendToPrintIndexDir at the same cadence. Gate-then-fold
    * inside the batchId guard.
    *
    * State storage is INCREMENTAL (r13 ADVICE fix): prints are
    * per-doc independent, so each batch barriers only its OWN print
    * rows and the cumulative state stays a lazy union of those
    * bounded generations — the full corpus print set is never
    * re-materialized per batch. Every `compactEvery` batches the
    * union is compacted into one barrier and the superseded
    * generations' executor blocks are freed explicitly
    * ([[graft.util.Barriers.free]] — only frames THIS loop
    * barriered; the caller's idx0 is never touched), bounding both
    * the union's plan depth and the dead-block lag that previously
    * waited on ContextCleaner GC. */
  def printAppendStreaming(idx0: DataFrame, arrivals: DataFrame,
      id: String, text: String, kg: Int = 4, w: Int = 4,
      compactEvery: Int = 32)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.util.Barriers
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    // barrier generations owned by this loop (safe to free on compact)
    var gens: List[DataFrame] = Nil
    var sinceCompact = 0
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          val cur = state.getOrElse(idx0)
          val bp = Dedup.winnowingPrints(batch, id, text, kg, w)
            .barrier(true)
          sink(Dedup.printGateFromPrints(cur, bp, id).orderBy(col(id)))
          val grown = cur.unionByName(bp)
          sinceCompact += 1
          if (sinceCompact >= compactEvery) {
            val compacted = grown.barrier(true)
            (bp :: gens).foreach(Barriers.free)
            gens = List(compacted)
            sinceCompact = 0
            state = Some(compacted)
          } else {
            gens ::= bp
            state = Some(grown)
          }
        }
      }
      .start()
  }

  /** Live BM25 POSTINGS ingest — c116's streaming half (the d54
    * gate-then-fold discipline on the retrieval index): each arriving
    * doc's DISTINCT token set probes the known-token state (corpus
    * tokens ∪ every EARLIER batch's tokens — prefix semantics, so a
    * token coined by batch 1 is a HIT for batch 2) and emits one row
    * per doc (n_toks / n_hits / n_new — n_new is exactly the tokens
    * the fold inserts, i.e. the df-0→>0 rows whose idf an impact
    * refresh must create); then the batch's tokens fold into the
    * state as a pure insert (postings are per-doc independent — the
    * [[graft.operators.Retrieval.appendToPostingsIndexDir]] theorem
    * live). State storage is INCREMENTAL with periodic compaction +
    * explicit block frees, the printAppendStreaming shape exactly. */
  def postingsIngestStreaming(corpusToks0: DataFrame,
      arrivals: DataFrame, id: String, text: String,
      compactEvery: Int = 32)
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    import graft.util.Barriers
    import graft.util.Barriers.BarrierOps
    var state: Option[DataFrame] = None
    var gens: List[DataFrame] = Nil
    var sinceCompact = 0
    var lastApplied = -1L
    arrivals.writeStream.outputMode(OutputMode.Append)
      // emission-class: stateful
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (bid > lastApplied) {
          lastApplied = bid
          val known = state.getOrElse(corpusToks0)
          val dt = batch.select(col(id),
              explode(TextOps.tokens(col(text))).as("tok"))
            .where(col("tok") =!= "")
            .select(col(id), col("tok")).distinct()
            .barrier(true)
          val hits = dt
            .join(known.select(col("tok")), Seq("tok"), "left_semi")
            .groupBy(col(id)).agg(count(lit(1)).as("n_hits"))
          sink(dt.groupBy(col(id)).agg(count(lit(1)).as("n_toks"))
            .join(hits, Seq(id), "left")
            .select(col(id), col("n_toks"),
              coalesce(col("n_hits"), lit(0L)).as("n_hits"))
            .withColumn("n_new", col("n_toks") - col("n_hits"))
            .orderBy(col(id)))
          // fold: lazy union of this batch's token rows (duplicates
          // vs known are harmless — the probe is a semi-join)
          val grown = known.select(col("tok"))
            .unionByName(dt.select(col("tok")))
          sinceCompact += 1
          if (sinceCompact >= compactEvery) {
            val compacted = grown.distinct().barrier(true)
            (dt :: gens).foreach(Barriers.free)
            gens = List(compacted)
            sinceCompact = 0
            state = Some(compacted)
          } else {
            gens ::= dt
            state = Some(grown)
          }
        }
      }
      .start()
  }

  /** Streaming dedup: keep the first arrival per key within the
    * watermark (state = one entry per distinct key). */
  def dedupStreaming(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"),
        unix_micros(col("ts")).as("first_us"))
}
