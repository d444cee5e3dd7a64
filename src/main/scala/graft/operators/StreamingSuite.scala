package graft.operators

import org.apache.spark.sql.functions._
import graft.api.{Q, Suite}
import graft.model.Tables
import graft.streaming.Streams

/** D-suite: streaming semantics verified through batch parity — the
  * exact transformations the streaming specs drive through
  * MemoryStream (see StreamsSpec), run here over the events table so
  * the DuckDB oracle can replay them.
  */
object StreamingSuite extends Suite {

  val d1 = Q(
    "d1_stream_window",
    (s, d) => Streams.windowCounts(Tables.events(s, d))
      .orderBy(col("hour_bucket"), col("event_type")),
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_bucket, event_type"""))

  val d2 = Q(
    "d2_sessionize",
    (s, d) => Streams.sessionize(Tables.events(s, d), gapUs = 1800000000L)
      .toDF()
      .orderBy(col("user_id"), col("session_idx")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      l AS (
        SELECT *, LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS prev FROM e),
      f AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                       THEN 1 ELSE 0 END AS brk FROM l),
      s AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess FROM f)
      SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
             COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us,
             MAX(us) - MIN(us) AS dur_us
      FROM s
      GROUP BY user_id, sess
      ORDER BY user_id, session_idx"""))

  val d3 = Q(
    "d3_stream_dedup",
    (s, d) => Streams.firstPerKey(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type")),
    Some("""
      SELECT user_id, event_type, first_event_id, first_us FROM (
        SELECT user_id, event_type, event_id AS first_event_id,
               epoch_us(ts) AS first_us,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts), event_id) AS rk
        FROM events) t
      WHERE rk = 1
      ORDER BY user_id, event_type"""))

  override val queries: Seq[Q] = Seq(d1, d2, d3)
}
