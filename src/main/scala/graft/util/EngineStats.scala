package graft.util

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** The engine-usage counter surface — graft's analogue of the
  * reference's `mie_meta` server counters (kraklabs/mie CHANGELOG
  * 0.1.2: total queries / stores + last-activity timestamps bumped
  * per MCP call). A Spark library has no server loop to count, so
  * the counters hang off the session's own QueryExecutionListener:
  * every materialized action counts as a query, every data-writing
  * command (save/insert/create) as a store, failures separately,
  * with last-activity and total execution time alongside.
  *
  * Driver-side AtomicLongs — this is session telemetry about the
  * PROCESS (SURVEY §1), deliberately not a distributed query; the
  * one-row snapshot() DataFrame exists so dashboards can union it
  * with real query output.
  */
object EngineStats {

  final class Counters extends QueryExecutionListener {
    val queries = new AtomicLong(0L)
    val stores = new AtomicLong(0L)
    val failures = new AtomicLong(0L)
    val totalNs = new AtomicLong(0L)
    val lastActivityMs = new AtomicLong(0L)

    private val storeFuncs =
      Set("save", "saveAsTable", "insertInto", "command")

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      queries.incrementAndGet()
      if (storeFuncs.contains(funcName)) stores.incrementAndGet()
      totalNs.addAndGet(durationNs)
      lastActivityMs.set(System.currentTimeMillis())
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = {
      failures.incrementAndGet()
      lastActivityMs.set(System.currentTimeMillis())
    }
  }

  // WEAK keys (r13 ADVICE fix): the map must not pin sessions — a
  // long-lived process creating many sessions would otherwise keep
  // every stopped session (and its Counters) reachable forever. The
  // session itself holds the registered listener, so a live session
  // keeps its Counters; once the session is unreachable the entry is
  // collectable (Counters never references the session back).
  private val installed =
    new java.util.WeakHashMap[SparkSession, Counters]()

  /** Idempotent per-session install; returns the session's counters. */
  def install(s: SparkSession): Counters = installed.synchronized {
    val cur = installed.get(s)
    if (cur != null) cur
    else {
      val c = new Counters
      installed.put(s, c)
      s.listenerManager.register(c)
      c
    }
  }

  /** One-row usage snapshot: n_queries / n_stores / n_failures /
    * busy_ms / last_activity_ms (0 before any activity). */
  def snapshot(s: SparkSession): DataFrame = {
    val c = install(s)
    import s.implicits._
    Seq((c.queries.get(), c.stores.get(), c.failures.get(),
        c.totalNs.get() / 1000000L, c.lastActivityMs.get()))
      .toDF("n_queries", "n_stores", "n_failures", "busy_ms",
        "last_activity_ms")
  }
}
