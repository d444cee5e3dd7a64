package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization barriers for iterative algorithms (connected
  * components, PageRank, pointer-doubling walks, k-means, the LSH
  * two-step materializations).
  *
  * Default: `localCheckpoint` — blocks live on executors with NO
  * fault tolerance. That is the right call on local[N] (zero extra
  * I/O, one JVM, nothing to lose), but on a 1000-executor cluster a
  * single lost executor invalidates the blocks, and because the
  * barrier truncates lineage the job cannot recompute them: the run
  * dies mid-iteration.
  *
  * `spark.graft.checkpoint.reliable=true` switches every barrier to a
  * reliable `checkpoint` to the SparkContext checkpoint dir (HDFS/
  * object storage on a cluster — set it via
  * `spark.graft.checkpoint.dir` or `sc.setCheckpointDir`): executor
  * loss then costs a re-read, not the job. The flag changes only
  * WHERE the materialized blocks live, never their content — every
  * algorithm above is deterministic under both modes (spec-pinned in
  * BarrierSpec).
  */
object Barriers {

  /** Materialize `df` and truncate its lineage, to local executor
    * blocks (default) or to the reliable checkpoint dir (see above). */
  def barrier(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf
      .getOption("spark.graft.checkpoint.reliable").contains("true")
    if (!reliable) df.localCheckpoint(eager)
    else {
      if (s.sparkContext.getCheckpointDir.isEmpty) {
        val dir = s.conf.getOption("spark.graft.checkpoint.dir")
          .getOrElse(sys.props("java.io.tmpdir") + "/graft-checkpoints")
        s.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint(eager)
    }
  }

  /** Free the executor blocks behind a barriered frame, for callers
    * that hold LONG-LIVED barrier generations (the streaming
    * cumulative-state folds): once a new generation has materialized
    * eagerly, the previous generation's blocks are dead weight that
    * ContextCleaner only reclaims at GC pressure — on a long stream
    * that lag grows with corpus size. Best-effort and narrow: only
    * LogicalRDD leaves (what [[barrier]] produces) are unpersisted;
    * any other frame is left untouched. The freed frame must never
    * be scanned again — its lineage was truncated by the barrier, so
    * there is nothing to recompute from. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Suffix form: `df.barrier(true)` reads like the localCheckpoint
    * call it replaces. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(eager: Boolean = true): DataFrame =
      Barriers.barrier(df, eager)
  }
}
