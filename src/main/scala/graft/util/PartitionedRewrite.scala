package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.util.Barriers.BarrierOps

/** The c81 `migrateIndexDir` partition-rewrite seam, generalized:
  * physically remove rows from a directory-partitioned parquet
  * artifact, rewriting ONLY the partitions that contain a removed
  * row. This is the takedown/opt-out write path every persisted
  * artifact needs at 100 TB — a delete list of a few thousand ids
  * must cost a few partition rewrites, never a full artifact rebuild.
  *
  * Mechanics (all shared with migrateIndexDir): the survivors of the
  * touched partitions are materialized (localCheckpoint barrier)
  * BEFORE the overwrite so the rewrite never lazily reads the files
  * it is replacing; dynamic partition overwrite leaves untouched
  * partitions' files byte-identical; and if any touched partition
  * DRAINS completely (every row deleted), dynamic overwrite cannot
  * truncate a partition it writes no rows into, so the apply falls
  * back to one full rewrite — the drained probe is a control-flow
  * action on the touched-partition keys, never corpus-sized data. */
object PartitionedRewrite {

  /** Delete all rows of `dir` whose `keyCol` appears in `deleteKeys`
    * (a one-column frame named `keyCol`), preserving the artifact's
    * `partCols` directory layout. */
  def deleteRows(s: SparkSession, dir: String, keyCol: String,
                 deleteKeys: DataFrame, partCols: Seq[String]): Unit = {
    val del = deleteKeys.select(col(keyCol)).distinct().barrier(true)
    val t = s.read.parquet(dir)
    val pc = partCols.map(col)
    val dataCols = t.columns.filterNot(partCols.contains).map(col)
    val touched = t.join(del, Seq(keyCol), "left_semi")
      .select(pc: _*).distinct().barrier(true)
    val surv = t.join(touched, partCols, "left_semi")
      .join(del, Seq(keyCol), "left_anti")
      .select(dataCols ++ pc: _*).barrier(true)
    val drained = touched
      .join(surv.select(pc: _*).distinct(), partCols, "left_anti")
    if (drained.isEmpty) {
      surv.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*).parquet(dir)
    } else {
      t.join(del, Seq(keyCol), "left_anti")
        .select(dataCols ++ pc: _*).barrier(true)
        .write.mode("overwrite").partitionBy(partCols: _*).parquet(dir)
    }
  }
}
