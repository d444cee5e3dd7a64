package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic stratified sampling for corpus rebalancing (e.g.
  * downsampling an over-represented language before training).
  *
  * Mechanism: each row hashes its (stratum, id) pair into one of `mod`
  * buckets with the portable polynomial hash; the row is kept iff its
  * bucket falls below the stratum's quota. Properties that matter at
  * 100 TB:
  *
  *   - map-only: the quota table is a driver-side Map folded into a
  *     codegen'd CASE chain — no join, no shuffle, no sampleBy (whose
  *     Bernoulli draw is seed/partitioning-dependent);
  *   - deterministic & stable: the same row is kept in every run and
  *     on every cluster layout, so samples are reproducible and
  *     incremental re-runs agree with full runs;
  *   - exact-rate in expectation with hash-uniformity, and
  *     oracle-checkable row-by-row (the DuckDB mirror recomputes the
  *     same hash).
  */
object Sampling {

  /** Keep rows whose hash bucket (over `mod`) is below their stratum's
    * quota; strata absent from `quotas` default to quota 0 (dropped).
    * Adds the `bucket` column for auditability. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       quotas: Map[String, Int], mod: Int = 100): DataFrame = {
    val bucket = pmod(
      TextOps.polyHash(concat(stratum, lit(":"), id.cast("string"))),
      lit(mod.toLong))
    val quota = quotas.foldLeft(lit(0)) {
      case (acc, (s, q)) => when(stratum === s, lit(q)).otherwise(acc)
    }
    df.withColumn("bucket", bucket).where(col("bucket") < quota)
  }

  /** DuckDB mirror of the bucket computation. */
  def bucketSql(stratum: String, id: String, mod: Int = 100): String =
    s"(${TextOps.polyHashSql(s"($stratum || ':' || CAST($id AS VARCHAR))")}) % $mod"

  def quotaSql(stratum: String, quotas: Map[String, Int]): String =
    quotas.foldLeft("0") {
      case (acc, (s, q)) => s"CASE WHEN $stratum = '$s' THEN $q ELSE $acc END"
    }
}
