package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-stage aggregation. A hot grouping key
  * that would funnel into one reducer is split across `salts` partial
  * groups, partially aggregated, then re-aggregated per key — the hot
  * key's work spreads over `salts` tasks. Because the partial sums are
  * decimal-exact, the result is bit-identical to the direct
  * aggregation no matter how rows land in salt buckets.
  * (AQE's skew-join handling covers joins; this covers aggregation.)
  */
object Skew {

  /** sum(value as decimal(25,6)) + count per key, computed via salted
    * partials. Output: key, sum_value (double), n (long). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(value.cast("decimal(25,6)")).as("_psum"),
        count(lit(1)).as("_pn"))
      .groupBy(col("key"))
      .agg(sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pn")).as("n"))
}
