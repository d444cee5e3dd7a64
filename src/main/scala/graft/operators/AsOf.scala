package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prior-as-of join ("for each left row, the latest right
  * row at or before it") — the time-series primitive behind
  * dimension-snapshot lookup, feature backfill at training time, and
  * point-in-time-correct joins generally. Spark has no native ASOF
  * join, and the naive formulation (inequality theta-join + per-row
  * argmax) materializes every (left, prior-right) pair — quadratic in
  * the per-key history. This is instead the canonical union-merge
  * shape (the distributed analogue of pandas' merge_asof single
  * sorted sweep):
  *
  *   1. tag right rows 0 / left rows 2, union them into one relation,
  *   2. hash-partition by key, sort within partitions by
  *      (ts, tag, seq),
  *   3. running `last(payload, ignoreNulls)` over the ordered frame:
  *      each left row sees exactly the latest right payload at or
  *      before its timestamp,
  *   4. keep the left rows.
  *
  * ONE shuffle of |left| + |right| rows and one in-partition sort —
  * linear, no pair blow-up, AQE-splittable except for single hot keys
  * (a key's history must be sort-adjacent; at 100 TB the usual
  * mitigation is range-bucketing the time axis per key, which
  * composes with this operator unchanged). Right rows at the left
  * row's exact timestamp DO match (tag 0 sorts before tag 2:
  * inclusive <=); right-side ties on ts resolve to the highest `seq`
  * (the frame's last row), giving a total order the SQL oracle
  * mirrors with ROW_NUMBER() OVER (ORDER BY ts DESC, seq DESC).
  * Left rows with no prior right row keep NULL right columns
  * (LEFT-outer as-of).
  */
object AsOf {

  /** Prior-as-of join `left` to `right`. `lTs`/`rTs` must be directly
    * comparable (use epoch-microsecond longs for engine-exactness —
    * SURVEY.md §4); `lSeq`/`rSeq` break ties deterministically within
    * an equal (key, ts). Output: every left column, then every right
    * column (NULL when the key has no right row at or before `lTs`).
    */
  def joinPrior(left: DataFrame, lKey: String, lTs: String, lSeq: String,
                right: DataFrame, rKey: String, rTs: String,
                rSeq: String): DataFrame = {
    val lPay = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPay = struct(right.columns.map(col).toIndexedSeq: _*)
    val rTagged = right.select(col(rKey).as("__k"), col(rTs).as("__t"),
      lit(0).as("__tag"), col(rSeq).as("__seq"), rPay.as("__r"))
    val lTagged = left.select(col(lKey).as("__k"), col(lTs).as("__t"),
      lit(2).as("__tag"), col(lSeq).as("__seq"),
      lit(null).cast(rTagged.schema("__r").dataType).as("__r"),
      lPay.as("__l"))
    val unioned = rTagged
      .unionByName(lTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 2)
      .select(col("__l.*") +: right.columns.toIndexedSeq
        .map(c => col(s"__m.$c").as(c)): _*)
  }
}
