package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed interval (range) join — "which intervals cover this point" —
  * the temporal-validity primitive behind snapshot enrichment,
  * session attribution, and slowly-changing-dimension lookup. Spark
  * plans a raw `t BETWEEN lo AND hi` join as a nested loop over the
  * key-matched pairs; this operator instead BINS the time axis:
  *
  *   - every interval [lo, hi) is exploded onto the fixed-width
  *     buckets it covers — `(hi - lo) / width + 2` rows, a small
  *     constant when `width` is chosen near the typical interval
  *     length;
  *   - every point lands in exactly one bucket;
  *   - the join is then a plain EQUI-join on (key, bucket) — shuffle
  *     hash/sort-merge, partition-parallel, AQE-splittable — with the
  *     exact `lo <= t < hi` predicate re-applied after the match.
  *
  * The bucket fan-out bounds the blow-up by construction (vs the
  * nested loop's |points| × |key's intervals|), and skew follows key
  * × time-bucket granularity rather than key alone — a hot key's
  * year of intervals spreads over that year's buckets. This is the
  * standard binned-interval-join shape (e.g. interval trees
  * flattened to grid bins in genomics' BEDTools/Spark ports and
  * Flink's window joins).
  */
object RangeJoin {

  /** Join `points` (carrying `pTime`, epoch-µs long) to the
    * `intervals` (carrying `[lo, hi)` epoch-µs longs) that cover
    * them, matching `pKey` = `iKey`. `widthUs` is the bucket width —
    * pick it near the typical interval length so intervals span a
    * handful of buckets. Emits one row per (point, covering
    * interval): all point columns, then all interval columns.
    * Half-open semantics: lo <= t < hi. */
  def intervalJoin(points: DataFrame, pKey: String, pTime: String,
                   intervals: DataFrame, iKey: String, lo: String,
                   hi: String, widthUs: Long): DataFrame = {
    val iCols = intervals.columns.toIndexedSeq
    // [lo, hi) covers buckets floor(lo/W) .. floor((hi-1)/W); hi > lo
    // is required for a non-empty interval and guards the sequence
    val binned = intervals
      .where(col(hi) > col(lo))
      .withColumn("__b", explode(sequence(
        expr(s"$lo div $widthUs"), expr(s"($hi - 1) div $widthUs"))))
    val bp = points.withColumn("__b", expr(s"$pTime div $widthUs"))
    bp.join(binned, bp(pKey) === binned(iKey)
        && bp("__b") === binned("__b")
        && bp(pTime) >= binned(lo) && bp(pTime) < binned(hi))
      .drop("__b")
  }
}
