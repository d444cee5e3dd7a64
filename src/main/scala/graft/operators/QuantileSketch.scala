package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic MERGEABLE quantile sketch over non-negative longs —
  * the bounded-state replacement for c38's exact histogram when the
  * value domain is NOT bounded (counts, ppm scores, byte sizes): the
  * state is one (bucket, n) row per occupied log-bucket, ≤ 4·62+4
  * rows total for the full long range, so it folds across shards,
  * days, or stream micro-batches the way d9/d11's HLL/CMS states do
  * (counts add; merge = groupBy(bucket).sum — set-aggregate
  * semantics, batch slicing can never change a number).
  *
  * Bucketing is HDR-histogram-style, computed ONLY with integer
  * arithmetic (bitlength via `length(bin(v))` and integer shifts —
  * no float log anywhere, §4, so Spark and DuckDB agree bit-for-bit):
  *
  *   - v < 4:  bucket = v (exact singletons);
  *   - v ≥ 4:  octave o = bitlength(v) ≥ 3, two significand bits s =
  *     (v >> (o-3)) - 4 ∈ [0,3], bucket = 4·(o-2) + s.
  *
  * Bucket index is monotone in v and invertible to bounds
  * lo = (4+s) << (o-3), hi = lo + 2^(o-3) - 1, so the nearest-rank
  * quantile read off the cumulative bucket counts is exact to one
  * sub-bucket: relative error ≤ 1/(4+s) ≤ 25%, vs a full octave (2×)
  * for plain bitlength buckets.
  *
  * Unlike KLL/t-digest the sketch involves no sampling, no compaction
  * order and no float centroids — the state for a dataset is a pure
  * function of its multiset of values, which is what makes the DuckDB
  * oracle reproduce it bit-for-bit and the merge spec-pinnable
  * (sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly).
  */
object QuantileSketch {

  /** The HDR bucket index of the materialized `__v` column. */
  private def bucketCol: org.apache.spark.sql.Column =
    when(col("__v") < 4L, col("__v"))
      .otherwise(expr(
        "4 * (length(bin(__v)) - 2) + " +
          "(shiftright(__v, cast(length(bin(__v)) - 3 AS int)) - 4)")
        .cast("long"))

  /** The sketch STATE: one (bucket, n) row per occupied bucket.
    * `value` must be a non-negative integral column. */
  def sketch(df: DataFrame, value: String): DataFrame =
    df.select(col(value).cast("long").as("__v"))
      .withColumn("bucket", bucketCol)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Per-group sketch states: one (key, bucket, n) row per group ×
    * occupied bucket — the sharded form whose per-key states merge
    * into [[sketch]]'s global state by summing counts. */
  def sketchBy(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value).cast("long").as("__v"))
      .withColumn("bucket", bucketCol)
      .groupBy(col(key), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** KS-style drift per group, computed ONLY from sketch states —
    * the artifact-vs-artifact distribution compare: each group's
    * cumulative bucket distribution against the merged corpus blend
    * (which IS the fold of the per-group states — mergeability is
    * what makes this free), distance = max over buckets of
    * |cum_g·1e6 div n_g − cum_all·1e6 div n_all| in ppm. Everything
    * downstream of the one [[sketchBy]] pass is |groups| × ≤252-row
    * arithmetic; the cumsum windows run over that bounded grid
    * (SURVEY §8l histogram class), never over corpus rows. */
  def ksDrift(df: DataFrame, key: String, value: String): DataFrame = {
    import graft.util.Barriers.BarrierOps
    // one corpus pass: the blend, the per-group totals and the grid
    // all derive from the materialized per-group states (without the
    // barrier each branch would re-run the corpus scan)
    ksDriftFromState(sketchBy(df, key, value).barrier(true), key)
  }

  /** [[ksDrift]] computed from an already-materialized per-group
    * state frame (key, bucket, n) — the form a streaming monitor
    * calls on its folded partials (d42), and the reason the compare
    * is free on persisted artifacts: no raw data is touched. `per`
    * MUST be materialized (barriered state); four branches read it. */
  def ksDriftFromState(per: DataFrame, key: String): DataFrame = {
    val all = per.groupBy(col("bucket"))
      .agg(sum(col("n")).cast("long").as("n_all"))
    val totAll = all.agg(sum(col("n_all")).cast("long").as("tot_all"))
    val tot = per.groupBy(col(key))
      .agg(sum(col("n")).cast("long").as("tot_g"))
    val wAll = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allCum = all.withColumn("cum_all",
      sum(col("n_all")).over(wAll).cast("long"))
    val grid = per.select(col(key)).distinct()
      .crossJoin(all.select(col("bucket")))
    val wG = Window.partitionBy(col(key)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(per, Seq(key, "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum_g", sum(col("n")).over(wG).cast("long"))
      .join(allCum.select(col("bucket"), col("cum_all")), Seq("bucket"))
      .join(tot, Seq(key))
      .crossJoin(broadcast(totAll))
      .withColumn("d",
        abs(expr("cum_g * 1000000 div tot_g") -
          expr("cum_all * 1000000 div tot_all")).cast("long"))
      .groupBy(col(key))
      .agg(max(col("tot_g")).cast("long").as("n_docs"),
        max(col("d")).cast("long").as("ks_ppm"))
      .orderBy(col(key))
  }

  /** DuckDB mirror of [[ksDrift]] over `rel`, grouping by `key`,
    * sketching the BIGINT expression `valueSql`. */
  def ksDriftSql(rel: String, key: String, valueSql: String): String =
    s"""
      WITH vals AS (SELECT $key AS k, CAST($valueSql AS BIGINT) AS v
                    FROM $rel),
      b AS (
        SELECT k, CASE WHEN v < 4 THEN v
               ELSE 4 * (length(bin(v)) - 2) + ((v >> (length(bin(v)) - 3)) - 4)
               END AS bucket
        FROM vals),
      per AS (SELECT k, bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM b GROUP BY 1, 2),
      allb AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_all
               FROM per GROUP BY 1),
      totall AS (SELECT CAST(SUM(n_all) AS BIGINT) AS tot_all FROM allb),
      tot AS (SELECT k, CAST(SUM(n) AS BIGINT) AS tot_g
              FROM per GROUP BY 1),
      allcum AS (SELECT bucket,
                   CAST(SUM(n_all) OVER (ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_all
                 FROM allb),
      grid AS (SELECT k, bucket
               FROM (SELECT DISTINCT k FROM per), (SELECT bucket FROM allb)),
      g AS (
        SELECT grid.k, grid.bucket, coalesce(per.n, 0) AS n
        FROM grid LEFT JOIN per
          ON grid.k = per.k AND grid.bucket = per.bucket),
      cums AS (
        SELECT k, bucket,
               CAST(SUM(n) OVER (PARTITION BY k ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g
        FROM g)
      SELECT c.k AS $key,
             CAST(MAX(t.tot_g) AS BIGINT) AS n_docs,
             CAST(MAX(ABS(c.cum_g * 1000000 // t.tot_g
                 - a.cum_all * 1000000 // tt.tot_all)) AS BIGINT)
               AS ks_ppm
      FROM cums c
        JOIN allcum a ON c.bucket = a.bucket
        JOIN tot t ON c.k = t.k
        CROSS JOIN totall tt
      GROUP BY 1
      ORDER BY $key"""

  /** Fold sketch states: counts add per bucket. Associative and
    * commutative — the streaming/sharded merge. */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).cast("long").as("n"))

  /** Presentation over a state: bucket value bounds, cumulative
    * counts, and a 0/1 mark per requested quantile on the bucket
    * where the nearest rank ceil(ppm·N/1e6) lands. The window is
    * over the ≤252-row bucket table — bounded by construction, never
    * corpus-scale (SURVEY §8l). */
  def quantiles(state: DataFrame,
                marks: Seq[(String, Long)]): DataFrame = {
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = state.agg(sum(col("n")).cast("long").as("tot"))
    val cum = state
      .withColumn("lo",
        when(col("bucket") < 4L, col("bucket"))
          .otherwise(expr(
            "shiftleft(4 + bucket % 4, cast(bucket div 4 - 1 AS int))")
            .cast("long")))
      .withColumn("hi",
        when(col("bucket") < 4L, col("bucket"))
          .otherwise(col("lo") - 1L +
            // 1 must be BIGINT (an int literal shifts mod 32), and
            // the -1 rides BEFORE the add: lo + width overflows at
            // the top bucket, whose hi IS Long.MaxValue
            expr("shiftleft(cast(1 AS bigint), cast(bucket div 4 - 1 AS int))")
              .cast("long")))
      .withColumn("cum", sum(col("n")).over(w).cast("long"))
      .crossJoin(broadcast(tot))
    marks.foldLeft(cum) { case (d, (name, ppm)) =>
      d.withColumn(name,
        (col("cum") >= expr(s"($ppm * tot + 999999) div 1000000") &&
          col("cum") - col("n") <
            expr(s"($ppm * tot + 999999) div 1000000"))
          .cast("long"))
    }.select(Seq(col("bucket"), col("lo"), col("hi"), col("n"),
        col("cum")) ++ marks.map { case (name, _) => col(name) }: _*)
      .orderBy(col("bucket"))
  }

  /** DuckDB mirror of [[sketch]] + [[quantiles]] over a one-column
    * CTE `vals(v)`: emits the CTE tail + final SELECT. */
  def quantilesSql(marks: Seq[(String, Long)]): String = {
    val markCols = marks.map { case (name, ppm) =>
      s"""CAST(CASE WHEN cum >= ($ppm * tot + 999999) // 1000000
         AND cum - n < ($ppm * tot + 999999) // 1000000
         THEN 1 ELSE 0 END AS BIGINT) AS $name"""
    }.mkString(",\n             ")
    s"""
      b AS (
        SELECT CASE WHEN v < 4 THEN v
               ELSE 4 * (length(bin(v)) - 2) + ((v >> (length(bin(v)) - 3)) - 4)
               END AS bucket
        FROM vals),
      st AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
             FROM b GROUP BY 1),
      cum AS (
        SELECT bucket, n,
               CAST(CASE WHEN bucket < 4 THEN bucket
                 ELSE (4 + bucket % 4) << (bucket // 4 - 1)
                 END AS BIGINT) AS lo,
               CAST(CASE WHEN bucket < 4 THEN bucket
                 ELSE ((4 + bucket % 4) << (bucket // 4 - 1)) - 1
                   + (CAST(1 AS BIGINT) << (bucket // 4 - 1))
                 END AS BIGINT) AS hi,
               CAST(SUM(n) OVER (ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(n) OVER () AS BIGINT) AS tot
        FROM st)
      SELECT bucket, lo, hi, n, cum,
             $markCols
      FROM cum
      ORDER BY bucket"""
  }
}
