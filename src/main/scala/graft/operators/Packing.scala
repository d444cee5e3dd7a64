package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Training-sequence packing — the "concatenate the corpus and chop
  * it into fixed-token-budget sequences" pass that assembles
  * pretraining batches (each document starts at its global token
  * offset; a document whose span crosses a budget boundary is
  * flagged for the loader to split). The core is a GLOBAL exclusive
  * prefix sum of token counts in document order, which a naive
  * `Window.orderBy(id)` computes on ONE partition — the classic
  * scale trap. Here it is the standard two-level distributed scan:
  *
  *   1. documents bucket by `id div bucketWidth` (id-order
  *      preserving);
  *   2. within each bucket, a PARTITIONED window computes the local
  *      exclusive prefix — parallel across buckets;
  *   3. bucket token totals (one row per bucket, |docs|/bucketWidth
  *      rows) prefix-scan on a single partition — fine for millions
  *      of buckets; add a third level before it ever isn't;
  *   4. global offset = bucket prefix + local prefix, broadcast-
  *      joined back on bucket id.
  *
  * Everything is integer (token counts sum exactly in any order), so
  * the result is bit-identical to the oracle's one-window phrasing.
  */
object Packing {

  /** Global token offset, sequence id and in-sequence position for
    * every document: `budget`-token sequences over the id-ordered
    * concatenation. Output: (id, n_tokens, offset, seq_id, seq_pos,
    * crosses — 1 when the document straddles a sequence boundary and
    * the loader must split it). Token count = whitespace tokens
    * (c10's ws_tokens contract). */
  def packOffsets(docs: DataFrame, id: String, text: String,
                  budget: Long, bucketWidth: Long = 4096L): DataFrame = {
    val toks = docs.select(col(id),
      size(TextOps.tokens(col(text))).cast("long").as("n_tokens"))
    val bucketed = toks.withColumn("__bkt", expr(s"$id div $bucketWidth"))
    val wLocal = Window.partitionBy(col("__bkt")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local",
      sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
    val wBkt = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bktPrefix = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__before", sum(col("__tot")).over(wBkt) - col("__tot"))
      .select(col("__bkt"), col("__before"))
    local.join(broadcast(bktPrefix), "__bkt")
      .withColumn("offset", col("__before") + col("__local"))
      .withColumn("seq_id", expr(s"offset div $budget"))
      .withColumn("seq_pos", expr(s"offset % $budget"))
      .withColumn("crosses",
        (expr(s"(offset + n_tokens - 1) div $budget") =!= col("seq_id"))
          .cast("long"))
      .select(col(id), col("n_tokens"), col("offset"), col("seq_id"),
        col("seq_pos"), col("crosses"))
  }
}
