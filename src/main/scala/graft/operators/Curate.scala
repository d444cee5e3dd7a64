package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** The end-to-end corpus-curation operator a training-data pipeline
  * actually runs: quality gate → exact dedup → near-dup dedup →
  * annotated survivors. Composes the per-stage operators
  * ([[TextQuality]], [[Dedup]]) in their scale shapes:
  *
  *   1. quality gate — per-row codegen'd features, no shuffle;
  *   2. exact dedup — keeper = min id per content fingerprint, one
  *      hash shuffle on the 64-bit fingerprint;
  *   3. near-dup dedup — MinHash-LSH candidates → exact-Jaccard
  *      verify → distributed CC (see [[Dedup.deduplicate]]);
  *   4. survivors carry (n_tokens, quality) for downstream token
  *      budgeting.
  *
  * At 100 TB every stage is either per-row or an equi-join on hash
  * keys; nothing is quadratic and nothing collects to the driver.
  */
object Curate {

  /** @param maxDup3gram repetition gate ([[TextQuality.repetitionSignals]]):
    *   docs whose duplicate-3-gram fraction exceeds it are dropped
    *   alongside the quality gate (both are per-row, the same map
    *   stage). Default 1.0 = gate off. */
  def curate(docs: DataFrame, id: String, text: String,
             minQuality: Double, tau: Double,
             maxDup3gram: Double = 1.0): DataFrame = {
    val q = TextQuality.qualityFeatures(docs, id, text)
      .select(col(id), col("n_tokens"), col("quality"))
    // the repetition gate is a pure expression predicate — it rides
    // the same per-row map stage as the quality features, no join
    val surv = docs.select(col(id), col(text))
      .join(q, id)
      .where(col("quality") >= minQuality &&
        TextQuality.dupNgramRatio(col(text), 3) <= maxDup3gram)
    // exact dedup: the window partitions on the content fingerprint
    // (a 64-bit hash — cheap shuffle key), keeper = min id
    val ex = surv
      .withColumn("ex_keeper",
        min(col(id)).over(Window.partitionBy(TextOps.polyHash(col(text)))))
      .where(col(id) === col("ex_keeper"))
      .drop("ex_keeper")
    // near-dup dedup on the exact-deduped survivors
    val dropped = Dedup.deduplicate(ex, id, text, tau)
      .where(col(id) =!= col("keeper"))
      .select(col(id))
    ex.join(dropped, Seq(id), "left_anti")
      .select(col(id), col("n_tokens"), col("quality"))
  }
}
