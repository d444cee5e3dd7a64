package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Exact-dedup survivors: keep the min-id row per content
    * fingerprint WITHOUT a WindowExec on the fingerprint. The
    * map-side-combinable groupBy collapses each fingerprint to one
    * (keeper, size) row BEFORE the shuffle, and the join-back build
    * side is filtered to DUPLICATED fingerprints only — tiny on real
    * corpora, so AQE broadcasts it. A viral duplicate (one document
    * pasted a million times) costs one combined row per map task
    * here, where `min(id) over Window.partitionBy(hash)` would sort
    * the whole cluster inside a single task — the skew class that
    * killed c57/c78/c85 before the round-10 reshape. */
  private[graft] def exactSurvivors(df: DataFrame, id: String,
                                    text: String): DataFrame = {
    val fp = df.withColumn("ex_fp", TextOps.polyHash(col(text)))
    val dups = fp.groupBy(col("ex_fp"))
      .agg(min(col(id)).as("ex_keeper"), count(lit(1)).as("ex_n"))
      .where(col("ex_n") > 1L)
      .select(col("ex_fp"), col("ex_keeper"))
    fp.join(dups, Seq("ex_fp"), "left")
      .where(col("ex_keeper").isNull || col(id) === col("ex_keeper"))
      .drop("ex_fp", "ex_keeper")
  }

  /** @param maxDup3gram repetition gate ([[TextQuality.repetitionSignals]]):
    *   docs whose duplicate-3-gram fraction exceeds it are dropped
    *   alongside the quality gate (both are per-row, the same map
    *   stage). Default 1.0 = gate off. */
  def curate(docs: DataFrame, id: String, text: String,
             minQuality: Double, tau: Double,
             maxDup3gram: Double = 1.0): DataFrame = {
    val q = TextQuality.qualityFeatures(docs, id, text)
      .select(col(id), col("n_tokens"), col("quality"))
    // the repetition gate composes as a semi join on the staged
    // signals frame (per-row work stays in repetitionSignals' staged
    // shape — see its scaladoc on lambda re-evaluation); default-off
    // costs nothing.
    val qualityGated = docs.select(col(id), col(text))
      .join(q, id)
      .where(col("quality") >= minQuality)
    val surv =
      if (maxDup3gram < 1.0)
        qualityGated.join(
          TextQuality.repetitionSignals(docs, id, text)
            .where(col("dup_3gram_ratio") <= maxDup3gram)
            .select(col(id)),
          Seq(id), "left_semi")
      else qualityGated
    // exact dedup: keeper = min id per content fingerprint, in the
    // skew-safe groupBy + dup-filtered join-back shape (no WindowExec)
    val ex = exactSurvivors(surv, id, text)
    // near-dup dedup on the exact-deduped survivors
    val dropped = Dedup.deduplicate(ex, id, text, tau)
      .where(col(id) =!= col("keeper"))
      .select(col(id))
    ex.join(dropped, Seq(id), "left_anti")
      .select(col(id), col("n_tokens"), col("quality"))
  }

  /** The curation FUNNEL — per-stage survivor counts and token mass
    * of [[curate]]'s pipeline (raw → quality gate → exact dedup →
    * near-dup dedup): the ops report every curation run ships, and
    * the number a pipeline owner actually watches (a gate that
    * suddenly drops 40% of a source is an incident, not a setting).
    * One row per stage with doc/token totals; stage frames share the
    * barriered per-doc feature table, so the funnel costs the same
    * stages the pipeline itself runs plus four one-row aggregates. */
  def funnel(docs: DataFrame, id: String, text: String,
             minQuality: Double, tau: Double): DataFrame = {
    import graft.util.Barriers.BarrierOps
    val q = TextQuality.qualityFeatures(docs, id, text)
      .select(col(id), col("n_tokens"), col("quality"))
      .barrier(true) // read by the gate and all four stage counts
    val gated = docs.select(col(id), col(text))
      .join(q.where(col("quality") >= minQuality).select(col(id)),
        Seq(id), "left_semi")
    val ex = exactSurvivors(gated, id, text)
      .barrier(true) // read by the near-dup stage and its own count
    val dropped = Dedup.deduplicate(ex, id, text, tau)
      .where(col(id) =!= col("keeper"))
      .select(col(id))
    val near = ex.join(dropped, Seq(id), "left_anti")
    def stage(n: Long, name: String, df: DataFrame) =
      df.select(col(id)).join(q, Seq(id))
        .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("nt"))
        .select(lit(n).as("stage"), lit(name).as("stage_name"),
          col("nd").cast("long").as("n_docs"),
          coalesce(col("nt"), lit(0L)).cast("long").as("n_tokens"))
    stage(0L, "raw", docs)
      .unionAll(stage(1L, "quality_gate", gated))
      .unionAll(stage(2L, "exact_dedup", ex))
      .unionAll(stage(3L, "neardup_dedup", near))
      .orderBy(col("stage"))
  }
}
