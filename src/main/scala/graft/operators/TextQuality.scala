package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Text analysis for training-data curation: language ID, quality
  * scoring, token counting, fingerprinting. All per-row expression
  * work — embarrassingly parallel, no shuffle, fully codegen'd.
  */
object TextQuality {

  /** Stopword/marker sets per language. Deliberately tiny: this is the
    * n-gram-heuristic family (fast, no model); on the synthetic corpus
    * the vocab is shared across langs so accuracy is near-chance — the
    * `is_match` column surfaces exactly that. */
  val enMarkers: Seq[String] = Seq("the", "a", "is", "of")

  /** Language ID heuristic: 'en' iff any en marker token occurs. */
  def langId(text: Column): Column =
    when(size(array_intersect(array_distinct(TextOps.tokens(text)),
      array(enMarkers.map(lit): _*))) > 0, "en").otherwise(lit("unknown"))

  def langIdSql(t: String): String = {
    val lst = enMarkers.map(w => s"'$w'").mkString(", ")
    s"""CASE WHEN len(list_intersect(list_distinct(${TextOps.tokensSql(t)}),
        [$lst])) > 0 THEN 'en' ELSE 'unknown' END"""
  }

  /** Quality features + composite score per document. */
  def qualityFeatures(docs: DataFrame, id: String, text: String): DataFrame = {
    val tk = TextOps.tokens(col(text))
    val nTok = size(tk).cast("long")
    val nDis = size(array_distinct(tk)).cast("long")
    val nStop = size(filter(tk, t => t.isin(enMarkers: _*))).cast("long")
    val repeatRatio = lit(1.0) - nDis.cast("double") / nTok.cast("double")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val lenScore = least(nTok.cast("double") / 100.0, lit(1.0))
    docs.select(
      col(id),
      nTok.as("n_tokens"),
      nDis.as("n_distinct"),
      nStop.as("n_stopwords"),
      round(repeatRatio, 6).as("repeat_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(lit(0.4) * (lit(1.0) - repeatRatio)
        + lit(0.3) * (lit(1.0) - stopRatio)
        + lit(0.3) * lenScore, 6).as("quality"))
  }

  def qualityFeaturesSql(id: String, t: String): String = {
    val lst = enMarkers.map(w => s"'$w'").mkString(", ")
    val tk = TextOps.tokensSql(t)
    s"""
      SELECT $id,
        CAST(len($tk) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct($tk)) AS BIGINT) AS n_distinct,
        CAST(len(list_filter($tk, x -> list_contains([$lst], x))) AS BIGINT) AS n_stopwords,
        round(1.0 - len(list_distinct($tk)) * 1.0 / len($tk), 6) AS repeat_ratio,
        round(len(list_filter($tk, x -> list_contains([$lst], x))) * 1.0 / len($tk), 6) AS stopword_ratio,
        round(0.4 * (1.0 - (1.0 - len(list_distinct($tk)) * 1.0 / len($tk)))
            + 0.3 * (1.0 - len(list_filter($tk, x -> list_contains([$lst], x))) * 1.0 / len($tk))
            + 0.3 * least(len($tk) * 1.0 / 100.0, 1.0), 6) AS quality
      FROM documents"""
  }

  /** Token counts: whitespace tokens + BPE-ish chunk count (runs of
    * <=4 letters — a stand-in for subword segmentation with an exact
    * SQL mirror). */
  def tokenCounts(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      size(TextOps.tokens(col(text))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(text), lit("[a-z]{1,4}"), lit(0)))
        .cast("long").as("bpe_chunks"),
      length(col(text)).cast("long").as("n_chars_measured"))

  /** Document fingerprints: whole-text rolling hash + min/max shingle
    * hash (the winnowing primitives). */
  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      TextOps.polyHash(col(text)).as("full_hash"),
      array_min(TextOps.shingleHashes(col(text))).as("min_shingle_hash"),
      array_max(TextOps.shingleHashes(col(text))).as("max_shingle_hash"))
}
