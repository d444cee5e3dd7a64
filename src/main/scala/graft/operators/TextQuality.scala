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

  // --- PII scrubbing -------------------------------------------------
  /** (pattern, replacement token) pairs, applied in order. The regex
    * subset is deliberately portable: character classes, bounded
    * quantifiers, and \b word boundaries behave identically in Java
    * regex (Spark) and RE2 (DuckDB oracle). */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("""\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}""", "<PHONE>"),
    ("""\b[A-Z]{2}[0-9]{6,10}\b""", "<ID>"))

  /** PII redaction: replaces email / phone / id-number patterns with
    * typed tokens and counts each redaction class. A pure per-row
    * regexp_replace chain — codegen'd, embarrassingly parallel, the
    * operator itself introduces no shuffle (the map shape a 100 TB
    * scrub pass needs). Counts are taken on the INPUT text so classes
    * don't see each other's replacement tokens. */
  def piiScrub(docs: DataFrame, id: String, text: String): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(col(text)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val counts = piiPatterns.map { case (p, _) =>
      size(regexp_extract_all(col(text), lit(p), lit(0))).cast("long")
    }
    docs.select(
      col(id),
      counts(0).as("n_emails"),
      counts(1).as("n_phones"),
      counts(2).as("n_ids"),
      (counts(0) + counts(1) + counts(2)).as("n_redactions"),
      scrubbed.as("scrubbed"))
  }

  def piiScrubSql(id: String, t: String): String = {
    val scrubbed = piiPatterns.foldLeft(t) {
      case (s, (p, r)) => s"regexp_replace($s, '$p', '$r', 'g')"
    }
    def cnt(p: String) = s"CAST(len(regexp_extract_all($t, '$p')) AS BIGINT)"
    val Seq(em, ph, idn) = piiPatterns.map { case (p, _) => cnt(p) }
    s"""
      SELECT $id,
        $em AS n_emails,
        $ph AS n_phones,
        $idn AS n_ids,
        $em + $ph + $idn AS n_redactions,
        $scrubbed AS scrubbed
      FROM documents"""
  }

  // --- repetition signals (Gopher-style) -----------------------------
  /** Repetition-quality signals per document: duplicate token /
    * 2-gram / 3-gram fractions and the top-token mass — the
    * Gopher-family "repetitious text" filters. Pure per-row expression
    * work over the token array; no shuffle. Short-doc guards: a doc
    * with < n tokens has zero n-gram repetition by definition. */
  /** Duplicate-w-gram fraction of a text column: 1 - distinct/total
    * word w-grams (0 for docs shorter than w tokens). A pure
    * expression — usable directly as a filter predicate in a gate
    * (no join, no extra pass; see [[Curate.curate]]). */
  def dupNgramRatio(text: Column, w: Int): Column = {
    val tk = TextOps.tokens(text)
    val ngrams = transform(sequence(lit(1), size(tk) - (w - 1)),
      i => concat_ws(" ", (0 until w).map(j => element_at(tk, i + j)): _*))
    val total = size(tk) - (w - 1)
    when(size(tk) >= w,
      round(lit(1.0) - size(array_distinct(ngrams)).cast("double")
        / total.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  def repetitionSignals(docs: DataFrame, id: String, text: String): DataFrame = {
    val tk = TextOps.tokens(col(text))
    val n = size(tk).cast("long")
    val topTok = array_max(transform(array_distinct(tk),
      t => size(filter(tk, x => x === t))))
    docs.select(
      col(id),
      n.as("n_tokens"),
      dupNgramRatio(col(text), 1).as("dup_token_ratio"),
      dupNgramRatio(col(text), 2).as("dup_2gram_ratio"),
      dupNgramRatio(col(text), 3).as("dup_3gram_ratio"),
      round(topTok.cast("double") / n.cast("double"), 6).as("top_token_ratio"))
  }

  def repetitionSignalsSql(id: String, t: String): String = {
    val tk = TextOps.tokensSql(t)
    def ngrams(w: Int): String = {
      val parts = (0 until w).map(j =>
        if (j == 0) s"tk[i]" else s"tk[i+$j]").mkString(" || ' ' || ")
      s"list_transform(range(1, len(tk) - ${w - 1} + 1), i -> $parts)"
    }
    def dupRatio(w: Int): String =
      s"""CASE WHEN len(tk) >= $w
          THEN round(1.0 - len(list_distinct(${ngrams(w)})) * 1.0
                     / (len(tk) - ${w - 1}), 6)
          ELSE 0.0 END"""
    s"""
      SELECT $id,
        CAST(len(tk) AS BIGINT) AS n_tokens,
        ${dupRatio(1)} AS dup_token_ratio,
        ${dupRatio(2)} AS dup_2gram_ratio,
        ${dupRatio(3)} AS dup_3gram_ratio,
        round(list_max(list_transform(list_distinct(tk),
          tok -> len(list_filter(tk, x -> x = tok)))) * 1.0 / len(tk), 6)
          AS top_token_ratio
      FROM (SELECT $id, $tk AS tk FROM documents) _r"""
  }
}
