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
  /** n-gram hashes over a TOKEN-HASH array attribute — see
    * [[TextOps.ngramHashes]] (factored there for reuse by the
    * substring-dedup operator). */
  private def ngramHashes(th: Column, w: Int): Column =
    TextOps.ngramHashes(th, w)

  /** Repetition signals, staged so every lambda closes over bound
    * attributes only (tk -> th -> sorted/starts -> ratios). The
    * original single-expression phrasing re-evaluated split() inside
    * each n-gram lambda (O(n²) splits) and the top-token count was a
    * nested filter-in-transform (O(n³) in the interpreted HOF path —
    * 14 s at sf0.1); this shape is O(n log n) per row and runs in the
    * same time band as the other per-row text ops. Top-token count =
    * longest equal run in the sorted hash array (run starts -> gaps). */
  def repetitionSignals(docs: DataFrame, id: String, text: String): DataFrame = {
    val withTh = docs
      .select(col(id),
        TextOps.tokenHashesSeq(col(text)).as("th"))
    val withSorted = withTh.select(col(id), col("th"),
      array_sort(col("th")).as("srt"),
      ngramHashes(col("th"), 2).as("g2"),
      ngramHashes(col("th"), 3).as("g3"))
    val withStarts = withSorted.select(col("*"),
      concat(
        filter(
          transform(sequence(lit(1), size(col("srt"))), i =>
            when(i === 1 ||
              element_at(col("srt"), i) =!= element_at(col("srt"), i - 1), i)),
          x => x.isNotNull),
        array(size(col("srt")) + 1)).as("starts"))
    val n = size(col("th")).cast("long")
    def dup(g: Column, w: Int): Column = {
      val total = size(col("th")) - (w - 1)
      when(size(col("th")) >= w,
        round(lit(1.0) - size(array_distinct(g)).cast("double")
          / total.cast("double"), 6))
        .otherwise(lit(0.0))
    }
    val topCount = array_max(
      transform(sequence(lit(1), size(col("starts")) - 1), i =>
        element_at(col("starts"), i + 1) - element_at(col("starts"), i)))
    withStarts.select(
      col(id),
      n.as("n_tokens"),
      dup(col("th"), 1).as("dup_token_ratio"),
      dup(col("g2"), 2).as("dup_2gram_ratio"),
      dup(col("g3"), 3).as("dup_3gram_ratio"),
      round(topCount.cast("double") / n.cast("double"), 6)
        .as("top_token_ratio"))
  }

  // --- Gopher rule gate (Rae et al. 2021, Appendix A1.1) -------------
  /** The five word-level Gopher quality rules as explicit per-doc
    * flags, every comparison integer-only (cross-multiplied ratios,
    * §4 — no float division anywhere):
    *
    *   - len:     minTok <= n_tokens <= maxTok (paper: 50..100 000)
    *   - wordlen: mean word length in [3, 10]  → 3n <= chars <= 10n,
    *              where chars = length(text) − (n−1) (space-split
    *              tokens make the subtraction exact — no per-token
    *              length fold needed)
    *   - symbol:  symbol-to-word ratio ('#'/'…' stand-ins) <= 0.1
    *              → 10·n_sym <= n
    *   - alpha:   >= 80% of words contain an alphabetic char
    *              → 5·n_alpha >= 4·n
    *   - stop:    >= 2 DISTINCT stop words present (the marker set)
    *
    * Per-row expression work only — the flags frame is the map stage
    * a 100 TB gate runs before any shuffle. */
  def gopherFlags(docs: DataFrame, id: String, text: String,
                  source: String,
                  minTok: Long = 50L, maxTok: Long = 100000L): DataFrame = {
    val staged = docs.select(col(source), col(id),
      TextOps.tokens(col(text)).as("tk"),
      length(col(text)).cast("long").as("raw_len"),
      (size(regexp_extract_all(col(text), lit("#"), lit(0))) +
        size(regexp_extract_all(col(text), lit("""\.\.\."""), lit(0))))
        .cast("long").as("n_sym"))
    val n = size(col("tk")).cast("long")
    val chars = col("raw_len") - (n - lit(1L))
    // (?i): the Gopher rule is "word contains AN alphabetic char" —
    // case-insensitive, so acronyms/capitalized words count (mirrored
    // in the DuckDB SQL; both engines share RE2-style inline flags).
    val nAlpha =
      size(filter(col("tk"), t => t.rlike("(?i)[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(col("tk")),
      array(enMarkers.map(lit): _*))).cast("long")
    staged.select(
      col(source), col(id), n.as("n_tokens"),
      (n >= minTok && n <= maxTok).as("pass_len"),
      (chars >= lit(3L) * n && chars <= lit(10L) * n).as("pass_wordlen"),
      (lit(10L) * col("n_sym") <= n).as("pass_symbol"),
      (lit(5L) * nAlpha >= lit(4L) * n).as("pass_alpha"),
      (nStop >= 2L).as("pass_stop"))
      .withColumn("keep",
        col("pass_len") && col("pass_wordlen") && col("pass_symbol") &&
          col("pass_alpha") && col("pass_stop"))
  }

  /** Raw per-source Gopher audit: independent fail counts per rule +
    * kept doc/token mass. Pure sums — the mergeable half of
    * [[gopherRules]] (counts add across shards/batches: the d46
    * streaming fold state). */
  def gopherAuditRaw(flags: DataFrame, source: String): DataFrame = {
    def failCnt(c: String) =
      sum(when(!col(c), 1L).otherwise(0L)).as(c.replace("pass_", "fail_"))
    flags.groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        failCnt("pass_len"), failCnt("pass_wordlen"),
        failCnt("pass_symbol"), failCnt("pass_alpha"),
        failCnt("pass_stop"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .cast("long").as("tokens_kept"))
  }

  /** kept_ppm finalizer over [[gopherAuditRaw]] sums (ratios never
    * fold — computed at emission, the d40/d42 discipline). */
  def gopherFinalize(raw: DataFrame, source: String): DataFrame =
    raw.withColumn("kept_ppm",
        CorpusStats.ppmExpr("n_kept", "n_docs").cast("long"))
      .orderBy(col(source))

  /** c101: the per-source Gopher rule-gate audit — which rule kills
    * how many docs per source, and what survives all five. One map
    * (the flags) + one partial-aggregable groupBy; output |sources|
    * rows, all-integer. */
  def gopherRules(docs: DataFrame, id: String, text: String,
                  source: String,
                  minTok: Long = 50L, maxTok: Long = 100000L): DataFrame =
    gopherFinalize(
      gopherAuditRaw(gopherFlags(docs, id, text, source, minTok, maxTok),
        source), source)

  /** DuckDB mirror of [[gopherRules]] over `from` (default: the
    * documents table; the d46 batch contract passes a filtered CTE). */
  def gopherRulesSql(id: String, t: String, source: String,
                     minTok: Long = 50L, maxTok: Long = 100000L,
                     from: String = "documents"): String = {
    val lst = enMarkers.map(w => s"'$w'").mkString(", ")
    val tk = TextOps.tokensSql(t)
    s"""
      WITH gr_flags AS (
        SELECT $source, $id, n AS n_tokens,
               n BETWEEN $minTok AND $maxTok AS pass_len,
               chars BETWEEN 3 * n AND 10 * n AS pass_wordlen,
               10 * n_sym <= n AS pass_symbol,
               5 * n_alpha >= 4 * n AS pass_alpha,
               n_stop >= 2 AS pass_stop
        FROM (
          SELECT $source, $id,
                 CAST(len($tk) AS BIGINT) AS n,
                 CAST(length($t) AS BIGINT)
                   - (CAST(len($tk) AS BIGINT) - 1) AS chars,
                 CAST(len(regexp_extract_all($t, '#')) AS BIGINT)
                   + CAST(len(regexp_extract_all($t, '\\.\\.\\.')) AS BIGINT)
                   AS n_sym,
                 CAST(len(list_filter($tk,
                     x -> regexp_matches(x, '(?i)[a-z]'))) AS BIGINT) AS n_alpha,
                 CAST(len(list_intersect(list_distinct($tk), [$lst]))
                   AS BIGINT) AS n_stop
          FROM $from) b),
      gr_keep AS (
        SELECT *, pass_len AND pass_wordlen AND pass_symbol
                  AND pass_alpha AND pass_stop AS keep
        FROM gr_flags),
      gr_raw AS (
        SELECT $source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN NOT pass_len THEN 1 ELSE 0 END)
                 AS BIGINT) AS fail_len,
               CAST(SUM(CASE WHEN NOT pass_wordlen THEN 1 ELSE 0 END)
                 AS BIGINT) AS fail_wordlen,
               CAST(SUM(CASE WHEN NOT pass_symbol THEN 1 ELSE 0 END)
                 AS BIGINT) AS fail_symbol,
               CAST(SUM(CASE WHEN NOT pass_alpha THEN 1 ELSE 0 END)
                 AS BIGINT) AS fail_alpha,
               CAST(SUM(CASE WHEN NOT pass_stop THEN 1 ELSE 0 END)
                 AS BIGINT) AS fail_stop,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END)
                 AS BIGINT) AS tokens_kept
        FROM gr_keep GROUP BY 1)
      SELECT *, ${CorpusStats.ppmSql("n_kept", "n_docs")} AS kept_ppm
      FROM gr_raw
      ORDER BY $source"""
  }

  def repetitionSignalsSql(id: String, t: String): String = {
    val P = TextOps.P
    def ngrams(w: Int): String =
      if (w == 1) "th"
      else {
        val h = (2 to w).foldLeft("th[i]")((acc, j) =>
          s"(($acc) * 31 + th[i+${j - 1}]) % $P")
        s"list_transform(range(1, len(th) - ${w - 1} + 1), i -> $h)"
      }
    def dupRatio(w: Int): String =
      s"""CASE WHEN len(th) >= $w
          THEN round(1.0 - len(list_distinct(${ngrams(w)})) * 1.0
                     / (len(th) - ${w - 1}), 6)
          ELSE 0.0 END"""
    s"""
      WITH _th AS (
        SELECT $id,
               list_transform(${TextOps.tokensSql(t)},
                 tok -> ${TextOps.polyHashSql("tok")}) AS th
        FROM documents),
      _srt AS (SELECT $id, th, list_sort(th) AS srt FROM _th),
      _starts AS (
        SELECT $id, th,
               list_filter(list_transform(range(1, len(srt) + 1),
                 i -> CASE WHEN i = 1 OR srt[i] <> srt[i-1] THEN i END),
                 x -> x IS NOT NULL) || [len(srt) + 1] AS starts
        FROM _srt)
      SELECT $id,
        CAST(len(th) AS BIGINT) AS n_tokens,
        ${dupRatio(1)} AS dup_token_ratio,
        ${dupRatio(2)} AS dup_2gram_ratio,
        ${dupRatio(3)} AS dup_3gram_ratio,
        round(list_max(list_transform(range(1, len(starts)),
          i -> starts[i+1] - starts[i])) * 1.0 / len(th), 6)
          AS top_token_ratio
      FROM _starts"""
  }
}
