package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus-level statistics for training-data curation: domain mixing
  * weights, eval-set contamination, and a unigram-LM surprisal score.
  * These are the "whole-corpus pass" operators a 100 TB pipeline runs
  * between dedup and sampling: each is one or two partial-aggregable
  * shuffles over token- or shingle-level rows, with every float rule
  * from SURVEY §4 kept integer-exact (token counts are longs, isqrt
  * and bin-length are exactly mirrored by the DuckDB oracle).
  */
object CorpusStats {

  // --- domain mix ----------------------------------------------------
  /** Per-domain token budget + sampling shares. `raw_share` is the
    * corpus-proportional weight; `temp_share` is the temperature-
    * flattened weight w ∝ sqrt(tokens) (the alpha=0.5 mix-flattening
    * used when over-represented domains would dominate a sample).
    * sqrt is IEEE-correctly-rounded on both engines, and the floor to
    * a long (isqrt) makes the share arithmetic integer-exact until
    * the final rounded division. One groupBy over per-row token
    * counts (map-side combinable); the totals join is a broadcast of
    * a one-row aggregate — no second shuffle of the data. */
  def domainMix(docs: DataFrame, source: String, text: String): DataFrame = {
    val perSource = docs
      .select(col(source),
        size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("isq",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"), sum(col("isq")).as("tot_isq"))
    perSource.crossJoin(broadcast(totals))
      .select(col(source), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens").cast("double"),
          6).as("raw_share"),
        round(col("isq").cast("double") / col("tot_isq").cast("double"),
          6).as("temp_share"))
  }

  def domainMixSql(source: String, text: String): String = {
    val tk = TextOps.tokensSql(text)
    s"""
      WITH per_source AS (
        SELECT $source,
               COUNT(*) AS n_docs,
               SUM(CAST(len($tk) AS BIGINT)) AS n_tokens,
               CAST(floor(sqrt(SUM(CAST(len($tk) AS BIGINT)))) AS BIGINT)
                 AS isq
        FROM documents GROUP BY 1),
      tot AS (SELECT SUM(n_tokens) AS tot_tokens, SUM(isq) AS tot_isq
              FROM per_source)
      SELECT $source, n_docs, n_tokens,
             round(n_tokens * 1.0 / tot_tokens, 6) AS raw_share,
             round(isq * 1.0 / tot_isq, 6) AS temp_share
      FROM per_source CROSS JOIN tot"""
  }

  // --- eval-set contamination ---------------------------------------
  /** Train/eval contamination via shingle overlap: a training doc is
    * contaminated by an eval doc when it shares at least `minOverlap`
    * of the eval doc's distinct 3-gram shingles (the n-gram-overlap
    * decontamination family). Shape: the eval side of the shingle
    * join is BROADCAST — eval sets are small by construction, so the
    * candidate generation is a map-side hash join over the exploded
    * train shingles, then one (train, eval) groupBy. No all-pairs
    * anywhere; the 100 TB cost is one pass over train shingles. */
  def contamination(docs: DataFrame, id: String, text: String,
                    isEval: Column, minOverlap: Double): DataFrame = {
    val sh = docs.select(col(id), isEval.as("is_eval"),
      explode(array_distinct(TextOps.shingleHashes(col(text)))).as("h"))
    val ev = sh.where(col("is_eval"))
      .select(col(id).as("eval_id"), col("h"))
    val tr = sh.where(!col("is_eval"))
      .select(col(id).as("train_id"), col("h"))
    val evSizes = ev.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval_shingles"))
    tr.join(broadcast(ev), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evSizes), "eval_id")
      .withColumn("overlap",
        round(col("n_shared").cast("double")
          / col("n_eval_shingles").cast("double"), 6))
      .where(col("overlap") >= minOverlap)
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        col("overlap"))
  }

  def contaminationSql(id: String, text: String, isEvalSql: String,
                       minOverlap: Double,
                       rel: String = "documents"): String = {
    val sh = s"list_distinct(${TextOps.shingleHashesSql(text)})"
    s"""
      WITH sh AS (
        SELECT $id, $isEvalSql AS is_eval, unnest($sh) AS h
        FROM $rel),
      ev AS (SELECT $id AS eval_id, h FROM sh WHERE is_eval),
      tr AS (SELECT $id AS train_id, h FROM sh WHERE NOT is_eval),
      ev_sizes AS (SELECT eval_id, COUNT(*) AS n_eval_shingles
                   FROM ev GROUP BY 1),
      shared AS (
        SELECT train_id, eval_id, COUNT(*) AS n_shared
        FROM tr JOIN ev USING (h) GROUP BY 1, 2)
      SELECT train_id, eval_id, n_shared,
             round(n_shared * 1.0 / n_eval_shingles, 6) AS overlap
      FROM shared JOIN ev_sizes USING (eval_id)
      WHERE round(n_shared * 1.0 / n_eval_shingles, 6) >= $minOverlap"""
  }

  // --- vocabulary statistics ----------------------------------------
  /** Zipf-head vocabulary stats: the `topK` most frequent token
    * hashes with their corpus share, alongside whole-vocab QA
    * numbers (distinct tokens, hapax count, total tokens) — the
    * standard corpus-health snapshot before tokenizer training.
    * Shape: one token-explode groupBy (map-side combinable), a
    * TakeOrderedAndProject top-k (never a full sort), and a one-row
    * totals broadcast. Ties rank by (freq desc, hash) — total order,
    * oracle-mirrored. */
  def vocabStats(docs: DataFrame, id: String, text: String,
                 topK: Int): DataFrame = {
    val vocab = docs.select(
        explode(transform(TextOps.tokens(col(text)),
          t => TextOps.polyHash(t))).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(
      sum(col("cnt")).as("n_total"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    val top = vocab.orderBy(col("cnt").desc, col("th")).limit(topK)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col("th"))
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("th"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 6)
          .as("share"),
        col("n_total"), col("n_distinct"), col("n_hapax"))
  }

  def vocabStatsSql(id: String, text: String, topK: Int): String = {
    val tk = TextOps.tokensSql(text)
    s"""
      WITH vocab AS (
        SELECT th, COUNT(*) AS cnt
        FROM (SELECT unnest(list_transform($tk,
                tok -> ${TextOps.polyHashSql("tok")})) AS th
              FROM documents)
        GROUP BY 1),
      tot AS (SELECT SUM(cnt) AS n_total, COUNT(*) AS n_distinct,
                     SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
              FROM vocab),
      top AS (SELECT th, cnt,
                     ROW_NUMBER() OVER (ORDER BY cnt DESC, th) AS rank
              FROM vocab ORDER BY cnt DESC, th LIMIT $topK)
      SELECT CAST(rank AS BIGINT) AS rank, th, cnt,
             round(cnt * 1.0 / n_total, 6) AS share,
             n_total, n_distinct, n_hapax
      FROM top CROSS JOIN tot"""
  }

  // --- unigram-LM surprisal -----------------------------------------
  /** Per-document mean unigram surprisal in whole bits — the
    * perplexity-proxy quality score (rare-token-heavy docs score
    * high, boilerplate scores low). The corpus itself is the LM:
    * token surprisal = bitlength(totalTokens div tokenCount), which
    * is floor(log2)+1 computed in exact integer arithmetic (no
    * float log anywhere — log is not correctly-rounded-guaranteed
    * across engines, bin-length is).
    *
    * Shape (the canonical "score against corpus term stats" pass):
    * (1) per-doc token-hash counts — one groupBy(doc, token) with
    * map-side combine; (2) vocab = groupBy(token) over those partial
    * counts (shuffles the DISTINCT-per-doc rows, not raw tokens);
    * (3) shuffle-hash join doc-rows x vocab on token (both sides
    * token-partitioned; vocab is corpus-sized, so broadcasting it
    * would be wrong at scale); (4) final groupBy(doc) of exact long
    * sums. */
  def unigramSurprisal(docs: DataFrame, id: String, text: String): DataFrame = {
    val dt = docs.select(col(id),
        explode(transform(TextOps.tokens(col(text)),
          t => TextOps.polyHash(t))).as("th"))
      .groupBy(col(id), col("th")).agg(count(lit(1)).as("c_dt"))
    val vocab = dt.groupBy(col("th")).agg(sum(col("c_dt")).as("cnt"))
    val totals = vocab.agg(sum(col("cnt")).as("n_total"))
    dt.join(vocab.hint("shuffle_hash"), "th")
      .crossJoin(broadcast(totals))
      .select(col(id), col("c_dt"),
        length(bin(expr("n_total div cnt"))).cast("long").as("bits"))
      .groupBy(col(id))
      .agg(sum(col("c_dt")).as("n_tokens"),
        sum(col("c_dt") * col("bits")).as("total_bits"))
      .select(col(id), col("n_tokens"),
        round(col("total_bits").cast("double")
          / col("n_tokens").cast("double"), 6).as("mean_bits"))
  }

  def unigramSurprisalSql(id: String, text: String): String = {
    val tk = TextOps.tokensSql(text)
    s"""
      WITH dt AS (
        SELECT $id, th, COUNT(*) AS c_dt
        FROM (SELECT $id,
                unnest(list_transform($tk,
                  tok -> ${TextOps.polyHashSql("tok")})) AS th
              FROM documents)
        GROUP BY 1, 2),
      vocab AS (SELECT th, SUM(c_dt) AS cnt FROM dt GROUP BY 1),
      tot AS (SELECT SUM(cnt) AS n_total FROM vocab),
      sc AS (
        SELECT $id, c_dt,
               CAST(length(bin(n_total // cnt)) AS BIGINT) AS bits
        FROM dt JOIN vocab USING (th) CROSS JOIN tot)
      SELECT $id,
             CAST(SUM(c_dt) AS BIGINT) AS n_tokens,
             round(SUM(c_dt * bits) * 1.0 / SUM(c_dt), 6) AS mean_bits
      FROM sc GROUP BY 1"""
  }
}
