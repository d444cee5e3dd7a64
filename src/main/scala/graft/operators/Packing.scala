package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic EPOCH SHUFFLE + mixing-quality audit — the
    * training-order step between mixing (c32/c86) and packing (c37/
    * c48): each epoch reshuffles the corpus by a stable hash key
    * (key = mixed-poly-hash(epoch:id) — a different but REPRODUCIBLE
    * permutation per epoch, the property a distributed loader needs
    * for resumable training and run-to-run comparisons), docs land in
    * shard = key mod S and are ordered by (key, id) within the shard.
    * The audit answers "did the shuffle actually mix?" per shard:
    * doc/token mass (balance), same-source adjacency count (clumping
    * — a shuffle that leaves source runs intact feeds the model
    * correlated batches; well-mixed ⇒ adjacencies ≈ Σ n_s(n_s−1)/N
    * per shard), and an ORDER-SENSITIVE position checksum
    * (Σ pos·id mod P — any reordering, dropped or duplicated doc
    * changes it; the loader re-derives it to prove it read the right
    * order). The within-shard window IS the shard write's own sort —
    * S scales with the cluster (thousands in production, so a shard
    * is one task's output file); everything else is per-shard
    * bounded aggregation. All-integer, oracle digit-exact. */
  def epochShuffle(docs: DataFrame, id: String, text: String,
                   source: String, epoch: Long,
                   shards: Int = 16): DataFrame = {
    val key = TextOps.polyHashMixed(
      concat(lit(epoch.toString), lit(":"), col(id).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("did"))
    docs
      .select(col(id).cast("long").as("did"), col(source).as("src"),
        size(TextOps.tokens(col(text))).cast("long").as("tok"),
        key.as("key"))
      .withColumn("shard", pmod(col("key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("prev_src", lag(col("src"), 1).over(w))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("tok_mass"),
        sum(when(col("prev_src") === col("src"), 1L).otherwise(0L))
          .as("same_src_adj"),
        pmod(sum(pmod(expr("cast(pos as decimal(38,0)) * did"),
          lit(TextOps.P))), lit(TextOps.P)).cast("long")
          .as("pos_checksum"))
      .orderBy(col("shard"))
  }

  /** DuckDB mirror of [[epochShuffle]]. */
  def epochShuffleSql(id: String, text: String, source: String,
                      epoch: Long, shards: Int = 16): String = {
    val key = TextOps.polyHashMixedSql(
      s"('$epoch' || ':' || CAST($id AS VARCHAR))")
    s"""
      WITH keyed AS (
        SELECT CAST($id AS BIGINT) AS did, $source AS src,
               CAST(len(${TextOps.tokensSql(text)}) AS BIGINT) AS tok,
               ($key) AS key
        FROM documents),
      sharded AS (
        SELECT *, key % $shards AS shard FROM keyed),
      ordered AS (
        SELECT shard, did, src, tok,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                 ORDER BY key, did) AS BIGINT) AS pos,
               LAG(src, 1) OVER (PARTITION BY shard
                 ORDER BY key, did) AS prev_src
        FROM sharded)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tok_mass,
             CAST(SUM(CASE WHEN prev_src = src THEN 1 ELSE 0 END)
               AS BIGINT) AS same_src_adj,
             CAST(SUM((CAST(pos AS HUGEINT) * did) % ${TextOps.P})
               % ${TextOps.P} AS BIGINT) AS pos_checksum
      FROM ordered
      GROUP BY shard
      ORDER BY shard"""
  }

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

  /** Sliding-window document chunking — the per-document "cut into
    * overlapping `win`-token windows every `stride` tokens" stage in
    * front of retrieval indexing or long-document training (the
    * complement of [[packOffsets]]: packing concatenates ACROSS
    * documents, chunking splits WITHIN one). Chunk k starts at token
    * k·stride; the last chunk is the first whose window reaches the
    * document end (kmax = ceil((n−win)/stride), 0 when n ≤ win), so
    * a document never yields a tail shorter than win−stride except
    * when the document itself is shorter. Output: one row per chunk
    * (id, chunk_id, start_tok 0-based, n_chunk_tokens, chunk_text).
    *
    * Scale shape: map-only — tokenize once, explode a ≤ n/stride+1
    * element sequence, slice the token array per chunk. No shuffle,
    * no state; each document is independent, so the pass runs at
    * scan speed on any number of executors and composes with the
    * d8-style per-doc-independent streaming argument. All-integer
    * chunk arithmetic (§4). */
  def chunkDocs(docs: DataFrame, id: String, text: String,
                win: Long, stride: Long): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    val toks = docs.select(col(id), TextOps.tokens(col(text)).as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
    toks
      .withColumn("__kmax",
        when(col("n_tokens") > win,
          expr(s"(n_tokens - $win + $stride - 1) div $stride"))
          .otherwise(0L))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("__kmax"))))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_chunk_tokens",
        least(lit(win), col("n_tokens") - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"),
          (col("start_tok") + 1L).cast("int"),
          col("n_chunk_tokens").cast("int")), " "))
      .select(col(id), col("n_tokens"), col("chunk_id"),
        col("start_tok"), col("n_chunk_tokens"), col("chunk_text"))
  }

  // --- shard export --------------------------------------------------
  /** Checksum modulus for [[shardManifest]]'s order checksum. */
  val ShardMod = 1000000007L
  val HashFold = 1000003L

  /** Content-hash shard assignment: `shard = mixedPolyHash(text) mod
    * shards` — the deterministic router in front of a sharded
    * training-data writer. Map-only; the MIXED hash because the
    * VALUE's distribution matters for balance (TextOps.polyHashMixed
    * scaladoc). `shards` is the output-file-count knob: pick it from
    * corpus size / target file size (thousands at scale), and the
    * hash keeps shard sizes balanced without a sampling pass. */
  /** Content-hash shard id of a text column — the routing expression
    * [[shardAssign]] and the streaming ooo packer share (same
    * polyHashMixed mod `shards`), so a document's shard can never
    * drift between the batch and streaming paths. */
  def shardOf(text: Column, shards: Int): Column = {
    require(shards > 0, s"need shards > 0, got $shards")
    pmod(TextOps.polyHashMixed(text), lit(shards.toLong))
  }

  def shardAssign(docs: DataFrame, id: String, text: String,
                  shards: Int): DataFrame = {
    require(shards > 0, s"need shards > 0, got $shards")
    docs.select(col(id), col(text),
        TextOps.polyHashMixed(col(text)).as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
  }

  /** Per-shard routing counts (shard, n_docs, n_tokens) — the
    * balance monitor over [[shardAssign]]: one map-only assignment +
    * one partial-aggregable groupBy over `shards` keys. Also the
    * batch-parity target of the streaming router flavor
    * (Streams.shardCountsStreaming), whose running state is O(shards)
    * BY CONSTRUCTION. */
  def shardCounts(docs: DataFrame, id: String, text: String,
                  shards: Int): DataFrame =
    shardAssign(docs, id, text, shards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(text))).cast("long")).as("n_tokens"))

  /** Shard manifest for a deterministic sharded corpus export — the
    * "write the training data as S reproducibly-shuffled files" plan:
    * each document routes to `shard` by content hash
    * ([[shardAssign]]) and takes a within-shard position by (hash,
    * id) order — a content-keyed order that is decorrelated from
    * ingest order, i.e. the reproducible global shuffle a pretraining
    * loader wants, without a random seed to ship. Output per shard:
    * doc/token/char totals plus `order_checksum` =
    * Σ rank·(h mod $HashFold) mod [[ShardMod]] — order-SENSITIVE, so
    * the oracle only matches if both engines assign the exact same
    * position to every document (the determinism of the layout is
    * verified, not asserted).
    *
    * Scale shape: the rank window partitions by shard — that exchange
    * IS the writer's `repartition(shard).sortWithinPartitions` and
    * the only shuffle in the plan; with `shards` sized to the corpus
    * (thousands of files at 100 TB) per-shard sorts are bounded and
    * hash-balanced. The manifest aggregation inherits the window's
    * hash(shard) partitioning (ClusteredDistribution on a superset
    * key), so it adds NO exchange; checksum terms widen to
    * decimal(38,0) before summing (§4 — no 64-bit overflow at corpus
    * scale). */
  def shardManifest(docs: DataFrame, id: String, text: String,
                    shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(id))
    shardAssign(docs, id, text, shards)
      .withColumn("rank", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(text))).cast("long")).as("n_tokens"),
        sum(length(col(text)).cast("long")).as("n_chars"),
        (sum(expr(s"cast(rank as decimal(38,0)) * (h % $HashFold)" +
            s" % $ShardMod")) % lit(ShardMod))
          .cast("long").as("order_checksum"))
  }

  /** DuckDB mirror of [[shardManifest]]. */
  def shardManifestSql(id: String, text: String, shards: Int): String = {
    val tk = TextOps.tokensSql(text)
    s"""
      WITH a AS (
        SELECT $id, $text,
               ${TextOps.polyHashMixedSql(text)} AS h
        FROM documents),
      s AS (
        SELECT $id, $text, h, h % $shards AS shard,
               ROW_NUMBER() OVER (PARTITION BY h % $shards
                 ORDER BY h, $id) AS rank
        FROM a)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len($tk)) AS BIGINT) AS n_tokens,
             CAST(SUM(length($text)) AS BIGINT) AS n_chars,
             CAST(CAST(SUM(CAST(rank AS HUGEINT) * (h % $HashFold)
                 % $ShardMod) AS HUGEINT) % $ShardMod AS BIGINT)
               AS order_checksum
      FROM s GROUP BY shard ORDER BY shard"""
  }

  /** DuckDB mirror of [[shardCounts]]. */
  def shardCountsSql(id: String, text: String, shards: Int): String =
    s"""
      SELECT ${TextOps.polyHashMixedSql(text)} % $shards AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(${TextOps.tokensSql(text)})) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY 1 ORDER BY shard"""

  /** Per-shard sequence packing — [[shardManifest]]'s routing + the
    * c37 offset math composed into the layout a pretraining writer
    * actually emits: each shard's documents concatenate in the
    * deterministic (hash, id) order and chop into `budget`-token
    * sequences INDEPENDENTLY per shard (shards are separate files;
    * sequences never span shards). Per shard: doc/token totals,
    * `n_seqs` = ceil(tokens/budget), `n_straddle` = docs crossing a
    * sequence boundary (the loader's split count), `tail_fill` = the
    * last sequence's fill in integer ppm of the budget (the padding-
    * waste audit).
    *
    * Scale shape: ONE exchange (the same shard window as
    * [[shardManifest]] — the writer's repartition); the running
    * offset is a window prefix sum WITHIN each shard partition
    * (bounded by shard size, which `shards` controls — no global
    * scan, the c37 two-level trick is unnecessary because the shard
    * grid already partitions the order), and the manifest aggregate
    * reuses the window's partitioning exchange-free. All-integer
    * (§4). */
  def shardPack(docs: DataFrame, id: String, text: String,
                shards: Int, budget: Long): DataFrame =
    shardPackOrdered(docs, id, text, shards, budget,
      Seq(col("h"), col(id)))

  /** [[shardPack]] in ARRIVAL order — within-shard concatenation by
    * `id` alone, i.e. the append-as-it-lands layout a STREAMING
    * writer produces (the batch-parity target of
    * Streams.shardPackStreaming under the d2/d3 ordered-feed
    * convention). Same manifest columns and cost shape. */
  def shardPackArrival(docs: DataFrame, id: String, text: String,
                       shards: Int, budget: Long): DataFrame =
    shardPackOrdered(docs, id, text, shards, budget, Seq(col(id)))

  private def shardPackOrdered(docs: DataFrame, id: String,
      text: String, shards: Int, budget: Long,
      order: Seq[Column]): DataFrame = {
    require(budget > 0, s"need budget > 0, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shardAssign(docs, id, text, shards)
      .withColumn("n_tok",
        size(TextOps.tokens(col(text))).cast("long"))
      .withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("straddle",
        when(expr(s"off div $budget") =!=
             expr(s"(off + n_tok - 1) div $budget"), 1L).otherwise(0L))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("straddle")).as("n_straddle"))
      .select(col("shard"), col("n_docs").cast("long").as("n_docs"),
        col("n_tokens").cast("long").as("n_tokens"),
        expr(s"(n_tokens + ${budget - 1}) div $budget").as("n_seqs"),
        col("n_straddle").cast("long").as("n_straddle"),
        when(col("n_tokens") % budget === 0, lit(1000000L))
          .otherwise(expr(s"(cast(n_tokens % $budget as decimal(38,0))" +
            s" * 1000000) div $budget").cast("long"))
          .as("tail_fill_ppm"))
  }

  /** DuckDB mirror of [[shardPack]] (`orderBy = "h, <id>"`) and
    * [[shardPackArrival]] (`orderBy = "<id>"`). */
  def shardPackSql(id: String, text: String, shards: Int,
                   budget: Long, orderBy: String = ""): String = {
    val ord = if (orderBy.nonEmpty) orderBy else s"h, $id"
    val tk = TextOps.tokensSql(text)
    s"""
      WITH a AS (
        SELECT $id, ${TextOps.polyHashMixedSql(text)} AS h,
               CAST(len($tk) AS BIGINT) AS n_tok
        FROM documents),
      s AS (
        SELECT $id, h, n_tok, h % $shards AS shard,
               SUM(n_tok) OVER (PARTITION BY h % $shards
                 ORDER BY $ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tok AS off
        FROM a)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST((SUM(n_tok) + ${budget - 1}) // $budget AS BIGINT)
               AS n_seqs,
             CAST(SUM(CASE WHEN off // $budget <>
                 (off + n_tok - 1) // $budget THEN 1 ELSE 0 END)
               AS BIGINT) AS n_straddle,
             CAST(CASE WHEN SUM(n_tok) % $budget = 0 THEN 1000000
               ELSE (CAST(SUM(n_tok) % $budget AS HUGEINT) * 1000000)
                 // $budget END AS BIGINT) AS tail_fill_ppm
      FROM s GROUP BY shard ORDER BY shard"""
  }

  /** Padding-waste audit of batch construction: fixed `batch`-doc
    * batches padded to their longest member, under ARRIVAL-order
    * batching (consecutive ids — what a naive loader does) vs
    * SORTED-order batching (length-sorted — what a bucketed sampler
    * approximates). The gap between the two waste_ppm rows is exactly
    * what length-bucketed batching buys — the audit a training-infra
    * team runs before picking a sampler.
    *
    * Both global ranks are the two-level distributed scan, never a
    * one-partition corpus window: the arrival rank buckets by
    * `id div 4096` (intra-bucket row_number + a broadcast bucket-count
    * prefix — [[packOffsets]]' shape with counts for token sums); the
    * sorted rank partitions its row_number by the LENGTH value and
    * prefixes with the c38 histogram cumsum (token-count domain is
    * bounded, so the histogram window is tiny; degenerate
    * constant-length corpora would hot-key the intra-length window —
    * real corpora spread lengths). Batch stats then groupBy batch id
    * (partial-aggregable) and fold to one row per strategy. */
  def paddingAudit(docs: DataFrame, id: String, text: String,
                   batch: Int): DataFrame = {
    val toks = docs.select(col(id),
      size(TextOps.tokens(col(text))).cast("long").as("n"))
    // arrival rank: id-bucketed two-level count scan
    val bucketed = toks.withColumn("__bkt", expr(s"$id div 4096"))
    val arrLocal = bucketed.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__bkt")).orderBy(col(id)))
        .cast("long"))
    val wBkt = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val arrPrefix = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", sum(col("__cnt")).over(wBkt) - col("__cnt"))
      .select(col("__bkt"), col("__before"))
    val arrRank = arrLocal.join(broadcast(arrPrefix), "__bkt")
      .select(col("n"), (col("__before") + col("__rn")).as("rk"))
    // sorted rank: intra-length row_number + histogram-cumsum prefix
    val srtLocal = toks.withColumn("__rn",
      row_number().over(Window.partitionBy(col("n")).orderBy(col(id)))
        .cast("long"))
    val wHist = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srtPrefix = toks.groupBy(col("n"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", sum(col("__cnt")).over(wHist) - col("__cnt"))
      .select(col("n").as("__n"), col("__before"))
    val srtRank = srtLocal.join(broadcast(srtPrefix),
        col("n") === col("__n"))
      .select(col("n"), (col("__before") + col("__rn")).as("rk"))
    def summarize(ranked: DataFrame, strategy: String): DataFrame =
      ranked
        .withColumn("bid", expr(s"(rk - 1) div $batch"))
        .groupBy(col("bid"))
        .agg(count(lit(1)).as("cnt"), max(col("n")).as("mx"),
          sum(col("n")).as("sm"))
        .agg(sum(col("cnt")).cast("long").as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("sm")).cast("long").as("real_tokens"),
          sum(col("cnt") * col("mx")).cast("long").as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_docs"),
          col("n_batches"), col("real_tokens"), col("padded_tokens"),
          CorpusStats.ppmExpr("padded_tokens - real_tokens",
            "padded_tokens").cast("long").as("waste_ppm"))
    summarize(arrRank, "arrival")
      .unionAll(summarize(srtRank, "sorted"))
      .orderBy(col("strategy"))
  }

  /** DuckDB mirror of [[paddingAudit]] (one-window ranks — the
    * two-level scan is bit-identical by construction). */
  def paddingAuditSql(id: String, text: String, batch: Int): String = {
    val tk = TextOps.tokensSql(text)
    def leg(order: String, strategy: String) =
      s"""
      SELECT '$strategy' AS strategy,
             CAST(SUM(cnt) AS BIGINT) AS n_docs,
             COUNT(*) AS n_batches,
             CAST(SUM(sm) AS BIGINT) AS real_tokens,
             CAST(SUM(cnt * mx) AS BIGINT) AS padded_tokens,
             ${CorpusStats.ppmSql("SUM(cnt * mx) - SUM(sm)",
               "SUM(cnt * mx)")} AS waste_ppm
      FROM (
        SELECT (rk - 1) // $batch AS bid, COUNT(*) AS cnt,
               MAX(n) AS mx, SUM(n) AS sm
        FROM (SELECT n, ROW_NUMBER() OVER (ORDER BY $order) AS rk
              FROM t)
        GROUP BY 1)"""
    s"""
      WITH t AS (
        SELECT $id, CAST(len($tk) AS BIGINT) AS n FROM documents)
      SELECT * FROM (
      ${leg(id, "arrival")}
      UNION ALL
      ${leg(s"n, $id", "sorted")})
      ORDER BY strategy"""
  }

  /** First-fit-decreasing packing audit — [[paddingAudit]]'s question
    * asked of WHOLE-DOC bin packing: docs pack into fixed
    * `budget`-token bins with NO straddling (each bin holds complete
    * docs; the unused tail is padding the loader burns), under three
    * strategies a batch-assembly owner tunes between:
    *
    *   - `arrival` — next-fit in id order (what a naive sequential
    *     writer does: one open bin, close it when the next doc
    *     doesn't fit);
    *   - `sorted`  — next-fit in DECREASING-length order (what
    *     length-sorting alone buys);
    *   - `ffd`     — first-fit decreasing (every open bin is a
    *     candidate — the classic 11/9·OPT+6/9 heuristic, the best
    *     deterministic one-pass packer in practice).
    *
    * Deterministic distributed formulation: a GLOBAL two-level rank
    * (arrival: [[packOffsets]]' id-bucket scan; decreasing: the c38
    * histogram-prefix scan ordered n DESC) slices the corpus into
    * contiguous `shardSize`-doc shards of the strategy's order; each
    * shard packs EXACTLY and independently via a sequential
    * integer fold over its items (`aggregate` here, `list_reduce` in
    * the oracle — the §4 id-ordered-fold pattern), with bin state
    * bounded by the shard: O(shardSize) docs collected per fold row,
    * O(open bins) accumulator — the production shape, since no real
    * packer holds a 100 TB corpus's bins open; cross-shard waste is
    * the price of parallelism and is IN the audited number. Docs
    * longer than the budget are clamped to one full bin (truncation
    * is the length-trimmer's job, c64); zero-token docs carry no
    * packing cost and are excluded. All-integer outputs; waste_ppm =
    * (capacity − real) ppm of capacity. */
  def ffdAudit(docs: DataFrame, id: String, text: String, budget: Long,
               shardSize: Int = 4096): DataFrame = {
    val toks = docs.select(col(id),
        least(size(TextOps.tokens(col(text))).cast("long"), lit(budget))
          .as("n"))
      .where(col("n") > 0L)
    // arrival rank: id-bucketed two-level count scan
    val bucketed = toks.withColumn("__bkt", expr(s"$id div 4096"))
    val arrLocal = bucketed.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__bkt")).orderBy(col(id)))
        .cast("long"))
    val wBkt = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val arrPrefix = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", sum(col("__cnt")).over(wBkt) - col("__cnt"))
      .select(col("__bkt"), col("__before"))
    val arrRank = arrLocal.join(broadcast(arrPrefix), "__bkt")
      .select(col("n"), (col("__before") + col("__rn")).as("rk"))
    // decreasing rank: intra-length row_number + histogram-cumsum
    // prefix walked from the LONG end
    val decLocal = toks.withColumn("__rn",
      row_number().over(Window.partitionBy(col("n")).orderBy(col(id)))
        .cast("long"))
    val wHist = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decPrefix = toks.groupBy(col("n"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__before", sum(col("__cnt")).over(wHist) - col("__cnt"))
      .select(col("n").as("__n"), col("__before"))
    val decRank = decLocal.join(broadcast(decPrefix),
        col("n") === col("__n"))
      .select(col("n"), (col("__before") + col("__rn")).as("rk"))
    // next-fit fold state: [bins opened, remaining in the open bin]
    val nfExpr =
      s"""aggregate(items, array(0L, 0L), (acc, it) ->
            if(element_at(acc, 2) >= it.n,
               array(element_at(acc, 1), element_at(acc, 2) - it.n),
               array(element_at(acc, 1) + 1L, ${budget}L - it.n)))"""
    // first-fit fold state: remaining capacity per open bin, first
    // fitting bin (1-based array_position over the fits mask) takes
    // the doc, else a new bin opens at the tail
    val pos = "cast(array_position(transform(acc, r -> r >= it.n), " +
      "true) as int)"
    val ffExpr =
      s"""aggregate(items, cast(array() as array<bigint>), (acc, it) ->
            if($pos > 0,
               concat(slice(acc, 1, $pos - 1),
                      array(element_at(acc, $pos) - it.n),
                      slice(acc, $pos + 1, size(acc) - $pos)),
               concat(acc, array(${budget}L - it.n))))"""
    def leg(ranked: DataFrame, strategy: String, firstFit: Boolean) = {
      val binsCol =
        if (firstFit) s"cast(size($ffExpr) as bigint)"
        else s"element_at($nfExpr, 1)"
      ranked
        .withColumn("sid", expr(s"(rk - 1) div $shardSize"))
        .groupBy(col("sid"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("real"),
          sort_array(collect_list(struct(col("rk"), col("n"))))
            .as("items"))
        .withColumn("n_bins", expr(binsCol))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_bins")).cast("long").as("n_bins"),
          sum(col("real")).cast("long").as("real_tokens"))
        .select(lit(strategy).as("strategy"), col("n_docs"),
          col("n_bins"), col("real_tokens"),
          (col("n_bins") * budget).as("capacity_tokens"),
          CorpusStats.ppmExpr(s"n_bins * ${budget}L - real_tokens",
            s"(n_bins * ${budget}L)").cast("long").as("waste_ppm"))
    }
    leg(arrRank, "arrival", firstFit = false)
      .unionAll(leg(decRank, "sorted", firstFit = false))
      .unionAll(leg(decRank, "ffd", firstFit = true))
      .orderBy(col("strategy"))
  }

  /** DuckDB mirror of [[ffdAudit]]. The next-fit legs fold via
    * list_reduce with the init state PREPENDED (list_reduce's
    * accumulator must share the element type, so items ride as
    * single-element BIGINT lists and the init rides first). The FFD
    * leg CANNOT use list_reduce on this DuckDB (v1.0.0 miscompiles
    * both a lambda nested inside list_reduce's lambda and a
    * list-typed CASE, verified by minimal repros) — it unrolls as a
    * recursive CTE instead, one item per shard per step, with a
    * BRANCHLESS bin update: always append a fresh bin, subtract the
    * doc at coalesce(nullif(first-fit position, 0), len+1) (DuckDB
    * list_position returns 0, not NULL, on no-match), then trim the
    * untouched fresh bin with a scalar-CASE slice bound. */
  def ffdAuditSql(id: String, text: String, budget: Long,
                  shardSize: Int = 4096): String = {
    val tk = TextOps.tokensSql(text)
    val items = "list([n] ORDER BY rk)"
    val nfReduce =
      s"""list_reduce(
            list_prepend(CAST([0, 0] AS BIGINT[]), $items),
            (acc, x) -> CASE WHEN acc[2] >= x[1]
              THEN [acc[1], acc[2] - x[1]]
              ELSE [acc[1] + 1, $budget - x[1]] END)"""
    def nfLeg(order: String, strategy: String) =
      s"""
      SELECT '$strategy' AS strategy,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_bins) AS BIGINT) AS n_bins,
             CAST(SUM(real) AS BIGINT) AS real_tokens,
             CAST(SUM(n_bins) * $budget AS BIGINT) AS capacity_tokens,
             ${CorpusStats.ppmSql(s"SUM(n_bins) * $budget - SUM(real)",
               s"(SUM(n_bins) * $budget)")} AS waste_ppm
      FROM (
        SELECT sid, COUNT(*) AS n_docs, SUM(n) AS real,
               ($nfReduce)[1] AS n_bins
        FROM (
          SELECT (ROW_NUMBER() OVER (ORDER BY $order) - 1)
                   // $shardSize AS sid,
                 ROW_NUMBER() OVER (ORDER BY $order) AS rk,
                 n
          FROM t)
        GROUP BY sid)"""
    s"""
      WITH RECURSIVE t AS (
        SELECT $id AS tid,
               LEAST(CAST(len($tk) AS BIGINT), $budget) AS n
        FROM documents
        WHERE len($tk) > 0),
      rd AS (
        SELECT (ROW_NUMBER() OVER (ORDER BY n DESC, tid) - 1)
                 // $shardSize AS sid,
               ROW_NUMBER() OVER (ORDER BY n DESC, tid)
                 - ((ROW_NUMBER() OVER (ORDER BY n DESC, tid) - 1)
                     // $shardSize) * $shardSize AS j,
               n
        FROM t),
      ffd AS (
        SELECT sid, CAST(0 AS BIGINT) AS j, CAST([] AS BIGINT[]) AS bins
        FROM (SELECT DISTINCT sid FROM rd)
        UNION ALL
        SELECT y.sid, y.j,
          y.upd[1:(y.oldlen +
            CASE WHEN y.cpos = y.oldlen + 1 THEN 1 ELSE 0 END)]
        FROM (
          SELECT x.sid, x.j, x.oldlen, x.cpos,
                 list_concat(list_concat(
                   x.ext[1:(x.cpos) - 1],
                   [x.ext[x.cpos] - x.n]),
                   x.ext[((x.cpos) + 1):]) AS upd
          FROM (
            SELECT f.sid, i.j, i.n, len(f.bins) AS oldlen,
                   coalesce(nullif(list_position(
                     list_transform(f.bins, rr -> rr >= i.n), true), 0),
                     len(f.bins) + 1) AS cpos,
                   list_append(f.bins, CAST($budget AS BIGINT)) AS ext
            FROM ffd f JOIN rd i ON i.sid = f.sid AND i.j = f.j + 1)
            x) y),
      ffd_fin AS (
        SELECT f.sid, len(f.bins) AS n_bins
        FROM ffd f
          JOIN (SELECT sid, MAX(j) AS mj FROM ffd GROUP BY sid) m
            ON f.sid = m.sid AND f.j = m.mj),
      ffd_tot AS (
        SELECT sid, COUNT(*) AS n_docs, SUM(n) AS real
        FROM rd GROUP BY sid)
      SELECT * FROM (
      ${nfLeg("tid", "arrival")}
      UNION ALL
      ${nfLeg("n DESC, tid", "sorted")}
      UNION ALL
      SELECT 'ffd' AS strategy,
             CAST(SUM(ft.n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(ff.n_bins) AS BIGINT) AS n_bins,
             CAST(SUM(ft.real) AS BIGINT) AS real_tokens,
             CAST(SUM(ff.n_bins) * $budget AS BIGINT) AS capacity_tokens,
             ${CorpusStats.ppmSql(s"SUM(ff.n_bins) * $budget - SUM(ft.real)",
               s"(SUM(ff.n_bins) * $budget)")} AS waste_ppm
      FROM ffd_tot ft JOIN ffd_fin ff ON ft.sid = ff.sid)
      ORDER BY strategy"""
  }
}
