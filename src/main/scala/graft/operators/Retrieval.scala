package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.util.Barriers

/** BM25-shaped sparse retrieval over the token inverted index — the
  * lexical leg of contamination screening and dedup triage (the dense
  * leg is the ANN family). Classic BM25 needs float `ln` for idf and
  * a float length normalization; both are portability cliffs under
  * SURVEY.md §4, so this operator keeps the SHAPE of BM25 with
  * integer-exact weights:
  *
  *   - idf: `bitlen(N div df)` = floor(log2(N/df)) + 1 — the same
  *     rare-term damping curve as log idf, computed as a 40-term
  *     power-of-two fold (exact in both engines; no float log).
  *   - tf normalization: BM25's tf*(k1+1) / (tf + k1*(1-b+b*len/L))
  *     with k1=1.2, b=0.75, multiplied through by 10*L*N into the
  *     all-integer rational
  *       w_ppm = (22*tf*totLen*1e6) div
  *               (10*tf*totLen + 3*totLen + 9*len*N)
  *     evaluated in decimal(38,0)/HUGEINT so the products cannot
  *     overflow at 100 TB token counts (totLen ~ 2.5e13 → ~5e24,
  *     within 38 digits; the quotient is ≤ 2.2e6 and long-safe).
  *   - score(q, d) = Σ_t idf(t) * w_ppm(t, d) — ≤ 40 * 2.2e6 per
  *     term, bounded by the QUERY length per pair: long-safe.
  *
  * Scale shape: tf (corpus tokens) equi-joins len (corpus docs) on
  * doc_id, the query term set joins BROADCAST on token (eval sets
  * are small — c27's contamination pattern), and a df-ppm cap can
  * drop stopwords before the posting-list join (signal filter and
  * skew guard in one — see maxDfPpm). Top-k per query is the
  * row_number ≤ k filter the optimizer rewrites to the TopKPerKey
  * bounded heap. Queries sharing no surviving term with a doc emit
  * no row (standard sparse-retrieval semantics).
  */
object Retrieval {

  /** floor(log2(x)) + 1 for x >= 1, as a power-of-two fold (§4-exact,
    * no float log). */
  def bitLen(x: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(39)), j =>
        when(x >= pow(lit(2.0), j).cast("long"), 1L).otherwise(0L)),
      lit(0L), (acc, b) => acc + b)

  def bitLenSql(x: String): String =
    s"""list_reduce(list_transform(range(0, 40), j ->
        CASE WHEN $x >= CAST(pow(2, j) AS BIGINT)
             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
        (a, b) -> a + b)"""

  /** Top-`k` train docs per query doc by the integer BM25 score.
    * `isQuery` splits `docs` into the query side and the indexed
    * (train) side. Tokens with df*1e6 > maxDfPpm*N are dropped
    * before the posting join — at production scale pass ~500000
    * (df > N/2 is stopword noise AND the hottest join key); the
    * default keeps everything and leans on the bitlen-idf damping
    * (df ≈ N ⇒ idf = 1), which is the right call for narrow
    * vocabularies. Output: (eval_id, rank, doc_id, score, n_terms).
    */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               isQuery: Column, k: Int,
               maxDfPpm: Long = 1000000L): DataFrame = {
    val toks = docs.select(col(id).as("doc_id"), isQuery.as("is_q"),
        explode(TextOps.tokens(col(text))).as("tok"))
      .where(col("tok") =!= "")
    val train = toks.where(!col("is_q"))
    val tf = train.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val lens = train.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val totals = lens.agg(count(lit(1)).as("n_train"),
      sum(col("len")).as("tot_len"))
    val dfTok = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      // stopword/skew guard (see maxDfPpm above)
      .where(col("df") * lit(1000000L) <= lit(maxDfPpm) * col("n_train"))
      .withColumn("idf", bitLen(expr("n_train div df")))
    val qTerms = toks.where(col("is_q"))
      .select(col("doc_id").as("eval_id"), col("tok")).distinct()
    // The per-(doc, token) impact idf*w_ppm is MATERIALIZED before
    // the query join — the precomputed-impact index shape (Lucene
    // impacts / SPLADE-style): score contributions are a property of
    // the corpus alone, so they are computed once, per posting, and
    // the query join replicates only a finished long. Leaving the
    // decimal(38,0) division inside the join's fused stage measured
    // 2× slower end-to-end (the decimal expression drags the whole
    // 10M-row join+partial-agg pipeline), and at production scale
    // this seam is where the impact index persists to parquet.
    val contrib = Barriers.barrier(tf
      .join(dfTok, "tok")
      .join(lens, "doc_id")
      .withColumn("w_ppm", expr("""
        CAST((CAST(22 AS DECIMAL(38,0)) * tf * tot_len * 1000000) DIV
             (CAST(10 AS DECIMAL(38,0)) * tf * tot_len
              + CAST(3 AS DECIMAL(38,0)) * tot_len
              + CAST(9 AS DECIMAL(38,0)) * len * n_train) AS BIGINT)"""))
      .select(col("tok"), col("doc_id"),
        (col("idf") * col("w_ppm")).as("contrib")))
    val scored = contrib
      .join(broadcast(qTerms), "tok")
      .groupBy(col("eval_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("eval_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"), col("n_terms"))
  }

  // --- hybrid (sparse + dense) fusion --------------------------------

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    * of the engine's two retrieval legs: BM25 ([[bm25TopK]], the
    * lexical leg) and dense cosine over the deterministic mock
    * embeddings (c15's provider — the pluggable encoder seam), each
    * producing a top-`legK` rank list per eval doc, fused as
    *
    *   rrf_ppm = Σ_legs 10^6 div (rrfK + rank)
    *
    * — integer-exact (the float 1/(k+r) scaled to ppm; rank-based
    * fusion needs NO score calibration between legs, which is why RRF
    * is the standard hybrid baseline: BM25's integer scores and
    * cosine's [−1,1] never have to be commensurated). A doc absent
    * from a leg contributes 0 from that leg (reported rank 0 =
    * absent). Final top-`k` per eval by (rrf desc, doc_id).
    *
    * Shape at 100 TB: both legs are the engine's existing bounded
    * shapes (BM25's impact join with the broadcast eval term set;
    * dense brute-force with the broadcast eval vectors — the IVF
    * probe replaces it at scale, same output contract); the fusion
    * itself joins two legK·|eval|-row lists full-outer on
    * (eval_id, doc_id) — negligible next to either leg. */
  def hybridRrf(docs: DataFrame, id: String, text: String,
                isQuery: Column, k: Int, legK: Int = 20,
                rrfK: Long = 60L, dim: Int = 16): DataFrame = {
    val bm = bm25TopK(docs, id, text, isQuery, legK)
      .select(col("eval_id"), col("doc_id"),
        col("rank").cast("long").as("bm25_rank"))
    val emb = docs.select(col(id), isQuery.as("is_q"),
        TextOps.polyHash(col(text)).as("h"))
      .select(col(id), col("is_q"),
        transform(graft.functions.VectorOps.mockEmbedding(col("h"), dim),
          x => x.cast("float")).as("embedding"),
        lit(0).as("label"))
    val dense = Ann.bruteForceTopK(emb.where(!col("is_q")),
        emb.where(col("is_q")), id, "embedding", legK)
      .select(col("q_id").as("eval_id"), col("n_id").as("doc_id"),
        col("rank").cast("long").as("dense_rank"))
    val fused = bm.join(dense, Seq("eval_id", "doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr(s"1000000L div ($rrfK + bm25_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($rrfK + dense_rank)"), lit(0L)))
      .withColumn("bm25_rank", coalesce(col("bm25_rank"), lit(0L)))
      .withColumn("dense_rank", coalesce(col("dense_rank"), lit(0L)))
    graft.plans.TopKPerKey(fused, Seq(col("eval_id")),
        Seq(col("rrf_ppm").desc, col("doc_id")), k)
      .select(col("eval_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("rrf_ppm"), col("bm25_rank"), col("dense_rank"))
  }

  // --- dense chunk-granularity retrieval ----------------------------

  /** The chunk-level dense index: documents cut into `win`/`stride`
    * sliding token windows ([[Packing.chunkDocs]]), each chunk
    * embedded with the deterministic mock provider (the pluggable
    * seam a real encoder replaces). Build once per corpus and
    * barrier/persist; at scale this table is what c29's trained IVF
    * partitions into centroid lists. */
  def chunkEmbed(docs: DataFrame, id: String, text: String,
                 win: Long, stride: Long, dim: Int): DataFrame =
    Packing.chunkDocs(docs, id, text, win, stride)
      .select(col(id), col("chunk_id"),
        TextOps.polyHash(col("chunk_text")).as("h"))
      .select(col(id), col("chunk_id"),
        transform(graft.functions.VectorOps.mockEmbedding(col("h"), dim),
          x => x.cast("float")).as("emb"))

  /** Query the chunk index: exact cosine of every (query, chunk)
    * pair with the query side BROADCAST (query batches are small;
    * the chunk table streams map-side), chunks MAX-POOLED to their
    * document (best chunk per (query, doc), ties to the lower chunk
    * id — standard chunk-to-doc pooling), then top-`k` documents per
    * query by best-chunk cosine, with the winning chunk as
    * provenance. Both rank filters are row_number ≤ k — the
    * optimizer rewrites them to TopKPerKey bounded heaps, so no
    * global sort at any size. `queries` must carry (q_id, q_emb). */
  def chunkTopK(chunks: DataFrame, queries: DataFrame, id: String,
                k: Int): DataFrame = {
    import graft.functions.VectorOps
    // norms fold once per chunk / per query, not once per pair —
    // the pair stage then does a single dot-product fold
    val c = chunks.withColumn("c_nrm", VectorOps.norm(col("emb")))
    val q = broadcast(queries
      .withColumn("q_nrm", VectorOps.norm(col("q_emb"))))
    val scored = c.crossJoin(q)
      .select(col("q_id"), col(id), col("chunk_id"),
        VectorOps.cosine6Pre(col("emb"), col("q_emb"),
          col("c_nrm"), col("q_nrm")).as("sim"))
    val wBest = Window.partitionBy(col("q_id"), col(id))
      .orderBy(col("sim").desc, col("chunk_id"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id))
    scored
      .withColumn("c_rk", row_number().over(wBest))
      .where(col("c_rk") === 1).drop("c_rk")
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(id), col("chunk_id"),
        col("sim"))
  }

  /** Corpus for a PERSISTED chunk IVF index ([[Ann.writeIndex]]):
    * c41 chunks embedded ([[chunkEmbed]]) and keyed by the composite
    * `ckey = doc_id * maxChunks + chunk_id`, with the parent doc id
    * riding along as the inverted-list `label` — the chunk-to-doc
    * pooling key stored IN the lists, so a probe never joins back to
    * the corpus. The chunk-count bound is enforced per row
    * (raise_error), so a corpus whose docs out-grow `maxChunks`
    * fails the index BUILD loudly instead of silently aliasing keys. */
  def chunkIndexCorpus(docs: DataFrame, id: String, text: String,
                       win: Long, stride: Long, dim: Int,
                       maxChunks: Long = 64L): DataFrame =
    chunkEmbed(docs, id, text, win, stride, dim)
      .select(
        when(col("chunk_id") < maxChunks,
          col(id) * maxChunks + col("chunk_id"))
          .otherwise(raise_error(concat(
            lit(s"chunk_id >= $maxChunks for doc "), col(id).cast("string"))))
          .as("ckey"),
        col(id).as("label"), col("emb"))

  /** Probe the persisted chunk IVF index — the scale path for
    * chunk-granularity retrieval (c44/d15's exact scan is the parity
    * baseline): each query is assigned to its `nprobe` nearest
    * centroids (broadcast — the centroid table is k rows), and ONLY
    * the probed inverted lists are ranked by exact cosine. The lists
    * scan is partitioned on c_id and the probe side broadcasts, so
    * dynamic partition pruning reads just the probed partitions —
    * per-batch work is O(|batch| * corpus/k * nprobe), independent
    * of total index size in IO terms. Probed chunks are then
    * MAX-POOLED to their document (best chunk per (query, doc), ties
    * to the lower chunk id) and the top-`k` documents per query
    * keep the winning chunk as provenance — both rank filters are
    * row_number <= k, rewritten to TopKPerKey bounded heaps.
    * `queries` must carry (q_id, q_emb); output matches
    * [[chunkTopK]]: (q_id, rank, `id`, chunk_id, sim). */
  def indexedChunkTopK(idx: Ann.IvfIndex, queries: DataFrame,
                       id: String, nprobe: Int, k: Int,
                       maxChunks: Long = 64L): DataFrame = {
    import graft.functions.VectorOps
    val cent = Ann.centTable(idx.centroids, "c_id", "c_vec")
    val queryProbes = Ann.assignToCentroids(
      broadcast(queries.select(col("q_id"), col("q_emb").as("q_vec"),
        VectorOps.norm(col("q_emb")).as("q_nrm"))), cent, "q", nprobe)
    val scored = idx.lists.join(broadcast(queryProbes), "c_id")
      .withColumn("sim", VectorOps.cosine6Pre(col("n_vec"), col("q_vec"),
        col("n_nrm"), col("q_nrm")))
      .withColumn(id, col("label"))
      .withColumn("chunk_id",
        (col("n_id") - col("label") * maxChunks).cast("long"))
    val wBest = Window.partitionBy(col("q_id"), col(id))
      .orderBy(col("sim").desc, col("chunk_id"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(id))
    scored
      .withColumn("c_rk", row_number().over(wBest))
      .where(col("c_rk") === 1).drop("c_rk")
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(id), col("chunk_id"),
        col("sim"))
  }
}
