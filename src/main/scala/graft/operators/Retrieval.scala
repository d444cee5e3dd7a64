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
               maxDfPpm: Long = 1000000L,
               contribPre: Option[DataFrame] = None): DataFrame = {
    // `contribPre`: the (tok, doc_id, contrib) impact index AT REST
    // (see [[bm25ImpactsCached]]) — in a deployed retrieval system
    // the inverted index IS the persisted artifact; supplying it
    // skips the train-side tokenize + impact build and the probe
    // touches only matching postings.
    val toks = docs.select(col(id).as("doc_id"), isQuery.as("is_q"),
        explode(TextOps.tokens(col(text))).as("tok"))
      .where(col("tok") =!= "")
    val contrib = contribPre.getOrElse(bm25Impacts(toks
      .where(!col("is_q")).select(col("doc_id"), col("tok")), maxDfPpm))
    val qTerms = toks.where(col("is_q"))
      .select(col("doc_id").as("eval_id"), col("tok")).distinct()
    bm25Probe(contrib, qTerms, k)
  }

  /** [[bm25Impacts]] served from the artifact store (the at-rest
    * inverted index): deterministic per (corpus, split, dfPpm cap),
    * so the persisted postings equal an inline rebuild bit-for-bit
    * (spec-pinned in RetrievalSpec). */
  def bm25ImpactsCached(s: org.apache.spark.sql.SparkSession,
                        dir: String, tag: String, train: => DataFrame,
                        id: String, text: String,
                        maxDfPpm: Long = 1000000L): DataFrame =
    graft.util.DiskCache.cached(s, "bm25-impacts", "v1",
      Seq(s"$dir/documents.parquet"), tag, Seq("impacts"),
      params = Seq("id" -> id, "text" -> text,
        "maxDfPpm" -> maxDfPpm.toString)) { tmp =>
        bm25Impacts(train
            .select(col(id).as("doc_id"),
              explode(TextOps.tokens(col(text))).as("tok"))
            .where(col("tok") =!= ""), maxDfPpm)
          .write.mode("overwrite").parquet(s"$tmp/impacts")
    } { b => s.read.parquet(s"$b/impacts") }

  /** The materialized per-(doc, token) impact index over a train-side
    * (doc_id, tok) token relation — the precomputed-impact shape
    * (Lucene impacts / SPLADE-style): score contributions are a
    * property of the corpus alone, so they are computed once, per
    * posting, and every query join replicates only a finished long.
    * Leaving the decimal(38,0) division inside the join's fused
    * stage measured 2× slower end-to-end; at production scale this
    * seam is where the impact index PERSISTS to parquet (and what
    * the d51 streaming gate freezes). Barriered. */
  def bm25Impacts(train: DataFrame,
                  maxDfPpm: Long = 1000000L): DataFrame =
    bm25ImpactsFromPostings(train.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf")), maxDfPpm)

  /** [[bm25Impacts]] derived from an ALREADY-AGGREGATED (doc, tok,
    * tf) postings table — the refresh path c116's maintenance layer
    * exists for: doc lengths are Σtf per doc and df is the posting
    * count per token, so the whole impact table rebuilds from the
    * at-rest postings WITHOUT re-tokenizing a byte of corpus text
    * (c117 proves the equality against a from-scratch oracle). */
  def bm25ImpactsFromPostings(tf: DataFrame,
                              maxDfPpm: Long = 1000000L): DataFrame = {
    val lens = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("len"))
    val totals = lens.agg(count(lit(1)).as("n_train"),
      sum(col("len")).as("tot_len"))
    val dfTok = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      // stopword/skew guard (see maxDfPpm on bm25TopK)
      .where(col("df") * lit(1000000L) <= lit(maxDfPpm) * col("n_train"))
      .withColumn("idf", bitLen(expr("n_train div df")))
    Barriers.barrier(tf
      .join(dfTok, "tok")
      .join(lens, "doc_id")
      .withColumn("w_ppm", expr("""
        CAST((CAST(22 AS DECIMAL(38,0)) * tf * tot_len * 1000000) DIV
             (CAST(10 AS DECIMAL(38,0)) * tf * tot_len
              + CAST(3 AS DECIMAL(38,0)) * tot_len
              + CAST(9 AS DECIMAL(38,0)) * len * n_train) AS BIGINT)"""))
      .select(col("tok"), col("doc_id"),
        (col("idf") * col("w_ppm")).as("contrib")))
  }

  // --- the MAINTAINABLE postings layer under the impact index -------
  /** Raw (doc_id, tok, tf) term-frequency postings — the layer a
    * deployed engine MAINTAINS (Lucene's segment postings): impacts
    * ([[bm25Impacts]]) bake in global df/length stats, so an append
    * invalidates every impact, but the raw postings are PER-DOC
    * independent — an arriving doc's postings are a pure function of
    * its own text, so append == rebuild by construction (the c114
    * print-index theorem on the retrieval side) and impacts refresh
    * FROM the postings without re-tokenizing the corpus. */
  def postings(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("doc_id"),
        explode(TextOps.tokens(col(text))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("long").as("tf"))

  /** Hash buckets for the postings layout (polyHash is portable to
    * the DuckDB oracle, unlike xxhash64). */
  val PostingsBuckets = 16

  private def withBk(p: DataFrame): DataFrame =
    p.withColumn("bk", pmod(TextOps.polyHash(col("tok")),
      lit(PostingsBuckets.toLong)))

  /** The per-bucket APPEND AUDIT for the postings layer (the c114
    * discipline on the retrieval index): what an arrival batch does
    * to each hash bucket — postings before / inserted / arriving
    * docs landing there / tokens NEW to the index (df 0→>0, the rows
    * whose idf must exist after the refresh) / postings after. The
    * insert theorem makes n_after = n_before + n_added exact: the
    * (doc, tok) key spaces are disjoint across corpus and arrivals.
    * All partial-aggregable counts + one bucketed left-anti equi-join
    * for the new-token set; output = PostingsBuckets rows. */
  def postingsAppendAudit(corpusPostings: DataFrame, arrivals: DataFrame,
                          id: String, text: String): DataFrame = {
    import graft.util.Barriers.BarrierOps
    // corpusPostings = the AT-REST layout (doc_id, tok, tf, bk) —
    // what readPostingsIndex-with-partition-column returns (bk is an
    // inferred partition col: normalize its type)
    val cp = corpusPostings.select(col("doc_id"), col("tok"),
      col("tf"), col("bk").cast("long").as("bk"))
    val ap = withBk(postings(arrivals, id, text)).barrier(true)
    val before = cp.groupBy(col("bk"))
      .agg(count(lit(1)).as("n_before"),
        countDistinct(col("tok")).as("n_tokens_before"))
    val newToks = ap.select(col("bk"), col("tok")).distinct()
      .join(cp.select(col("bk"), col("tok")).distinct(),
        Seq("bk", "tok"), "left_anti")
      .groupBy(col("bk")).agg(count(lit(1)).as("n_new_tokens"))
    val added = ap.groupBy(col("bk"))
      .agg(count(lit(1)).as("n_added"),
        countDistinct(col("doc_id")).as("n_docs_new"))
    before.join(added, Seq("bk"), "full")
      .join(newToks, Seq("bk"), "full")
      .select(col("bk"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_tokens_before"), lit(0L)).as("n_tokens_before"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"),
        coalesce(col("n_new_tokens"), lit(0L)).as("n_new_tokens"))
      .withColumn("n_after", col("n_before") + col("n_added"))
      .orderBy(col("bk"))
  }

  /** DuckDB mirror of [[postingsAppendAudit]]. */
  def postingsAppendAuditSql(id: String, text: String,
                             corpusWhere: String,
                             arrivalWhere: String): String = {
    def p(where: String, alias: String) =
      s"""$alias AS (
        SELECT doc_id, tok, COUNT(*) AS tf,
               ${TextOps.polyHashSql("tok")} % ${PostingsBuckets} AS bk
        FROM (SELECT $id AS doc_id,
                     unnest(${TextOps.tokensSql(text)}) AS tok
              FROM documents WHERE $where)
        WHERE tok <> ''
        GROUP BY 1, 2)"""
    s"""
      WITH ${p(corpusWhere, "cp")},
      ${p(arrivalWhere, "ap")},
      before AS (
        SELECT bk, COUNT(*) AS n_before,
               COUNT(DISTINCT tok) AS n_tokens_before
        FROM cp GROUP BY 1),
      newt AS (
        SELECT bk, COUNT(*) AS n_new_tokens FROM (
          SELECT DISTINCT a.bk, a.tok FROM ap a
          WHERE NOT EXISTS (SELECT 1 FROM cp c
                            WHERE c.bk = a.bk AND c.tok = a.tok))
        GROUP BY 1),
      added AS (
        SELECT bk, COUNT(*) AS n_added,
               COUNT(DISTINCT doc_id) AS n_docs_new
        FROM ap GROUP BY 1)
      SELECT bk,
             COALESCE(n_before, 0) AS n_before,
             COALESCE(n_tokens_before, 0) AS n_tokens_before,
             COALESCE(n_added, 0) AS n_added,
             COALESCE(n_docs_new, 0) AS n_docs_new,
             COALESCE(n_new_tokens, 0) AS n_new_tokens,
             COALESCE(n_before, 0) + COALESCE(n_added, 0) AS n_after
      FROM before
        FULL JOIN added USING (bk)
        FULL JOIN newt USING (bk)
      ORDER BY bk"""
  }

  /** PHYSICAL postings layout: (doc_id, tok, tf) partitioned by the
    * token hash bucket, so an impact refresh or a df probe reads
    * only matching buckets. */
  def writePostingsIndex(corpus: DataFrame, id: String, text: String,
                         base: String): Unit =
    withBk(postings(corpus, id, text))
      .write.mode("overwrite").partitionBy("bk")
      .parquet(s"$base/postings")

  def readPostingsIndex(s: org.apache.spark.sql.SparkSession,
                        base: String): DataFrame =
    s.read.parquet(s"$base/postings")
      .select(col("doc_id"), col("tok"), col("tf"))

  /** PHYSICAL postings append — pure INSERT into the arrivals' hash
    * buckets (per-doc independence: append == rebuild of
    * corpus ∪ arrivals, spec-pinned in RetrievalSpec with
    * untouched-bucket byte-identity). IDEMPOTENT at doc granularity
    * and bootstrapping on a missing path, exactly the
    * [[graft.operators.Dedup.appendToPrintIndexDir]] contract
    * (single writer; eager probe before the insert). */
  def appendToPostingsIndexDir(s: org.apache.spark.sql.SparkSession,
                               base: String, newDocs: DataFrame,
                               id: String, text: String): Unit = {
    import graft.util.Barriers.BarrierOps
    val ap = withBk(postings(newDocs, id, text)).barrier(true)
    val touched = ap.select(col("bk")).distinct()
    // Explicit bootstrap check (r15-advice medium), same contract as
    // [[graft.operators.Dedup.appendToPrintIndexDir]]: only a MISSING
    // path bootstraps; an unreadable present index fails loudly.
    val idxPath = new org.apache.hadoop.fs.Path(s"$base/postings")
    val idxFs = idxPath.getFileSystem(
      s.sparkContext.hadoopConfiguration)
    val existing =
      if (!idxFs.exists(idxPath)) None
      else Some(s.read.parquet(s"$base/postings")
        .join(touched, Seq("bk"), "left_semi")
        .select(col("doc_id")).distinct()
        .barrier(true))
    existing.fold(ap)(e => ap.join(e, Seq("doc_id"), "left_anti"))
      .write.mode("append").partitionBy("bk")
      .parquet(s"$base/postings")
  }

  /** Probe the impact index with a (eval_id, tok) distinct term set:
    * broadcast term join + partial-agg sum + the TopK rewrite. */
  def bm25Probe(contrib: DataFrame, qTerms: DataFrame,
                k: Int): DataFrame = {
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
                rrfK: Long = 60L, dim: Int = 16,
                contribPre: Option[DataFrame] = None): DataFrame = {
    val bm = bm25TopK(docs, id, text, isQuery, legK,
      contribPre = contribPre)
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

  /** Per-eval-doc CONTAMINATION REPORT — the datasheet row an eval
    * owner reads (the c100 composition move applied to eval
    * integrity): all four evidence legs the engine has, side by side
    * per eval doc:
    *
    *   - verbatim: an exact content-hash twin exists in train (the
    *     c1 fingerprint);
    *   - near-dup: max exact shingle-Jaccard vs train as integer ppm
    *     + the arg doc (c27's overlap leg, made per-eval-max);
    *   - lexical: BM25 top-1 train doc + integer score (c36);
    *   - dense: cosine top-1 train doc + round-6 sim (c14's provider).
    *
    * verdict folds only the EXACT legs (verbatim > near_dup at tau >
    * clean) — the retrieval legs are evidence columns, not verdict
    * inputs, because their scores have no calibrated threshold (the
    * honest line c71 draws). Missing legs read -1/0.
    *
    * Shape: eval sets are small by construction (the c27 argument),
    * so every leg broadcasts the eval side against one linear train
    * pass; the report join is |eval|-keyed. */
  def contaminationReport(docs: DataFrame, id: String, text: String,
                          isQuery: Column, tau: Double = 0.5,
                          dim: Int = 16): DataFrame = {
    val tagged = docs.select(col(id).as("did"), col(text).as("t"),
      isQuery.as("is_q"))
    contaminationProbe(
      contaminationIndex(tagged.where(!col("is_q")), dim),
      tagged.where(col("is_q")), tau, dim)
  }

  /** The four FROZEN train-side artifacts the report probes, each
    * barriered once — the static seam d51 streams against (in
    * production each persists to parquet next to the corpus):
    * content-hash set, shingle explode + sizes, the BM25 impact
    * index, the train embeddings. `train` must carry (did, t). */
  final case class ContamIndex(trainH: DataFrame, tsh: DataFrame,
                               tsz: DataFrame, impacts: DataFrame,
                               temb: DataFrame)

  def contaminationIndex(train: DataFrame, dim: Int = 16): ContamIndex = {
    val trainH = Barriers.barrier(
      train.select(TextOps.polyHash(col("t")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("nh")))
    val tsh = Barriers.barrier(train.select(col("did").as("tid"),
      explode(TextOps.shingleHashes(col("t"))).as("s")))
    val tsz = Barriers.barrier(
      tsh.groupBy(col("tid")).agg(count(lit(1)).as("nb")))
    val impacts = bm25Impacts(train
      .select(col("did").as("doc_id"),
        explode(TextOps.tokens(col("t"))).as("tok"))
      .where(col("tok") =!= ""))
    val temb = Barriers.barrier(train
      .select(col("did"), TextOps.polyHash(col("t")).as("hh"))
      .select(col("did"),
        transform(graft.functions.VectorOps.mockEmbedding(col("hh"), dim),
          x => x.cast("float")).as("embedding"),
        lit(0).as("label")))
    ContamIndex(trainH, tsh, tsz, impacts, temb)
  }

  /** [[contaminationIndex]] served from the DiskCache
    * corpus-fingerprint seam (the annFits move): the four train-side
    * artifacts are deterministic per (corpus, split), so they build
    * once per corpus version under
    * target/contam-index/<version>/<tag>-<fp> and every later run —
    * batch report (c110) or streaming route's batch contract (d51) —
    * pays only the eval-side probe. `srcPath` is the fingerprinted
    * source; `tag` must encode the train split and dim. */
  def contaminationIndexCached(s: org.apache.spark.sql.SparkSession,
                               srcPath: String, tag: String,
                               train: DataFrame,
                               dim: Int = 16): ContamIndex =
    graft.util.DiskCache.cached(s, "contam-index", "v1",
      Seq(srcPath), tag,
      Seq("trainh", "tsh", "tsz", "impacts", "temb"),
      params = Seq("dim" -> dim.toString)) { tmp =>
      val i = contaminationIndex(train, dim)
      i.trainH.write.mode("overwrite").parquet(s"$tmp/trainh")
      i.tsh.write.mode("overwrite").parquet(s"$tmp/tsh")
      i.tsz.write.mode("overwrite").parquet(s"$tmp/tsz")
      i.impacts.write.mode("overwrite").parquet(s"$tmp/impacts")
      i.temb.write.mode("overwrite").parquet(s"$tmp/temb")
    } { base =>
      ContamIndex(
        s.read.parquet(s"$base/trainh"), s.read.parquet(s"$base/tsh"),
        s.read.parquet(s"$base/tsz"), s.read.parquet(s"$base/impacts"),
        s.read.parquet(s"$base/temb"))
    }

  /** The per-eval report against a prepared [[ContamIndex]]; `eval`
    * must carry (did, t). Only the eval side computes here — the
    * probe's cost tracks the eval set, never the corpus. */
  def contaminationProbe(idx: ContamIndex, eval: DataFrame,
                         tau: Double = 0.5, dim: Int = 16): DataFrame = {
    // verbatim twin
    val evalH = eval.select(col("did").as("eval_id"),
      TextOps.polyHash(col("t")).as("h"))
    val verb = evalH.join(idx.trainH, Seq("h"), "left")
      .select(col("eval_id"),
        when(col("nh").isNotNull, 1L).otherwise(0L).as("verbatim"))
    // near-dup: per-eval max exact Jaccard vs train
    val esh = eval.select(col("did").as("eval_id"),
      explode(TextOps.shingleHashes(col("t"))).as("s"))
    val esz = esh.groupBy(col("eval_id")).agg(count(lit(1)).as("na"))
    val inter = broadcast(esh).join(idx.tsh, "s")
      .groupBy(col("eval_id"), col("tid")).agg(count(lit(1)).as("c"))
    val jBest = inter
      .join(broadcast(esz), "eval_id").join(idx.tsz, "tid")
      .withColumn("j_ppm",
        expr("cast(cast(c as decimal(38,0)) * 1000000 div (na + nb - c) as bigint)"))
      .groupBy(col("eval_id"))
      .agg(max(struct(col("j_ppm"), (-col("tid")).as("nt"))).as("m"))
      .select(col("eval_id"), col("m.j_ppm").as("j_max_ppm"),
        (-col("m.nt")).as("j_arg"))
    // lexical + dense top-1
    val qTerms = eval.select(col("did").as("eval_id"),
        explode(TextOps.tokens(col("t"))).as("tok"))
      .where(col("tok") =!= "").distinct()
    val bm = bm25Probe(idx.impacts, qTerms, k = 1)
      .select(col("eval_id"), col("doc_id").as("bm25_arg"),
        col("score").as("bm25_score"))
    val eEmb = eval
      .select(col("did"), TextOps.polyHash(col("t")).as("hh"))
      .select(col("did"),
        transform(graft.functions.VectorOps.mockEmbedding(col("hh"), dim),
          x => x.cast("float")).as("embedding"),
        lit(0).as("label"))
    val dn = Ann.bruteForceTopK(idx.temb, eEmb, "did", "embedding", 1)
      .select(col("q_id").as("eval_id"), col("n_id").as("dense_arg"),
        col("sim").as("dense_sim"))
    val tauPpm = math.round(tau * 1000000)
    verb
      .join(jBest, Seq("eval_id"), "left")
      .join(bm, Seq("eval_id"), "left")
      .join(dn, Seq("eval_id"), "left")
      .select(col("eval_id"), col("verbatim"),
        coalesce(col("j_max_ppm"), lit(0L)).as("j_max_ppm"),
        coalesce(col("j_arg"), lit(-1L)).as("j_arg"),
        coalesce(col("bm25_score"), lit(0L)).as("bm25_score"),
        coalesce(col("bm25_arg"), lit(-1L)).as("bm25_arg"),
        coalesce(col("dense_sim"), lit(0.0)).as("dense_sim"),
        coalesce(col("dense_arg"), lit(-1L)).as("dense_arg"))
      .withColumn("verdict",
        when(col("verbatim") === 1L, "verbatim")
          .when(col("j_max_ppm") >= tauPpm, "near_dup")
          .otherwise("clean"))
  }

  /** DuckDB mirror of [[contaminationReport]]. */
  def contaminationReportSql(id: String, t: String, evalCond: String,
                             tau: Double = 0.5, dim: Int = 16): String = {
    val tauPpm = math.round(tau * 1000000)
    val sh = TextOps.shingleHashesSql(t)
    s"""
      WITH ev AS (SELECT * FROM documents WHERE $evalCond),
      tr AS (SELECT * FROM documents WHERE NOT ($evalCond)),
      verb AS (
        SELECT e.$id AS eval_id,
               CASE WHEN th.h IS NOT NULL THEN 1 ELSE 0 END AS verbatim
        FROM (SELECT $id, ${TextOps.polyHashSql(t)} AS h FROM ev) e
          LEFT JOIN (SELECT DISTINCT ${TextOps.polyHashSql(t)} AS h
                     FROM tr) th ON th.h = e.h),
      esh AS (SELECT $id AS eval_id, unnest($sh) AS s FROM ev),
      tsh AS (SELECT $id AS tid, unnest($sh) AS s FROM tr),
      esz AS (SELECT eval_id, COUNT(*) AS na FROM esh GROUP BY 1),
      tsz AS (SELECT tid, COUNT(*) AS nb FROM tsh GROUP BY 1),
      inter AS (
        SELECT eval_id, tid, COUNT(*) AS c
        FROM esh JOIN tsh USING (s) GROUP BY 1, 2),
      jbest AS (
        SELECT eval_id, j_ppm AS j_max_ppm, tid AS j_arg FROM (
          SELECT i.eval_id, i.tid,
                 CAST((CAST(c AS HUGEINT) * 1000000)
                   // (na + nb - c) AS BIGINT) AS j_ppm,
                 ROW_NUMBER() OVER (PARTITION BY i.eval_id
                   ORDER BY (CAST(c AS HUGEINT) * 1000000)
                     // (na + nb - c) DESC, i.tid) AS rk
          FROM inter i
            JOIN esz USING (eval_id) JOIN tsz USING (tid)) x
        WHERE rk = 1),
      tt AS (
        SELECT $id AS doc_id, ($evalCond) AS is_q,
               unnest(${TextOps.tokensSql(t)}) AS tok
        FROM documents),
      tk AS (SELECT * FROM tt WHERE tok <> ''),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk
             WHERE NOT is_q GROUP BY 1, 2),
      lens AS (SELECT doc_id, COUNT(*) AS len FROM tk
               WHERE NOT is_q GROUP BY 1),
      totals AS (SELECT COUNT(*) AS n_train,
                        CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
      dft AS (
        SELECT k.tok, k.df, tt2.n_train, tt2.tot_len,
               ${bitLenSql("(tt2.n_train // k.df)")} AS idf
        FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1) k
          CROSS JOIN totals tt2),
      q AS (SELECT DISTINCT doc_id AS eval_id, tok FROM tk WHERE is_q),
      bscored AS (
        SELECT q.eval_id, f.doc_id,
               CAST(SUM(d.idf * CAST(
                 (CAST(22 AS HUGEINT) * f.tf * d.tot_len * 1000000) //
                 (CAST(10 AS HUGEINT) * f.tf * d.tot_len
                  + CAST(3 AS HUGEINT) * d.tot_len
                  + CAST(9 AS HUGEINT) * l.len * d.n_train)
                 AS BIGINT)) AS BIGINT) AS score
        FROM tf f
          JOIN dft d USING (tok)
          JOIN q ON q.tok = f.tok
          JOIN lens l ON l.doc_id = f.doc_id
        GROUP BY 1, 2),
      bm AS (
        SELECT eval_id, doc_id AS bm25_arg, score AS bm25_score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
            ORDER BY score DESC, doc_id) AS rk FROM bscored) x
        WHERE rk = 1),
      emb AS (
        SELECT $id AS doc_id, ($evalCond) AS is_q,
               list_transform(
                 ${graft.functions.VectorOps.mockEmbeddingSql("hh", dim)},
                 x -> CAST(x AS FLOAT)) AS embedding
        FROM (SELECT $id, $t, ${TextOps.polyHashSql(t)} AS hh
              FROM documents) z),
      dn AS (
        SELECT eval_id, doc_id AS dense_arg, sim AS dense_sim FROM (
          SELECT a.doc_id AS eval_id, b.doc_id AS doc_id,
                 ${graft.functions.VectorOps.cosine6Sql("b.embedding",
                   "a.embedding")} AS sim,
                 ROW_NUMBER() OVER (PARTITION BY a.doc_id
                   ORDER BY ${graft.functions.VectorOps.cosine6Sql(
                     "b.embedding", "a.embedding")} DESC, b.doc_id) AS rk
          FROM emb a JOIN emb b ON NOT b.is_q
          WHERE a.is_q) x
        WHERE rk = 1)
      SELECT v.eval_id, CAST(v.verbatim AS BIGINT) AS verbatim,
             CAST(COALESCE(j.j_max_ppm, 0) AS BIGINT) AS j_max_ppm,
             CAST(COALESCE(j.j_arg, -1) AS BIGINT) AS j_arg,
             CAST(COALESCE(bm.bm25_score, 0) AS BIGINT) AS bm25_score,
             CAST(COALESCE(bm.bm25_arg, -1) AS BIGINT) AS bm25_arg,
             COALESCE(dn.dense_sim, 0.0) AS dense_sim,
             CAST(COALESCE(dn.dense_arg, -1) AS BIGINT) AS dense_arg,
             CASE WHEN v.verbatim = 1 THEN 'verbatim'
                  WHEN COALESCE(j.j_max_ppm, 0) >= $tauPpm
                    THEN 'near_dup'
                  ELSE 'clean' END AS verdict
      FROM verb v
        LEFT JOIN jbest j USING (eval_id)
        LEFT JOIN bm USING (eval_id)
        LEFT JOIN dn USING (eval_id)
      ORDER BY v.eval_id"""
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

  /** [[chunkEmbed]] served from the artifact store — the embedded
    * chunk table a deployed RAG corpus keeps next to its IVF index
    * (c44's exact scan and c46's recall baseline share it; float32
    * parquet round-trips exactly, so downstream cosine is
    * bit-identical to the recomputed path — oracle hash-gated). */
  def chunkEmbedCached(s: org.apache.spark.sql.SparkSession,
                       dir: String, tag: String, docs: => DataFrame,
                       id: String, text: String, win: Long,
                       stride: Long, dim: Int): DataFrame =
    graft.util.DiskCache.cached(s, "chunk-embed", "v1",
      Seq(s"$dir/documents.parquet"), tag, Seq("chunks"),
      params = Seq("id" -> id, "text" -> text, "win" -> win.toString,
        "stride" -> stride.toString, "dim" -> dim.toString)) { tmp =>
        chunkEmbed(docs, id, text, win, stride, dim)
          .write.mode("overwrite").parquet(s"$tmp/chunks")
    } { b => s.read.parquet(s"$b/chunks") }

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
