package graft.operators

import org.apache.spark.sql.functions._
import graft.api.{Q, Suite}
import graft.functions.{TextOps, VectorOps}
import graft.model.Tables
import graft.util.Barriers.BarrierOps

/** C-suite: the training-data pipeline operators (SURVEY.md §2C) —
  * dedup family, ANN, text analysis, multimodal plumbing — run over
  * the documents/embeddings tables with DuckDB oracle mirrors built
  * from the same portable-hash fragments as the Spark plans.
  */
object PipelineSuite extends Suite {

  private val SH = TextOps.shingleHashesSql("text")
  private val COS = VectorOps.cosine6Sql("a.embedding", "b.embedding")

  /** Train-once ANN index artifacts for the embeddings corpus
    * (vec_id >= 5, the c6/c61/c62/c115 family split): coarse k-means
    * centroids (k=8, iters=2 — the IVF/IVFPQ coarse), raw-vector PQ
    * codebooks (8×8×16 — c61's member), residual PQ codebooks
    * (c62's member), and — since v2 — the CODE TABLES AT REST for
    * both (the compressed representation a deployed PQ/IVFPQ index
    * actually scans; encoding per query run was the family's last
    * recomputed artifact). Persisted via the DiskCache
    * corpus-fingerprint seam (c17/c29 precedent, r13-verdict #1): at
    * 100 TB these are index artifacts built once per corpus version,
    * not per-query work. Every producer is deterministic (§4), so
    * the persisted tables are bit-identical to a recompute — the
    * residual chain trains/encodes against the PERSISTED coarse and
    * codebook floats so the parity chain never forks. */
  private[graft] def annFits(s: org.apache.spark.sql.SparkSession,
                             d: String): Ann.Fits =
    graft.util.DiskCache.cached(s, "ann-fits", "v2",
      Seq(s"$d/embeddings.parquet"), "ge5-k8i2-pq8x8x16",
      Seq("coarse", "pqraw", "pqresid", "codes_raw", "codes_resid")) {
      tmp =>
      val corpus = Tables.embeddings(s, d).where(col("vec_id") >= 5)
      Ann.kmeansFit(corpus, "vec_id", "embedding", k = 8, iters = 2)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/coarse")
      Ann.pqFit(corpus, "vec_id", "embedding", m = 8, subDim = 8,
          k = 16, iters = 2)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/pqraw")
      Ann.pqCodes(corpus, "vec_id", "embedding",
          s.read.parquet(s"$tmp/pqraw"), m = 8, subDim = 8)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/codes_raw")
      val resid = Ann.ivfpqResiduals(corpus, "vec_id", "embedding",
        s.read.parquet(s"$tmp/coarse"))
      Ann.pqFit(resid, "vec_id", "embedding", m = 8, subDim = 8,
          k = 16, iters = 2)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/pqresid")
      Ann.pqCodes(resid, "vec_id", "embedding",
          s.read.parquet(s"$tmp/pqresid"), m = 8, subDim = 8)
        .join(resid.select(col("vec_id").as("vid"), col("c_id"),
          col("vn")), "vid")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/codes_resid")
    } { base =>
      Ann.Fits(
        coarse = Some(s.read.parquet(s"$base/coarse")),
        pqRaw = Some(s.read.parquet(s"$base/pqraw")),
        pqResid = Some(s.read.parquet(s"$base/pqresid")),
        rawCodes = Some(s.read.parquet(s"$base/codes_raw")),
        residCodes = Some(s.read.parquet(s"$base/codes_resid")))
    }

  val c1 = Q(
    "c1_dedup_exact",
    (s, d) => Dedup.exactClusters(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("fingerprint")),
    Some(s"""
      SELECT ${TextOps.polyHashSql("text")} AS fingerprint,
             COUNT(*) AS cluster_size, MIN(doc_id) AS keeper
      FROM documents
      GROUP BY 1
      ORDER BY fingerprint"""))

  val c2 = Q(
    "c2_dedup_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", 0.5)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH sh AS (
        SELECT doc_id, unnest($SH) AS s
        FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
      FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
      WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5
      ORDER BY id_a, id_b"""))

  val c3 = Q(
    "c3_dedup_minhash",
    (s, d) => Dedup.minHashCandidates(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH sigs AS (
        SELECT doc_id, ${TextOps.minHashSignatureSql(SH, 16)} AS sig
        FROM documents),
      banded AS (
        SELECT doc_id, sig, t.b AS band_idx,
               list_slice(sig, t.b * 4 + 1, t.b * 4 + 4) AS band_val
        FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             CAST(len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i])) AS DOUBLE) / 16 AS est_jaccard
      FROM cand
      ORDER BY id_a, id_b"""))

  val c4 = Q(
    "c4_dedup_simhash",
    (s, d) => Dedup.simHashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)
      .withColumn("hamming", col("hamming").cast("long"))
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      WITH sims AS (
        SELECT doc_id, ${TextOps.simHash30Sql("sh")} AS s
        FROM (SELECT doc_id, $SH AS sh FROM documents)),
      banded AS (
        SELECT doc_id, s, t.b AS band_idx,
               (s // CAST(pow(2, 8 * t.b) AS BIGINT)) % 256 AS band_val
        FROM sims CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.s AS sh_a, b.s AS sh_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, sh_a, sh_b,
             CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(sh_a, sh_b)) <= 3
      ORDER BY id_a, id_b"""))

  val c5 = Q(
    "c5_dedup_embedding",
    (s, d) => Dedup.embeddingPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.40)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, $COS AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE $COS >= 0.40
      ORDER BY id_a, id_b"""))

  val c6 = Q(
    "c6_ann_bruteforce",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.bruteForceTopK(
          e.where(col("vec_id") >= 5), e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      SELECT q_id, rank, n_id, label, sim FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS n_id, b.label,
               ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} DESC,
                          b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON b.vec_id >= 5
        WHERE a.vec_id < 5) t
      WHERE rank <= 5
      ORDER BY q_id, rank"""))

  val c7 = Q(
    "c7_ann_lsh",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.lshTopK(
          e.where(col("vec_id") >= 5), e.where(col("vec_id") < 5),
          "vec_id", "embedding", bits = 8, k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      SELECT q_id, rank, n_id, bucket, sim FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               ${Ann.lshBucketSql("b.embedding", 8)} AS bucket,
               ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} DESC,
                          b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b
          ON b.vec_id >= 5
         AND ${Ann.lshBucketSql("b.embedding", 8)} = ${Ann.lshBucketSql("a.embedding", 8)}
        WHERE a.vec_id < 5) t
      WHERE rank <= 5
      ORDER BY q_id, rank"""))

  val c8 = Q(
    "c8_lang_id",
    (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextQuality.langId(col("text")).as("predicted"),
        col("lang").as("actual"),
        (TextQuality.langId(col("text")) === col("lang")).as("is_match"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             ${TextQuality.langIdSql("text")} AS predicted,
             lang AS actual,
             (${TextQuality.langIdSql("text")} = lang) AS is_match
      FROM documents
      ORDER BY doc_id"""))

  val c9 = Q(
    "c9_quality_score",
    (s, d) => TextQuality.qualityFeatures(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""${TextQuality.qualityFeaturesSql("doc_id", "text")}
      ORDER BY doc_id"""))

  val c10 = Q(
    "c10_token_count",
    (s, d) => TextQuality.tokenCounts(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS bpe_chunks,
        CAST(length(text) AS BIGINT) AS n_chars_measured
      FROM documents
      ORDER BY doc_id"""))

  val c11 = Q(
    "c11_fingerprint",
    (s, d) => TextQuality.fingerprints(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
        ${TextOps.polyHashSql("text")} AS full_hash,
        list_aggregate($SH, 'min') AS min_shingle_hash,
        list_aggregate($SH, 'max') AS max_shingle_hash
      FROM documents
      ORDER BY doc_id"""))

  val c12 = Q(
    "c12_multimodal_stub",
    (s, d) => Multimodal.decodeStub(
        Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text"))
      .orderBy(col("doc_id")),
    // Oracle recomputes the deterministic fake features from the text
    // (payload is ascii): verifies the binary plumbing end-to-end.
    Some(s"""
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS byte_len,
        list_reduce(list_transform(range(1, length(text) + 1),
          i -> CAST(ascii(text[i]) AS BIGINT)), (a, b) -> a + b) % 256 AS checksum,
        CAST((n_chars % 640 + 1) * ((n_chars * 7) % 480 + 1) AS BIGINT) AS pixels
      FROM documents
      ORDER BY doc_id"""))

  val c13 = Q(
    "c13_ann_ivf",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.ivfTopK(
          corpus = e.where(col("vec_id") >= 13),
          queries = e.where(col("vec_id") >= 8 && col("vec_id") < 13),
          centroids = e.where(col("vec_id") < 8),
          "vec_id", "embedding", nprobe = 2, k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH cent AS (
        SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
      corp AS (
        SELECT n_id, c_id, n_emb FROM (
          SELECT n.vec_id AS n_id, n.embedding AS n_emb, c.c_id,
            ROW_NUMBER() OVER (PARTITION BY n.vec_id
              ORDER BY ${VectorOps.cosine6Sql("n.embedding", "c.c_emb")} DESC,
                       c.c_id) AS rk
          FROM embeddings n, cent c WHERE n.vec_id >= 13) t
        WHERE rk = 1),
      probes AS (
        SELECT q_id, c_id, q_emb FROM (
          SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.c_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${VectorOps.cosine6Sql("q.embedding", "c.c_emb")} DESC,
                       c.c_id) AS rk
          FROM embeddings q, cent c WHERE q.vec_id >= 8 AND q.vec_id < 13) t
        WHERE rk <= 2)
      SELECT q_id, rank, n_id, c_id, sim FROM (
        SELECT p.q_id, n.n_id, n.c_id,
          ${VectorOps.cosine6Sql("n.n_emb", "p.q_emb")} AS sim,
          ROW_NUMBER() OVER (PARTITION BY p.q_id
            ORDER BY ${VectorOps.cosine6Sql("n.n_emb", "p.q_emb")} DESC,
                     n.n_id) AS rank
        FROM corp n JOIN probes p ON n.c_id = p.c_id) t
      WHERE rank <= 5
      ORDER BY q_id, rank"""))

  val c14 = Q(
    "c14_mock_embed",
    // mie's embedding pipeline with the deterministic mock provider
    // (embedding.go:113): text -> hash-seeded vector + its norm. The
    // library API stays array-valued (VectorOps.mockEmbedding); the
    // driver-checked projection explodes dims to scalar rows because
    // the driver's pandas compare can't hash array cells.
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), TextOps.polyHash(col("text")).as("h"))
      .select(col("doc_id"), col("h"),
        round(sqrt(aggregate(VectorOps.mockEmbedding(col("h"), 8),
          lit(0.0), (a, x) => a + x * x)), 6).as("nrm"))
      .select(col("doc_id"), col("nrm"),
        posexplode(VectorOps.mockEmbedding(col("h"), 8))
          .as(Seq("dim_idx", "dim_raw")))
      .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"),
        round(col("dim_raw"), 6).as("value"), col("nrm"))
      .orderBy(col("doc_id"), col("dim_idx")),
    Some(s"""
      WITH emb AS (
        SELECT doc_id, ${VectorOps.mockEmbeddingSql("h", 8)} AS e
        FROM (SELECT doc_id, ${TextOps.polyHashSql("text")} AS h FROM documents) t)
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS dim_idx,
        round(e[i], 6) AS value,
        round(sqrt(list_reduce(list_transform(e, x -> x * x),
          (a, b) -> a + b)), 6) AS nrm
      FROM emb, (SELECT unnest(range(1, 9)) AS i) idx
      ORDER BY doc_id, dim_idx"""))

  val c15 = Q(
    "c15_text_ann",
    // End-to-end text similarity: text -> deterministic embedding
    // (cast to float32, the storage dtype) -> brute-force top-3 via
    // the TopKPerKey custom plan. Composes TextOps + VectorOps + Ann.
    (s, d) => {
      val emb = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.polyHash(col("text")).as("h"))
        .select(col("doc_id"),
          transform(VectorOps.mockEmbedding(col("h"), 16),
            x => x.cast("float")).as("embedding"),
          lit(0).as("label"))
      Ann.bruteForceTopK(
          emb.where(col("doc_id") >= 3), emb.where(col("doc_id") < 3),
          "doc_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH emb AS (
        SELECT doc_id,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS embedding
        FROM (SELECT doc_id, ${TextOps.polyHashSql("text")} AS h FROM documents) t)
      SELECT q_id, rank, n_id, sim FROM (
        SELECT a.doc_id AS q_id, b.doc_id AS n_id,
               ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY a.doc_id
                 ORDER BY ${VectorOps.cosine6Sql("b.embedding", "a.embedding")} DESC,
                          b.doc_id) AS rank
        FROM emb a JOIN emb b ON b.doc_id >= 3
        WHERE a.doc_id < 3) t
      WHERE rank <= 3
      ORDER BY q_id, rank"""))

  val c16 = Q(
    "c16_dedup_apply",
    // Resolve near-dup pairs into transitive clusters (distributed CC)
    // and pick the keeper: the end-to-end "dedup this corpus" op.
    (s, d) => Dedup.deduplicate(Tables.documents(s, d), "doc_id", "text", 0.5)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a)
      SELECT n AS doc_id, LEAST(n, MIN(m)) AS keeper
      FROM reach
      GROUP BY n
      ORDER BY doc_id"""))

  // --- shared DuckDB mirror of Ann.kmeansFit ------------------------
  // (used by c17 and c29; expects `corpus(vec_id, embedding)` in
  // scope). pick{n} assigns each corpus vector to its nearest
  // centroid of cent{n-1}; one Lloyd iteration rebuilds cent{n} via
  // the per-dim FIXED-POINT mean: floor(x * 2^30) per member (exact
  // for floats), exact integer sum, divide back in double — mirrors
  // Ann.kmeansFit bit-for-bit.
  private[operators] def kmeansPickSql(prev: String, n: Int,
                                       rel: String = "corpus"): String = s"""
      pick$n AS (
        SELECT vec_id, cid FROM (
          SELECT v.vec_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY ${VectorOps.cosine6Sql("v.embedding", "c.cv")}
                     DESC, c.cid) AS rk
          FROM $rel v CROSS JOIN $prev c) t
        WHERE rk = 1)"""

  private[operators] def kmeansIterSql(prev: String, n: Int,
                                       dim: Int = 64,
                                       rel: String = "corpus"): String =
    s"""${kmeansPickSql(prev, n, rel)},
      upd$n AS (
        SELECT p.cid, t.i,
               CAST(SUM(CAST(FLOOR(CAST(v.embedding[t.i] AS DOUBLE)
                     * 1073741824.0) AS HUGEINT)) AS DOUBLE)
                 / (COUNT(*) * 1073741824.0) AS m
        FROM pick$n p JOIN $rel v USING (vec_id)
          CROSS JOIN range(1, ${dim + 1}) t(i)
        GROUP BY p.cid, t.i),
      cent$n AS (
        SELECT cid, list_transform(list(m ORDER BY i),
                 x -> CAST(x AS FLOAT)) AS cv
        FROM upd$n GROUP BY cid)"""

  /** cent0 (k lowest-id seeds) + `iters` Lloyd iterations + the final
    * corpus assignment pick{iters+1} over cent{iters}. */
  private[operators] def kmeansCtes(k: Int, iters: Int,
                                    dim: Int = 64): String = {
    val iterCtes = (1 to iters)
      .map(i => kmeansIterSql(s"cent${i - 1}", i, dim)).mkString(",\n      ")
    s"""cent0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
               embedding AS cv
        FROM (SELECT vec_id, embedding FROM corpus ORDER BY vec_id LIMIT $k)),
      $iterCtes,
      ${kmeansPickSql(s"cent$iters", iters + 1)}"""
  }

  val c17 = Q(
    "c17_ann_ivf_trained",
    // IVF with TRAINED centroids: 2 Lloyd iterations (deterministic,
    // §4-exact — see Ann.kmeansFit), then the c13 probe path, graded
    // as recall@5 per query against the exact brute-force baseline.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val corpus = e.where(col("vec_id") >= 5)
      val queries = e.where(col("vec_id") < 5)
      val cent = Ann.kmeansFit(corpus, "vec_id", "embedding", k = 8, iters = 2)
      val ivf = Ann.ivfTopK(corpus, queries, cent, "vec_id", "embedding",
        nprobe = 2, k = 5)
      val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
        k = 5)
      exact.alias("e")
        .join(ivf.alias("i"),
          col("e.q_id") === col("i.q_id") && col("e.n_id") === col("i.n_id"),
          "left")
        .groupBy(col("e.q_id").as("q_id"))
        .agg(round(sum(when(col("i.n_id").isNotNull, 1).otherwise(0))
          .cast("double") / 5, 6).as("recall"))
        .orderBy(col("q_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid) AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 2),
      ivf AS (
        SELECT q_id, n_id FROM (
          SELECT p.q_id, a.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY p.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            a.vec_id) AS rk
          FROM qprobe p
            JOIN pick3 a ON a.cid = p.cid
            JOIN corpus v ON v.vec_id = a.vec_id
            JOIN queries q ON q.vec_id = p.q_id) t
        WHERE rk <= 5),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5)
      SELECT e.q_id,
             round(CAST(SUM(CASE WHEN i.n_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6)
               AS recall
      FROM exact e LEFT JOIN ivf i ON i.q_id = e.q_id AND i.n_id = e.n_id
      GROUP BY e.q_id
      ORDER BY e.q_id"""
    })

  val c18 = Q(
    "c18_audio_frames",
    // Audio-frame windowing over raw PCM-style blobs (real DSP on the
    // byte payload — frame energy + zero crossings; frameSize=128
    // samples, hop=64). The float step (rms) stays in the engines'
    // round(sqrt()) parity; everything upstream is exact integers.
    (s, d) => Multimodal.audioFrames(
        Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text"),
        frameSize = 128, hop = 64)
      .orderBy(col("doc_id"), col("frame_idx")),
    Some("""
      WITH samp AS (
        SELECT doc_id,
          list_transform(range(1, len(text)//2 + 1),
            i -> ascii(text[2*i-1]) + 256*ascii(text[2*i]) - 16384) AS s
        FROM documents),
      frames AS (
        -- frame-index bound derived from each doc's own sample count
        -- (lateral generate_series), so the oracle covers EVERY full
        -- frame at any document length / scale factor
        SELECT doc_id, f AS frame_idx,
               list_slice(s, f*64 + 1, f*64 + 128) AS fr
        FROM (SELECT doc_id, s, unnest(generate_series(0, len(s)//64)) AS f
              FROM samp) t
        WHERE f*64 + 128 <= len(s))
      SELECT doc_id, frame_idx,
        list_reduce(list_transform(fr, x -> CAST(x*x AS BIGINT)),
          (a,b) -> a + b) AS sum_sq,
        CAST(len(list_filter(range(2, 129), i -> fr[i-1]*fr[i] < 0))
          AS BIGINT) AS zero_crossings,
        round(sqrt(CAST(list_reduce(list_transform(fr,
            x -> CAST(x*x AS BIGINT)), (a,b) -> a + b) AS DOUBLE) / 128), 6)
          AS rms
      FROM frames ORDER BY doc_id, frame_idx"""))

  val c19 = Q(
    "c19_curate",
    // The end-to-end curation pipeline: quality gate (>= 0.63) →
    // exact dedup → near-dup dedup (Jaccard >= 0.5) → annotated
    // survivors. One entry exercising the composed scale shapes.
    (s, d) => Curate.curate(Tables.documents(s, d), "doc_id", "text",
        minQuality = 0.63, tau = 0.5)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH RECURSIVE q AS (${TextQuality.qualityFeaturesSql("doc_id", "text")}),
      surv AS (
        SELECT d.doc_id, d.text, q.n_tokens, q.quality
        FROM documents d JOIN q USING (doc_id)
        WHERE q.quality >= 0.63),
      ex AS (
        SELECT *, MIN(doc_id) OVER (
          PARTITION BY ${TextOps.polyHashSql("text")}) AS ex_keeper
        FROM surv),
      s2 AS (SELECT doc_id, text, n_tokens, quality
             FROM ex WHERE doc_id = ex_keeper),
      sh AS (SELECT doc_id, unnest($SH) AS s FROM s2),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
      dropped AS (
        SELECT n AS doc_id FROM reach
        GROUP BY n
        HAVING LEAST(n, MIN(m)) <> n)
      SELECT doc_id, n_tokens, quality FROM s2
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
      ORDER BY doc_id"""))

  val c60 = Q(
    "c60_curation_funnel",
    // c19's ops report: per-stage survivor counts + token mass of the
    // same curation pipeline (raw -> quality gate -> exact dedup ->
    // near-dup dedup) — the funnel a pipeline owner actually watches
    // (a gate suddenly dropping 40% of a source is an incident, not
    // a setting). Same stages and parameters as c19, plus four
    // one-row aggregates over the shared barriered feature table.
    (s, d) => Curate.funnel(Tables.documents(s, d), "doc_id", "text",
      minQuality = 0.63, tau = 0.5),
    Some(s"""
      WITH RECURSIVE q AS (${TextQuality.qualityFeaturesSql("doc_id", "text")}),
      surv AS (
        SELECT d.doc_id, d.text, q.n_tokens, q.quality
        FROM documents d JOIN q USING (doc_id)
        WHERE q.quality >= 0.63),
      ex AS (
        SELECT *, MIN(doc_id) OVER (
          PARTITION BY ${TextOps.polyHashSql("text")}) AS ex_keeper
        FROM surv),
      s2 AS (SELECT doc_id, text, n_tokens, quality
             FROM ex WHERE doc_id = ex_keeper),
      sh AS (SELECT doc_id, unnest($SH) AS s FROM s2),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
      dropped AS (
        SELECT n AS doc_id FROM reach
        GROUP BY n
        HAVING LEAST(n, MIN(m)) <> n),
      near AS (SELECT doc_id, n_tokens FROM s2
               WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
               COUNT(*) AS n_docs,
               CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens
        FROM q
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'quality_gate', COUNT(*),
               CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
        FROM surv
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'exact_dedup', COUNT(*),
               CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
        FROM s2
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'neardup_dedup', COUNT(*),
               CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
        FROM near)
      ORDER BY stage"""))

  /** PQ CTE chain (sub-vector split, per-subspace L2 Lloyd, codes) —
    * assumes `corpus`/`queries` CTEs; mirrors Ann.pqFit/pqCodes.
    * `prefix` renames every generated CTE (subn → {p}subn, …) so two
    * instances — raw-vector and residual codebooks — can coexist in
    * ONE query (the c115 pareto mirror composes both). */
  private[operators] def pqCtes(mSub: Int, subDim: Int, k: Int,
                     iters: Int, from: String = "corpus",
                     prefix: String = ""): String = {
    def dotS(a: String, b: String) = VectorOps.dotSql(a, b)
    val p = prefix
    val iterCtes = (1 to iters).map { i =>
      s"""${p}ppick$i AS (
        SELECT vid, m, cid, vm FROM (
          SELECT s.vec_id AS vid, s.m, c.cid, s.vm,
                 ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                   ORDER BY round((s.nv + c.cn) -
                     2.0 * ${dotS("s.vm", "c.cv")}, 6) ASC, c.cid) AS rk
          FROM ${p}subn s JOIN ${p}pcent${i - 1} c ON s.m = c.m) t
        WHERE rk = 1),
      ${p}pupd$i AS (
        SELECT p.m, p.cid, t.i,
               CAST(SUM(CAST(FLOOR(CAST(p.vm[t.i] AS DOUBLE)
                     * 1073741824.0) AS HUGEINT)) AS DOUBLE)
                 / (COUNT(*) * 1073741824.0) AS mu
        FROM ${p}ppick$i p CROSS JOIN range(1, ${subDim + 1}) t(i)
        GROUP BY p.m, p.cid, t.i),
      ${p}pcent$i AS (
        SELECT m, cid, cv, ${dotS("cv", "cv")} AS cn FROM (
          SELECT m, cid, list_transform(list(mu ORDER BY i),
                   x -> CAST(x AS FLOAT)) AS cv
          FROM ${p}pupd$i GROUP BY m, cid))"""
    }.mkString(",\n      ")
    s"""${p}subn AS (
        SELECT vec_id, m,
               embedding[m * $subDim + 1 : (m + 1) * $subDim] AS vm,
               ${dotS(s"embedding[m * $subDim + 1 : (m + 1) * $subDim]",
                 s"embedding[m * $subDim + 1 : (m + 1) * $subDim]")}
                 AS nv
        FROM (SELECT *, unnest(range(0, $mSub)) AS m FROM $from)),
      ${p}seeds AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
        FROM (SELECT vec_id FROM $from ORDER BY vec_id LIMIT $k)),
      ${p}pcent0 AS (
        SELECT s.m, d.cid, s.vm AS cv, s.nv AS cn
        FROM ${p}subn s JOIN ${p}seeds d USING (vec_id)),
      $iterCtes,
      ${p}codes AS (
        SELECT vid, m, cid AS code FROM (
          SELECT s.vec_id AS vid, s.m, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                   ORDER BY round((s.nv + c.cn) -
                     2.0 * ${dotS("s.vm", "c.cv")}, 6) ASC, c.cid) AS rk
          FROM ${p}subn s JOIN ${p}pcent$iters c ON s.m = c.m) t
        WHERE rk = 1)"""
  }

  val c61 = Q(
    "c61_pq_ann",
    // Product quantization with ADC (Jegou et al. 2011) — the
    // compressed-domain ANN shape that beats scalar quantization
    // (c24) at equal bits: 64 dims split into 8 subspaces of 8,
    // each with its own 16-centroid L2-Lloyd codebook (deterministic:
    // round-6 (na+nb-2dot) assignment, exact fixed-point means);
    // a vector at rest is then 8 SMALL CODES + its stored norm
    // (ADC ranks by approximate COSINE adc/(|x||q|) — without the
    // stored norm, large-norm vectors dominate), and a query scan is a
    // per-subspace table LOOKUP against the broadcast K x M dot
    // table — the original floats are never touched after encoding,
    // which is what makes a 100 TB vector scan fit in memory. The
    // per-(q, vid) sum folds through the exact decimal so it is
    // order-independent (§4); ADC shortlists the top-50 candidates
    // from codes alone, ONLY those fetch their floats for an exact
    // cosine rescore, and the final top-5 ranks by the exact score
    // (c24's candidates->rescore funnel: the scan reduction comes
    // from codes, the quantization error is bought back on k<<n
    // rows) + exact-top-5 membership flag per row (the recall
    // evidence).
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val corpus = e.where(col("vec_id") >= 5)
      val queries = e.where(col("vec_id") < 5)
      // codebooks AND the code table at rest served from the
      // train-once DiskCache seam (annFits — deterministic,
      // bit-identical to an inline refit/re-encode)
      val fits = annFits(s, d)
      Ann.pqTopK(corpus, queries, fits.pqRaw.get, "vec_id", "embedding",
          m = 8, subDim = 8, k = 5, codesPre = fits.rawCodes)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${pqCtes(mSub = 8, subDim = 8, k = 16, iters = 2)},
      qsub AS (
        SELECT vec_id, m,
               embedding[m * 8 + 1 : (m + 1) * 8] AS vm
        FROM (SELECT *, unnest(range(0, 8)) AS m FROM queries)),
      qtab AS (
        SELECT q.vec_id AS q_id, q.m, c.cid,
               ${VectorOps.dotSql("q.vm", "c.cv")} AS dt
        FROM qsub q JOIN pcent2 c ON q.m = c.m),
      norms AS (
        SELECT vec_id AS vid,
               sqrt(${VectorOps.dotSql("embedding", "embedding")}) AS vn
        FROM corpus),
      qnorms AS (
        SELECT vec_id AS q_id,
               sqrt(${VectorOps.dotSql("embedding", "embedding")}) AS qn
        FROM queries),
      scores AS (
        SELECT s.q_id, s.vid,
               round(s.adc_ip / (n.vn * qq.qn), 6) AS adc6
        FROM (
          SELECT t.q_id, codes.vid,
                 CAST(SUM(CAST(FLOOR(dt * 1073741824.0) AS HUGEINT))
                   AS DOUBLE) / 1073741824.0 AS adc_ip
          FROM codes JOIN qtab t ON codes.m = t.m AND codes.code = t.cid
          GROUP BY 1, 2) s
          JOIN norms n ON n.vid = s.vid
          JOIN qnorms qq ON qq.q_id = s.q_id),
      rankedpq AS (
        SELECT * FROM (
          SELECT q_id, vid, adc6,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc6 DESC, vid) AS rank
          FROM scores) t
        WHERE rank <= 50),
      rescored AS (
        SELECT * FROM (
          SELECT r.q_id, r.vid, r.adc6,
                 ${cos("v.embedding", "q.embedding")} AS sim,
                 ROW_NUMBER() OVER (PARTITION BY r.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            r.vid) AS frank
          FROM rankedpq r
            JOIN corpus v ON v.vec_id = r.vid
            JOIN queries q ON q.vec_id = r.q_id) t
        WHERE frank <= 5),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5)
      SELECT r.q_id, CAST(r.frank AS BIGINT) AS rank, r.vid AS n_id,
             r.adc6, r.sim,
             e.n_id IS NOT NULL AS in_exact
      FROM rescored r
        LEFT JOIN exact e ON e.q_id = r.q_id AND e.n_id = r.vid
      ORDER BY r.q_id, rank"""
    })

  val c62 = Q(
    "c62_ivfpq",
    // IVF + residual PQ composed — the FAISS IVFPQ layout, i.e. THE
    // 100 TB vector index: coarse k-means lists (c17's trainer), each
    // vector stored as (list id, PQ codes of v - c_coarse, norm) —
    // residuals concentrate around 0 so the same code budget
    // quantizes far tighter than raw vectors; query probes nprobe=2
    // lists, approximate IP = <q, c_coarse> (exact, one per probed
    // list) + residual ADC lookups, stored-norm cosine ranking, ADC
    // top-50 -> exact rescore -> top-5 with the in_exact recall flag.
    // Only probed lists are scored — candidates bounded by
    // construction (c29's pruning composed with c61's compressed
    // scan).
    (s, d) => {
      val e = Tables.embeddings(s, d)
      // coarse centroids, residual codebooks and the at-rest code
      // table from the train-once DiskCache seam (annFits) — the
      // 100 TB index-artifact shape; every producer deterministic,
      // so results are bit-identical to the inline compute
      val fits = annFits(s, d)
      Ann.ivfpqTopK(e.where(col("vec_id") >= 5),
          e.where(col("vec_id") < 5), "vec_id", "embedding",
          kCoarse = 8, m = 8, subDim = 8, kSub = 16, iters = 2,
          nprobe = 2, k = 5,
          coarsePre = fits.coarse, cbPre = fits.pqResid,
          codesPre = fits.residCodes)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      def dotS(a: String, b: String) = VectorOps.dotSql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      resid AS (
        SELECT p.vec_id, p.cid AS c_id,
               sqrt(${dotS("v.embedding", "v.embedding")}) AS vn,
               list_transform(range(1, 65),
                 i -> CAST(CAST(v.embedding[i] AS DOUBLE)
                        - CAST(c.cv[i] AS DOUBLE) AS FLOAT))
                 AS embedding
        FROM pick3 p
          JOIN corpus v USING (vec_id)
          JOIN cent2 c ON p.cid = c.cid),
      ${pqCtes(mSub = 8, subDim = 8, k = 16, iters = 2,
        from = "resid")},
      codes2 AS (
        SELECT c.vid, c.m, c.code, r.c_id, r.vn
        FROM codes c JOIN resid r ON r.vec_id = c.vid),
      qprobes AS (
        SELECT q_id, cid AS c_id FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 2),
      qpre AS (
        SELECT p.q_id, p.c_id,
               sqrt(${dotS("q.embedding", "q.embedding")}) AS qn,
               ${dotS("q.embedding", "c.cv")} AS qc,
               list_transform(range(1, 65),
                 i -> CAST(CAST(q.embedding[i] AS DOUBLE)
                        - CAST(c.cv[i] AS DOUBLE) AS FLOAT))
                 AS embedding
        FROM qprobes p
          JOIN queries q ON q.vec_id = p.q_id
          JOIN cent2 c ON c.cid = p.c_id),
      qtab AS (
        SELECT s.q_id, s.c_id, s.m, c.cid,
               ${dotS("s.vm", "c.cv")} AS dt
        FROM (SELECT q_id, c_id, m,
                     embedding[m * 8 + 1 : (m + 1) * 8] AS vm
              FROM (SELECT *, unnest(range(0, 8)) AS m FROM qpre)) s
          JOIN pcent2 c ON s.m = c.m),
      scores AS (
        SELECT s.q_id, s.vid,
               round((qp.qc + s.adc_r) / (s.vn * qp.qn), 6) AS adc6
        FROM (
          SELECT t.q_id, c.vid, c.c_id, c.vn,
                 CAST(SUM(CAST(FLOOR(dt * 1073741824.0) AS HUGEINT))
                   AS DOUBLE) / 1073741824.0 AS adc_r
          FROM codes2 c JOIN qtab t
            ON c.m = t.m AND c.code = t.cid AND c.c_id = t.c_id
          GROUP BY 1, 2, 3, 4) s
          JOIN qpre qp ON qp.q_id = s.q_id AND qp.c_id = s.c_id),
      rankedpq AS (
        SELECT * FROM (
          SELECT q_id, vid, adc6,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc6 DESC, vid) AS rank
          FROM scores) t
        WHERE rank <= 50),
      rescored AS (
        SELECT * FROM (
          SELECT r.q_id, r.vid, r.adc6,
                 ${cos("v.embedding", "q.embedding")} AS sim,
                 ROW_NUMBER() OVER (PARTITION BY r.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            r.vid) AS frank
          FROM rankedpq r
            JOIN corpus v ON v.vec_id = r.vid
            JOIN queries q ON q.vec_id = r.q_id) t
        WHERE frank <= 5),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5)
      SELECT r.q_id, CAST(r.frank AS BIGINT) AS rank, r.vid AS n_id,
             r.adc6, r.sim,
             e.n_id IS NOT NULL AS in_exact
      FROM rescored r
        LEFT JOIN exact e ON e.q_id = r.q_id AND e.n_id = r.vid
      ORDER BY r.q_id, rank"""
    })

  val c20 = Q(
    "c20_neardup_novelty",
    // The streaming-shaped dedup decision, batch-replayed: novel iff
    // no earlier doc claimed any of the doc's MinHash band buckets
    // (state O(buckets), no pair join — the online ingest filter).
    // Streaming flavor: Streams.bandClaimStreaming (StreamsSpec).
    (s, d) => Dedup.nearDupNovelty(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH sigs AS (
        SELECT doc_id, ${TextOps.minHashSignatureSql(SH, 16)} AS sig
        FROM documents),
      banded AS (
        SELECT doc_id, t.b AS band_idx,
               list_slice(sig, t.b * 4 + 1, t.b * 4 + 4) AS band_val
        FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t),
      w AS (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_idx, band_val)
                 AS mn
        FROM banded)
      SELECT doc_id,
             CAST(MIN(CASE WHEN doc_id = mn THEN 1 ELSE 0 END) AS BIGINT)
               AS novel
      FROM w
      GROUP BY doc_id
      ORDER BY doc_id"""))

  // Deterministic PII injection shared by the c21 Spark/oracle sides:
  // the synthetic corpus has no PII, so the fixture appends a fake
  // email (always), phone (doc_id%3==0) and id number (doc_id%5==0) —
  // redaction counts then vary per doc and the scrub is non-vacuous.
  private def withPii(doc: org.apache.spark.sql.DataFrame) = {
    val aug = concat(col("text"),
      lit(" reach user"), col("doc_id").cast("string"),
      lit("@mail.example.com"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" or +1-415-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" acct AB"),
          (pmod(col("doc_id"), lit(900000)) + 100000).cast("string")))
        .otherwise(lit("")))
    doc.select(col("doc_id"), aug.as("text"))
  }

  // NOTE: oracle strings pass through stripMargin — never start a
  // continuation line with `||` (the first `|` would be stripped).
  private val withPiiSql: String =
    """(text || ' reach user' || CAST(doc_id AS VARCHAR) ||
       '@mail.example.com' ||
       CASE WHEN doc_id % 3 = 0
            THEN ' or +1-415-555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END ||
       CASE WHEN doc_id % 5 = 0
            THEN ' acct AB' || CAST(doc_id % 900000 + 100000 AS VARCHAR)
            ELSE '' END)"""

  val c21 = Q(
    "c21_pii_scrub",
    // Per-row regex redaction — pure map, codegen'd regexp_replace
    // chain, no shuffle from the operator (the sort is the driver's
    // output-determinism projection).
    (s, d) => TextQuality.piiScrub(withPii(Tables.documents(s, d)),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""
      ${TextQuality.piiScrubSql("doc_id", withPiiSql)}
      ORDER BY doc_id"""))

  val c22 = Q(
    "c22_repetition_signals",
    // Gopher-style repetition quality: dup token/2-gram/3-gram
    // fractions + top-token mass, per-row only. Composed into the
    // curation gate via Curate.curate(maxDup3gram=...).
    (s, d) => TextQuality.repetitionSignals(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""
      ${TextQuality.repetitionSignalsSql("doc_id", "text")}
      ORDER BY doc_id"""))

  private val c23Quotas =
    Map("en" -> 20, "de" -> 50, "fr" -> 50, "zh" -> 50, "es" -> 50)

  val c23 = Q(
    "c23_stratified_sample",
    // Deterministic hash-quota sampling per language stratum
    // (downsample over-represented 'en' to 20%, others to 50%). The
    // sampling itself is map-only (Sampling.stratifiedSample); the
    // per-stratum aggregate here is the verification projection.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sampled = Sampling.stratifiedSample(docs, col("lang"),
        col("doc_id"), c23Quotas)
      val totals = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      val agg = sampled.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("doc_id")).as("sampled_id_sum"))
      totals.join(agg, Seq("lang"), "left")
        .select(col("lang"), col("n_total"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("sampled_id_sum"), lit(0L)).as("sampled_id_sum"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH sampled AS (
        SELECT doc_id, lang FROM documents
        WHERE ${Sampling.bucketSql("lang", "doc_id")}
              < ${Sampling.quotaSql("lang", c23Quotas)}),
      tot AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY 1),
      sa AS (SELECT lang, COUNT(*) AS n_sampled,
                    CAST(SUM(doc_id) AS BIGINT) AS sampled_id_sum
             FROM sampled GROUP BY 1)
      SELECT lang, n_total,
             COALESCE(n_sampled, 0) AS n_sampled,
             COALESCE(sampled_id_sum, 0) AS sampled_id_sum
      FROM tot LEFT JOIN sa USING (lang)
      ORDER BY lang"""))

  val c24 = Q(
    "c24_quantized_ann",
    // int8 scalar quantization + exact rescore (Ann.quantizedTopK):
    // per-dim min/max from the corpus -> 1-byte codes -> integer-dot
    // candidate scan (top 3k per query, bounded heap) -> exact float
    // cosine rescore of the candidates only. Graded as recall@5 per
    // query against the exact brute-force baseline, like c17.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val corpus = e.where(col("vec_id") >= 5)
      val queries = e.where(col("vec_id") < 5)
      val qa = Ann.quantizedTopK(corpus, queries, "vec_id", "embedding",
        k = 5)
      val exact = Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding",
        k = 5)
      exact.alias("e")
        .join(qa.alias("i"),
          col("e.q_id") === col("i.q_id") && col("e.n_id") === col("i.n_id"),
          "left")
        .groupBy(col("e.q_id").as("q_id"))
        .agg(round(sum(when(col("i.n_id").isNotNull, 1).otherwise(0))
          .cast("double") / 5, 6).as("recall"))
        .orderBy(col("q_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      corpusn AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding")})
                 AS nv
        FROM corpus),
      queriesn AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding")})
                 AS nv
        FROM queries),
      mm AS (
        SELECT MAX(abs(x)) / CAST(127 AS DOUBLE) AS scale
        FROM (SELECT unnest(nv) AS x FROM corpusn)),
      cq AS (
        SELECT vec_id,
               list_transform(nv, x -> least(greatest(
                 CAST(floor(x / m.scale) AS BIGINT), -127), 127)) AS qv
        FROM corpusn CROSS JOIN mm m),
      qq AS (
        SELECT vec_id,
               list_transform(nv, x -> least(greatest(
                 CAST(floor(x / m.scale) AS BIGINT), -127), 127)) AS qv
        FROM queriesn CROSS JOIN mm m),
      cand AS (
        SELECT q_id, n_id FROM (
          SELECT b.vec_id AS q_id, a.vec_id AS n_id,
            ROW_NUMBER() OVER (PARTITION BY b.vec_id
              ORDER BY list_reduce(list_transform(range(1, 65),
                         j -> a.qv[j] * b.qv[j]), (x, y) -> x + y) DESC,
                       a.vec_id) AS rk
          FROM cq a CROSS JOIN qq b) t
        WHERE rk <= 15),
      approx AS (
        SELECT q_id, n_id FROM (
          SELECT cand.q_id, cand.n_id,
            ROW_NUMBER() OVER (PARTITION BY cand.q_id
              ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                       cand.n_id) AS rank
          FROM cand
            JOIN corpus v ON v.vec_id = cand.n_id
            JOIN queries q ON q.vec_id = cand.q_id) t
        WHERE rank <= 5),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5)
      SELECT e.q_id,
             round(CAST(SUM(CASE WHEN i.n_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6)
               AS recall
      FROM exact e LEFT JOIN approx i ON i.q_id = e.q_id AND i.n_id = e.n_id
      GROUP BY e.q_id
      ORDER BY e.q_id"""
    })

  val c25 = Q(
    "c25_incremental_dedup",
    // The daily production shape: near-dup keep/drop for a NEW batch
    // (doc_id%10 >= 8) against the already-ingested corpus, with no
    // corpus recompute — the corpus's shingle sets and LSH band
    // buckets come from a PERSISTED index (built once per corpus
    // fingerprint, read back from parquet). Candidates are banded
    // equi-joins (batch x index, batch x batch), the exact-Jaccard
    // verify touches candidates only. The oracle is the full exact
    // pair set restricted to batch-incident pairs — i.e. incremental
    // must equal what a from-scratch dedup would decide for the batch.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val batch = docs.where(pmod(col("doc_id"), lit(10)) >= 8)
      val idx = graft.util.DiskCache.cached(s, "dedup-index", "v2",
        Seq(s"$d/documents.parquet"), "mod10lt8-k48b24",
        Seq("shingles", "bands")) { tmp =>
        Dedup.writeIndex(corpus, "doc_id", "text", k = 48, bands = 24, tmp)
      } { base => Dedup.readIndex(s, base) }
      Dedup.incrementalDedup(idx, batch, "doc_id", "text", tau = 0.5)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH sh AS (SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s
        WHERE b.doc_id % 10 >= 8
          AND (a.doc_id % 10 < 8 OR a.doc_id < b.doc_id)
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      blk AS (SELECT id_b AS doc_id, MIN(id_a) AS dup_of
              FROM pairs GROUP BY 1)
      SELECT d.doc_id AS doc_id,
             CAST(CASE WHEN b.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS keep,
             COALESCE(b.dup_of, -1) AS dup_of
      FROM (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8) d
        LEFT JOIN blk b ON d.doc_id = b.doc_id
      ORDER BY d.doc_id"""))

  val c26 = Q(
    "c26_domain_mix",
    // Per-source token budget + sampling shares (raw proportional +
    // alpha=0.5 temperature-flattened) — one partial-aggregable
    // groupBy; totals joined as a broadcast one-row aggregate.
    (s, d) => CorpusStats.domainMix(Tables.documents(s, d), "source", "text")
      .orderBy(col("source")),
    Some(s"""
      ${CorpusStats.domainMixSql("source", "text")}
      ORDER BY source"""))

  val c27 = Q(
    "c27_contamination",
    // Eval-set decontamination: training docs sharing >= 10% of an
    // eval doc's distinct shingles (eval set = doc_id % 37 = 0,
    // broadcast side of the shingle join).
    (s, d) => CorpusStats.contamination(Tables.documents(s, d),
        "doc_id", "text", pmod(col("doc_id"), lit(37)) === 0,
        minOverlap = 0.1)
      .orderBy(col("train_id"), col("eval_id")),
    Some(s"""
      ${CorpusStats.contaminationSql("doc_id", "text", "doc_id % 37 = 0", 0.1)}
      ORDER BY train_id, eval_id"""))

  val c28 = Q(
    "c28_lm_surprisal",
    // Per-doc mean unigram surprisal in whole bits against the
    // corpus's own term stats — integer-exact (bin-length, no float
    // log); the perplexity-proxy quality score.
    (s, d) => CorpusStats.unigramSurprisal(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""
      ${CorpusStats.unigramSurprisalSql("doc_id", "text")}
      ORDER BY doc_id"""))

  val c29 = Q(
    "c29_ann_index_probe",
    // Index-once / probe-many ANN: the trained IVF index (k-means
    // centroids + centroid-PARTITIONED inverted lists with vectors
    // and norms stored in-list) is built once per corpus fingerprint
    // (DiskCache, like the c25 dedup band index) and the query is
    // the PROBE path only: broadcast centroid assignment + a join
    // that dynamic-partition-prunes the lists scan to the probed
    // centroids. The oracle rebuilds the same deterministic index
    // from scratch — cached and fresh builds are bit-identical.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val corpus = e.where(col("vec_id") >= 5)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(corpus, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { base => Ann.readIndex(s, base) }
      Ann.indexedTopK(idx, e.where(col("vec_id") < 5), "vec_id",
          "embedding", nprobe = 2, k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid) AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 2)
      SELECT q_id, rank, n_id, c_id, sim FROM (
        SELECT p.q_id, a.vec_id AS n_id, p.cid AS c_id,
               ${cos("v.embedding", "q.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                 ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                          a.vec_id) AS rank
        FROM qprobe p
          JOIN pick3 a ON a.cid = p.cid
          JOIN corpus v ON v.vec_id = a.vec_id
          JOIN queries q ON q.vec_id = p.q_id) t
      WHERE rank <= 5
      ORDER BY q_id, rank"""
    })

  val c30 = Q(
    "c30_substring_dedup",
    // ExactSubstr-style span dedup: pairs sharing at least one exact
    // 16-token window (rolling window hashes, bucket-capped at 32
    // docs — see Dedup.substringPairs).
    (s, d) => Dedup.substringPairs(Tables.documents(s, d), "doc_id",
        "text", w = 16, maxBucket = 32)
      .orderBy(col("id_a"), col("id_b")),
    Some {
      val th = s"""list_transform(${TextOps.tokensSql("text")},
        tok -> ${TextOps.polyHashSql("tok")})"""
      s"""
      WITH th AS (SELECT doc_id, $th AS th FROM documents),
      wh AS (SELECT doc_id,
               unnest(list_distinct(${TextOps.ngramHashesSql("th", 16)}))
                 AS h
             FROM th),
      sizes AS (SELECT h, COUNT(*) AS nb FROM wh GROUP BY 1),
      ok AS (SELECT wh.doc_id, wh.h FROM wh
             JOIN sizes USING (h) WHERE nb <= 32)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      ORDER BY id_a, id_b"""
    })

  val c31 = Q(
    "c31_vocab_stats",
    // Zipf-head vocabulary snapshot + whole-vocab QA numbers
    // (distinct / hapax / total) — see CorpusStats.vocabStats.
    (s, d) => CorpusStats.vocabStats(Tables.documents(s, d), "doc_id",
        "text", topK = 20)
      .orderBy(col("rank")),
    Some(s"""
      ${CorpusStats.vocabStatsSql("doc_id", "text", 20)}
      ORDER BY rank"""))

  val c32 = Q(
    "c32_mix_apply",
    // c26's temperature mixture APPLIED as a deterministic resample:
    // per-source ppm quotas from the flattened shares of a 50% token
    // budget, stable-hash keep decisions, per-source audit output
    // (Sampling.applyMixture).
    (s, d) => Sampling.applyMixture(Tables.documents(s, d), "source",
        "doc_id", "text", budgetPpm = 500000L)
      .orderBy(col("source")),
    Some(s"""
      ${Sampling.applyMixtureSql("source", "doc_id", "text", 500000L)}
      ORDER BY source"""))

  val c33 = Q(
    "c33_heavy_hitters",
    // Deterministic Count-Min heavy-hitter estimates next to c31's
    // exact Zipf head: the sketch is ONE pass over the token stream
    // folding to D×W=1024 counters with map-side combine (the shape
    // that replaces the exact vocab groupBy when the vocabulary
    // itself is too wide to shuffle), probes are broadcast lookups,
    // and the estimate-vs-exact overshoot is graded in-query. All
    // integer; see Sketches.cmBucket for the portable hash family.
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, d).select(
        explode(TextOps.tokenHashesSeq(col("text"))).as("th"))
      val sketch = toks.select(Sketches.cmPairs(col("th")).as("ib"))
        .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
        .agg(count(lit(1)).as("c"))
      val vocab = toks.groupBy(col("th")).agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("cnt").desc, col("th"))
      val top = vocab.orderBy(col("cnt").desc, col("th")).limit(20)
        .withColumn("rank", row_number().over(w).cast("long"))
      val probes = top.select(col("rank"), col("th"), col("cnt"),
        Sketches.cmPairs(col("th")).as("ib"))
      probes.join(broadcast(sketch),
          probes("ib.i") === sketch("i") && probes("ib.b") === sketch("b"))
        .groupBy(col("rank"), col("th"), col("cnt"))
        .agg(min(col("c")).as("cm_est"))
        .select(col("rank"), col("th"), col("cnt"), col("cm_est"),
          (col("cm_est") - col("cnt")).as("cm_over"))
        .orderBy(col("rank"))
    },
    Some {
      val tk = TextOps.tokensSql("text")
      s"""
      WITH toks AS (
        SELECT unnest(list_transform($tk,
          tok -> ${TextOps.polyHashSql("tok")})) AS th
        FROM documents),
      salts AS (SELECT * FROM ${Sketches.cmSaltsSql("v")}),
      ib AS (
        SELECT s.i, ((t.th * s.a + s.ab) % ${TextOps.P}) % ${Sketches.CmW}
                 AS b
        FROM toks t CROSS JOIN salts s),
      sketch AS (SELECT i, b, COUNT(*) AS c FROM ib GROUP BY 1, 2),
      vocab AS (SELECT th, COUNT(*) AS cnt FROM toks GROUP BY 1),
      top AS (SELECT th, cnt,
                     ROW_NUMBER() OVER (ORDER BY cnt DESC, th) AS rank
              FROM vocab ORDER BY cnt DESC, th LIMIT 20),
      probes AS (
        SELECT t.rank, t.th, t.cnt, s.i,
               ((t.th * s.a + s.ab) % ${TextOps.P}) % ${Sketches.CmW} AS b
        FROM top t CROSS JOIN salts s),
      est AS (
        SELECT rank, th, cnt, MIN(c) AS cm_est
        FROM probes JOIN sketch USING (i, b)
        GROUP BY 1, 2, 3)
      SELECT CAST(rank AS BIGINT) AS rank, th, cnt, cm_est,
             cm_est - cnt AS cm_over
      FROM est ORDER BY rank"""
    })

  val c34 = Q(
    "c34_bloom_membership",
    // Bloom-filter n-gram membership for an arriving batch — novel-
    // shingle detection, the cheap pre-screen in front of c25's
    // incremental dedup and c27's decontamination: the corpus's
    // distinct 3-gram shingle hashes fold to ≤ M set-bit positions
    // (broadcastable by construction — the corpus is scanned once
    // and never reshuffled per probe batch), every distinct batch
    // shingle probes its K bits map-side, and the exact membership
    // count is computed alongside so the sketch's (deterministic)
    // false positives are visible in-query: per doc, n_shingles >=
    // n_maybe_known >= n_known and n_maybe_known - n_known = Bloom
    // false positives; no false negatives by construction.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isBatch = pmod(col("doc_id"), lit(10)) >= 8
      def toks(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"),
        explode(array_distinct(
          TextOps.shingleHashes(col("text")))).as("k"))
      val vocab = toks(docs.where(!isBatch)).select(col("k")).distinct()
      val bits = vocab.select(Sketches.bloomBits(col("k")).as("bit"))
        .distinct()
      val probes = toks(docs.where(isBatch))
      val maybe = probes
        .select(col("doc_id"), col("k"),
          Sketches.bloomBits(col("k")).as("bit"))
        .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("bit"), "left")
        .groupBy(col("doc_id"), col("k"))
        .agg(when(sum(coalesce(col("hit"), lit(0L))) === Sketches.BloomK,
          1L).otherwise(0L).as("mk"))
      maybe
        .join(broadcast(vocab.withColumn("ex", lit(1L))), Seq("k"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(col("mk")).as("n_maybe_known"),
          sum(coalesce(col("ex"), lit(0L))).as("n_known"))
        .orderBy(col("doc_id"))
    },
    Some {
      val salts = (0 until Sketches.BloomK)
        .map(i => s"($i, ${Sketches.CmA(i)}, ${Sketches.CmB(i)})")
        .mkString("(VALUES ", ", ", ") AS v(i, a, ab)")
      s"""
      WITH tok AS (
        SELECT doc_id, doc_id % 10 >= 8 AS is_batch,
               unnest(list_distinct(${TextOps.shingleHashesSql("text")}))
                 AS k
        FROM documents),
      vocab AS (SELECT DISTINCT k FROM tok WHERE NOT is_batch),
      salts AS (SELECT * FROM $salts),
      bits AS (SELECT DISTINCT ${Sketches.bloomBitSql("k", "a", "ab")} AS bit
               FROM vocab CROSS JOIN salts),
      pb AS (SELECT doc_id, k, ${Sketches.bloomBitSql("k", "a", "ab")} AS bit
             FROM tok CROSS JOIN salts WHERE is_batch),
      mb AS (SELECT pb.doc_id, pb.k,
                    CASE WHEN COUNT(b.bit) = ${Sketches.BloomK}
                         THEN 1 ELSE 0 END AS mk
             FROM pb LEFT JOIN bits b ON pb.bit = b.bit
             GROUP BY 1, 2)
      SELECT doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(mk) AS BIGINT) AS n_maybe_known,
             CAST(SUM(CASE WHEN k IN (SELECT k FROM vocab)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_known
      FROM mb GROUP BY 1 ORDER BY doc_id"""
    })

  val c35 = Q(
    "c35_cluster_profile",
    // Corpus clustering profile — the "what's in my corpus" pass a
    // curation pipeline runs before mixing: deterministic Lloyd
    // centroids (c17's trainer) over ALL embeddings, every vector
    // assigned map-side against the broadcast centroids, then
    // per-cluster size / label diversity / dominant label. The
    // assignment is a fold-argmax over a ONE-ROW broadcast centroid
    // array (strict > with the array sorted by cid = ties to the
    // lower centroid id, same total order as c17's window), so the
    // corpus is scanned ONCE with no per-vector shuffle at all — the
    // only shuffle is the (cid, label) partial agg whose output is
    // bounded by k x |labels|; both report aggregates derive from
    // that tiny frame. Cluster quality is visible as the
    // dominant-label mass; ties rank (count desc, label) — total
    // order, oracle-mirrored.
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
      val cent = Ann.kmeansFit(e, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        .withColumn("cn", VectorOps.norm(col("cv")))
      val assigned = Ann.argmaxAssign(
          e.select(col("vec_id").as("vid"), col("embedding").as("v"),
            col("label")), "v", cent)
        .select(col("cid"), col("label"))
      // one materialization of the k x |labels| histogram: both report
      // aggregates branch from it, and without the barrier the join's
      // isnotnull(cid) pushes into only one branch, defeating AQE
      // exchange reuse — the corpus would be scanned twice
      val byLabel = assigned.groupBy(col("cid"), col("label"))
        .agg(count(lit(1)).as("ln")).barrier(true)
      val sizes = byLabel.groupBy(col("cid"))
        .agg(sum(col("ln")).as("n_members"),
          count(lit(1)).as("n_labels"))
      val wl = Window.partitionBy(col("cid"))
        .orderBy(col("ln").desc, col("label"))
      val top = byLabel
        .withColumn("rk", row_number().over(wl))
        .where(col("rk") === 1)
        .select(col("cid"), col("label").cast("long").as("top_label"),
          col("ln").as("top_label_n"))
      sizes.join(top, "cid").orderBy(col("cid"))
    },
    Some(s"""
      WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
      ${kmeansCtes(k = 8, iters = 2)},
      lab AS (
        SELECT p.cid, e.label
        FROM pick3 p JOIN embeddings e USING (vec_id)),
      by_label AS (
        SELECT cid, label, COUNT(*) AS ln FROM lab GROUP BY 1, 2),
      top AS (
        SELECT cid, CAST(label AS BIGINT) AS top_label,
               ln AS top_label_n
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                ORDER BY ln DESC, label) AS rk
              FROM by_label) t
        WHERE rk = 1),
      sizes AS (
        SELECT cid, COUNT(*) AS n_members,
               COUNT(DISTINCT label) AS n_labels
        FROM lab GROUP BY 1)
      SELECT s.cid, s.n_members, s.n_labels, t.top_label, t.top_label_n
      FROM sizes s JOIN top t USING (cid)
      ORDER BY cid"""))

  val c36 = Q(
    "c36_bm25_retrieval",
    // BM25-shaped lexical retrieval (Retrieval.bm25TopK): eval docs
    // (doc_id%101 — ~1% of the corpus) as queries, top-5 train docs
    // each by the INTEGER BM25 score — bitlen idf (no float log),
    // tf normalization multiplied through to a decimal(38,0)-exact
    // rational. The synthetic corpus is a 31-token vocabulary where
    // every token is hot, so the df-ppm stopword cap stays open and
    // the bitlen idf does the damping (df≈N ⇒ idf 1; df=N/20 ⇒ 5).
    // The lexical leg of contamination triage next to the ANN
    // family's dense leg.
    // Since r15 the impact index comes AT REST (shared with c104 —
    // same train split, same df cap); the query pays tokenize-the-
    // evals + the posting probe only.
    (s, d) => {
      val docs = Tables.documents(s, d)
      Retrieval.bm25TopK(docs, "doc_id", "text",
          pmod(col("doc_id"), lit(101)) === 0, k = 5,
          contribPre = Some(Retrieval.bm25ImpactsCached(s, d,
            "mod101ne0-df1m",
            docs.where(pmod(col("doc_id"), lit(101)) =!= 0),
            "doc_id", "text")))
        .orderBy(col("eval_id"), col("rank"))
    },
    Some(s"""
      WITH tt AS (
        SELECT doc_id, (doc_id % 101 = 0) AS is_q,
               unnest(${TextOps.tokensSql("text")}) AS tok
        FROM documents),
      tk AS (SELECT * FROM tt WHERE tok <> ''),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk
             WHERE NOT is_q GROUP BY 1, 2),
      lens AS (SELECT doc_id, COUNT(*) AS len FROM tk
               WHERE NOT is_q GROUP BY 1),
      totals AS (SELECT COUNT(*) AS n_train,
                        CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
      dft AS (
        SELECT k.tok, k.df, t.n_train, t.tot_len,
               ${Retrieval.bitLenSql("(t.n_train // k.df)")} AS idf
        FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1) k
          CROSS JOIN totals t
        WHERE k.df * 1000000 <= 1000000 * t.n_train),
      q AS (SELECT DISTINCT doc_id AS eval_id, tok FROM tk WHERE is_q),
      scored AS (
        SELECT q.eval_id, f.doc_id,
               CAST(SUM(d.idf * CAST(
                 (CAST(22 AS HUGEINT) * f.tf * d.tot_len * 1000000) //
                 (CAST(10 AS HUGEINT) * f.tf * d.tot_len
                  + CAST(3 AS HUGEINT) * d.tot_len
                  + CAST(9 AS HUGEINT) * l.len * d.n_train)
                 AS BIGINT)) AS BIGINT) AS score,
               COUNT(*) AS n_terms
        FROM tf f
          JOIN dft d USING (tok)
          JOIN q ON q.tok = f.tok
          JOIN lens l ON l.doc_id = f.doc_id
        GROUP BY 1, 2)
      SELECT eval_id, CAST(rank AS BIGINT) AS rank, doc_id, score,
             n_terms
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
              ORDER BY score DESC, doc_id) AS rank
            FROM scored) t
      WHERE rank <= 5
      ORDER BY eval_id, rank"""))

  val c37 = Q(
    "c37_sequence_pack",
    // Training-sequence packing (Packing.packOffsets): concatenate
    // the corpus in doc_id order, chop into 512-token sequences,
    // report each doc's global offset / sequence / position and
    // whether it straddles a boundary. The global prefix sum is the
    // two-level distributed scan (parallel within-bucket windows +
    // a tiny bucket-total scan) — NOT the single-partition global
    // window the oracle can afford.
    (s, d) => Packing.packOffsets(Tables.documents(s, d), "doc_id",
        "text", budget = 512L)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH t AS (
        SELECT doc_id,
               CAST(len(${TextOps.tokensSql("text")}) AS BIGINT)
                 AS n_tokens
        FROM documents),
      o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS "offset"
        FROM t)
      SELECT doc_id, n_tokens, "offset",
             "offset" // 512 AS seq_id,
             "offset" % 512 AS seq_pos,
             CAST(CASE WHEN ("offset" + n_tokens - 1) // 512
                       <> "offset" // 512 THEN 1 ELSE 0 END AS BIGINT)
               AS crosses
      FROM o
      ORDER BY doc_id"""))

  val c38 = Q(
    "c38_quantile_hist",
    // Exact per-language token-length percentiles (p50/p90/p99,
    // nearest-rank) WITHOUT a global sort: token counts live on a
    // bounded integer domain, so the histogram (groupBy value —
    // partial-aggregable, output ≤ |langs|×|domain|) plus a cumsum
    // over the tiny histogram IS the exact quantile — the
    // distributed replacement for approx_percentile when the domain
    // is bounded (counts, lengths, scores-in-ppm). Nearest-rank =
    // smallest value whose running count reaches ceil(q·n) — integer
    // arithmetic only, no interpolation, oracle-mirrored.
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.documents(s, d)
        .select(col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang"), col("n")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("lang"))
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("tot", sum(col("cnt")).over(wTot))
      def q(ppm: Long): org.apache.spark.sql.Column =
        // nearest-rank: smallest n with cum >= ceil(ppm*tot/1e6)
        min(when(col("cum") >=
          expr(s"($ppm * tot + 999999) div 1000000"), col("n")))
      cum.groupBy(col("lang"))
        .agg(max(col("tot")).as("n_docs"),
          q(500000L).as("p50"), q(900000L).as("p90"), q(990000L).as("p99"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH t AS (
        SELECT lang,
               CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n
        FROM documents),
      hist AS (SELECT lang, n, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
      cum AS (
        SELECT lang, n, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY n
                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY lang) AS tot
        FROM hist)
      SELECT lang, CAST(MAX(tot) AS BIGINT) AS n_docs,
        CAST(MIN(CASE WHEN cum >= (500000 * tot + 999999) // 1000000
          THEN n END) AS BIGINT) AS p50,
        CAST(MIN(CASE WHEN cum >= (900000 * tot + 999999) // 1000000
          THEN n END) AS BIGINT) AS p90,
        CAST(MIN(CASE WHEN cum >= (990000 * tot + 999999) // 1000000
          THEN n END) AS BIGINT) AS p99
      FROM cum
      GROUP BY lang
      ORDER BY lang"""))

  val c39 = Q(
    "c39_semdedup",
    // SemDeDup (Dedup.semDedup): cluster the embedding space with
    // c17's deterministic Lloyd trainer, then search near-dup pairs
    // ONLY within each cluster — Σ|cluster|² pair work instead of
    // |n|², every cluster an independent task, and the assignment is
    // the map-side fold-argmax (the corpus never shuffles for it).
    // Same τ as c5's global exact pass, so the two operators bracket
    // the published recall trade: c39 finds the same-cluster subset
    // of c5's pairs at a fraction of the pair work.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = Ann.kmeansFit(e, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        .withColumn("cn", VectorOps.norm(col("cv")))
      Dedup.semDedup(e, "vec_id", "embedding", cent, tau = 0.40)
        .orderBy(col("vec_id"))
    },
    Some {
      val cos = VectorOps.cosine6Sql("l.embedding", "r.embedding")
      s"""
      WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
      ${kmeansCtes(k = 8, iters = 2)},
      pairs AS (
        SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b, $cos AS sim
        FROM pick3 a
          JOIN pick3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN embeddings l ON l.vec_id = a.vec_id
          JOIN embeddings r ON r.vec_id = b.vec_id
        WHERE $cos >= 0.40),
      ranked AS (
        SELECT cid, id_b AS vec_id, id_a AS dup_of, sim,
               COUNT(*) OVER (PARTITION BY id_b) AS n_dups,
               ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) AS rk
        FROM pairs)
      SELECT cid, vec_id, dup_of, sim, n_dups
      FROM ranked WHERE rk = 1
      ORDER BY vec_id"""
    })

  val c40 = Q(
    "c40_importance_select",
    // DSIR-style hashed importance selection
    // (CorpusStats.importanceSelect): the 'en' split is the target
    // distribution, every other doc is raw, and the top-20 most
    // target-like raw docs are selected by the integer contrastive
    // score. The hashed feature space (1024 buckets) keeps the model
    // broadcastable BY CONSTRUCTION at any corpus size — the paper's
    // point, and the reason scoring is a map-side join here.
    (s, d) => CorpusStats.importanceSelect(Tables.documents(s, d),
        "doc_id", "text", col("lang") === "en", buckets = 1024,
        topK = 20)
      .orderBy(col("rank")),
    Some(s"""
      ${CorpusStats.importanceSelectSql("doc_id", "text",
        "lang = 'en'", buckets = 1024, topK = 20)}
      ORDER BY rank"""))

  val c41 = Q(
    "c41_doc_chunks",
    // Sliding-window chunking (Packing.chunkDocs): every document
    // cut into 32-token windows every 24 tokens (8-token overlap) —
    // the stage in front of retrieval indexing / long-doc training,
    // the within-document complement of c37's cross-document
    // packing. Map-only: tokenize once, explode ≤ n/stride+1 chunk
    // ids, slice the token array — no shuffle, each document
    // independent (the d8 streaming argument applies as-is).
    (s, d) => Packing.chunkDocs(Tables.documents(s, d), "doc_id",
        "text", win = 32L, stride = 24L)
      .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""
      WITH t AS (
        SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
        FROM documents),
      n AS (
        SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t),
      k AS (
        SELECT *, CASE WHEN n_tokens > 32
          THEN (n_tokens - 32 + 23) // 24 ELSE 0 END AS kmax
        FROM n),
      c AS (
        SELECT doc_id, toks, n_tokens, kmax,
               unnest(range(0, 64)) AS chunk_id
        FROM k)
      SELECT doc_id, n_tokens, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(chunk_id * 24 AS BIGINT) AS start_tok,
             CAST(LEAST(32, n_tokens - chunk_id * 24) AS BIGINT)
               AS n_chunk_tokens,
             array_to_string(list_slice(toks, chunk_id * 24 + 1,
               chunk_id * 24 + LEAST(32, n_tokens - chunk_id * 24)),
               ' ') AS chunk_text
      FROM c
      WHERE chunk_id <= kmax
        AND CASE WHEN (SELECT MAX(kmax) FROM k) >= 64
            THEN error('chunk bound 64 exceeded') ELSE TRUE END
      ORDER BY doc_id, chunk_id"""))

  val c42 = Q(
    "c42_bigram_counts",
    // BPE merge-candidate counting (CorpusStats.bigramCounts): the
    // adjacent-token-pair frequency head — the first merge a
    // BPE/WordPiece trainer would take, next to c31's unigram
    // snapshot. One pass: zip_with over shifted array slices
    // (per-row, no join), explode, map-side-combinable
    // groupBy(pair), TakeOrderedAndProject top-20, one-row totals
    // broadcast for the ppm share.
    (s, d) => CorpusStats.bigramCounts(Tables.documents(s, d), "text",
        topK = 20)
      .orderBy(col("rank")),
    Some(s"""
      ${CorpusStats.bigramCountsSql("text", 20, maxLen = 256)}
      ORDER BY rank"""))

  val c43 = Q(
    "c43_source_drift",
    // Per-source distribution drift (CorpusStats.sourceDrift): L1
    // distance in integer ppm between each source's hashed unigram
    // distribution and the corpus blend — the ingest-QA monitor that
    // flags a drifted/broken source before it pollutes the mix. One
    // corpus pass: the (source, bucket) count table materializes
    // once; corpus marginal, per-source totals and the dense
    // sources-x-buckets grid all derive from it via bounded
    // broadcast joins.
    (s, d) => CorpusStats.sourceDrift(Tables.documents(s, d), "source",
        "text", buckets = 1024)
      .orderBy(col("source")),
    Some(s"""
      ${CorpusStats.sourceDriftSql("source", "text", 1024)}
      ORDER BY source"""))

  val c44 = Q(
    "c44_chunk_retrieval",
    // Chunk-granularity retrieval (the RAG index-build + query
    // composition): corpus docs cut into c41's 32/24 windows, each
    // chunk embedded with the deterministic mock provider, eval docs
    // (the c36 %101 split) embedded whole as queries; cosine against
    // every chunk (exact baseline — the IVF route of c29 is the
    // documented scale path), chunks MAX-POOLED to their doc (best
    // chunk per (query, doc), ties to the lower chunk), then top-3
    // docs per query by best-chunk similarity. Both rank filters are
    // row_number<=k — the optimizer rewrites them to TopKPerKey
    // bounded heaps; the query side is a broadcast.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      // embedded chunk table AT REST (shared with c46's baseline)
      val chunks = Retrieval.chunkEmbedCached(s, d,
        "mod101ne0-w32s24d16", docs.where(!isQ), "doc_id", "text",
        win = 32L, stride = 24L, dim = 16)
      val queries = docs.where(isQ)
        .select(col("doc_id").as("q_id"),
          TextOps.polyHash(col("text")).as("h"))
        .select(col("q_id"),
          transform(VectorOps.mockEmbedding(col("h"), 16),
            x => x.cast("float")).as("q_emb"))
      Retrieval.chunkTopK(chunks, queries, "doc_id", k = 3)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
        FROM documents WHERE doc_id % 101 <> 0),
      n AS (
        SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t),
      k AS (
        SELECT *, CASE WHEN n_tokens > 32
          THEN (n_tokens - 32 + 23) // 24 ELSE 0 END AS kmax
        FROM n),
      ch AS (
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(list_slice(toks, chunk_id * 24 + 1,
                 chunk_id * 24 + LEAST(32, n_tokens - chunk_id * 24)),
                 ' ') AS chunk_text
        FROM (SELECT doc_id, toks, n_tokens, kmax,
                     unnest(range(0, 64)) AS chunk_id
              FROM k) x
        WHERE chunk_id <= kmax
        AND CASE WHEN (SELECT MAX(kmax) FROM k) >= 64
            THEN error('chunk bound 64 exceeded') ELSE TRUE END),
      ce AS (
        SELECT doc_id, chunk_id,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS emb
        FROM (SELECT doc_id, chunk_id,
                     ${TextOps.polyHashSql("chunk_text")} AS h
              FROM ch) y),
      qe AS (
        SELECT doc_id AS q_id,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS q_emb
        FROM (SELECT doc_id, ${TextOps.polyHashSql("text")} AS h
              FROM documents WHERE doc_id % 101 = 0) z),
      scored AS (
        SELECT q.q_id, c.doc_id, c.chunk_id,
               ${VectorOps.cosine6Sql("c.emb", "q.q_emb")} AS sim
        FROM ce c CROSS JOIN qe q),
      best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, doc_id
                 ORDER BY sim DESC, chunk_id) AS c_rk
        FROM scored),
      ranked AS (
        SELECT q_id, doc_id, chunk_id, sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, doc_id) AS rank
        FROM best WHERE c_rk = 1)
      SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, chunk_id, sim
      FROM ranked
      WHERE rank <= 3
      ORDER BY q_id, rank"""))

  val c45 = Q(
    "c45_bpe_train",
    // BPE merge-iteration trainer: k=3 rounds of (count adjacent
    // pairs -> argmax pair -> re-segment the corpus by merging that
    // pair left-to-right non-overlapping), re-counting on the MERGED
    // corpus each round — the trainer loop that makes c42 (= one
    // round's candidate table) an actual tokenizer-training step
    // (Sennrich et al. 2016). Fully distributed: the winning pair is
    // a broadcast one-row table feeding a per-doc string replace
    // (identical greedy left-to-right semantics in both engines), so
    // no round pulls data to the driver; the oracle unrolls the three
    // rounds as CTE stages. Output = the ordered merge list with
    // counts — the artifact a BPE tokenizer ships.
    (s, d) => CorpusStats.bpeTrain(Tables.documents(s, d), "doc_id", "text", k = 3),
    Some(CorpusStats.bpeTrainSql("text", k = 3, maxLen = 256)))

  val c46 = Q(
    "c46_chunk_index_recall",
    // Chunk retrieval THROUGH the persisted IVF index, recall-graded
    // per query against c44's exact full-scan baseline — the c17↔c29
    // mirror for the chunk corpus: the same %101 corpus/query split
    // as c44, the chunk index built once per corpus fingerprint
    // (chunkIndexCorpus -> Ann.writeIndex, DiskCache) and probed at
    // nprobe=2 with DPP-pruned lists (indexedChunkTopK, d15's batch
    // twin), the exact chunkTopK as truth; output = recall@3 per
    // query. The oracle rebuilds the same deterministic index from
    // scratch (kmeansCtes dim=16).
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      val corpus = Retrieval.chunkIndexCorpus(docs.where(!isQ),
        "doc_id", "text", win = 32L, stride = 24L, dim = 16)
      val idx = graft.util.DiskCache.cached(s, "chunk-index", "v1",
        Seq(s"$d/documents.parquet"), "mod101-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(corpus, "ckey", "emb", k = 8, iters = 2, tmp)
      } { base => Ann.readIndex(s, base) }
      val queries = docs.where(isQ)
        .select(col("doc_id").as("q_id"),
          TextOps.polyHash(col("text")).as("h"))
        .select(col("q_id"),
          transform(VectorOps.mockEmbedding(col("h"), 16),
            x => x.cast("float")).as("q_emb"))
      val ivf = Retrieval.indexedChunkTopK(idx, queries, "doc_id",
        nprobe = 2, k = 3)
      // exact baseline over the at-rest chunk table (c44's artifact)
      val exact = Retrieval.chunkTopK(
        Retrieval.chunkEmbedCached(s, d, "mod101ne0-w32s24d16",
          docs.where(!isQ), "doc_id", "text",
          win = 32L, stride = 24L, dim = 16),
        queries, "doc_id", k = 3)
      exact.alias("e")
        .join(ivf.alias("i"),
          col("e.q_id") === col("i.q_id") &&
            col("e.doc_id") === col("i.doc_id"),
          "left")
        .groupBy(col("e.q_id").as("q_id"))
        .agg(round(sum(when(col("i.doc_id").isNotNull, 1).otherwise(0))
          .cast("double") / 3, 6).as("recall"))
        .orderBy(col("q_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH t AS (
        SELECT doc_id, ${TextOps.tokensSql("text")} AS toks
        FROM documents WHERE doc_id % 101 <> 0),
      n AS (
        SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t),
      k AS (
        SELECT *, CASE WHEN n_tokens > 32
          THEN (n_tokens - 32 + 23) // 24 ELSE 0 END AS kmax
        FROM n),
      ch AS (
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(list_slice(toks, chunk_id * 24 + 1,
                 chunk_id * 24 + LEAST(32, n_tokens - chunk_id * 24)),
                 ' ') AS chunk_text
        FROM (SELECT doc_id, toks, n_tokens, kmax,
                     unnest(range(0, 64)) AS chunk_id
              FROM k) x
        WHERE chunk_id <= kmax
        AND CASE WHEN (SELECT MAX(kmax) FROM k) >= 64
            THEN error('chunk bound 64 exceeded') ELSE TRUE END),
      ce AS (
        SELECT doc_id, chunk_id,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS emb
        FROM (SELECT doc_id, chunk_id,
                     ${TextOps.polyHashSql("chunk_text")} AS h
              FROM ch) y),
      corpus AS (
        SELECT doc_id * 64 + chunk_id AS vec_id, emb AS embedding
        FROM ce),
      qe AS (
        SELECT doc_id AS q_id,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS q_emb
        FROM (SELECT doc_id, ${TextOps.polyHashSql("text")} AS h
              FROM documents WHERE doc_id % 101 = 0) z),
      ${kmeansCtes(k = 8, iters = 2, dim = 16)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.q_id
                   ORDER BY ${cos("q.q_emb", "c.cv")} DESC, c.cid) AS rk
          FROM qe q CROSS JOIN cent2 c) t
        WHERE rk <= 2),
      iscored AS (
        SELECT p.q_id,
               CAST(a.vec_id // 64 AS BIGINT) AS doc_id,
               CAST(a.vec_id % 64 AS BIGINT) AS chunk_id,
               ${cos("v.embedding", "q.q_emb")} AS sim
        FROM qprobe p
          JOIN pick3 a ON a.cid = p.cid
          JOIN corpus v ON v.vec_id = a.vec_id
          JOIN qe q ON q.q_id = p.q_id),
      ivf AS (
        SELECT q_id, doc_id FROM (
          SELECT q_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, doc_id) AS rank
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, doc_id
                       ORDER BY sim DESC, chunk_id) AS c_rk
                FROM iscored) b
          WHERE c_rk = 1) r
        WHERE rank <= 3),
      escored AS (
        SELECT q.q_id, c.doc_id, c.chunk_id,
               ${cos("c.emb", "q.q_emb")} AS sim
        FROM ce c CROSS JOIN qe q),
      exact AS (
        SELECT q_id, doc_id FROM (
          SELECT q_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, doc_id) AS rank
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, doc_id
                       ORDER BY sim DESC, chunk_id) AS c_rk
                FROM escored) b
          WHERE c_rk = 1) r
        WHERE rank <= 3)
      SELECT e.q_id,
             round(CAST(SUM(CASE WHEN i.doc_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS DOUBLE) / 3, 6)
               AS recall
      FROM exact e LEFT JOIN ivf i
        ON i.q_id = e.q_id AND i.doc_id = e.doc_id
      GROUP BY e.q_id
      ORDER BY e.q_id"""
    })

  val c47 = Q(
    "c47_bpe_encode",
    // The c45 merges APPLIED: run the identical k=3 merge loop and
    // report the per-document encoding effect — token count before/
    // after the merges and the integer-ppm compression — the "what
    // did this tokenizer buy us" audit a trainer ships next to its
    // merge list. Same loop = same broadcast-argmax rounds; the only
    // extra work is the final per-doc size projection (map-only, no
    // join — n_raw rides along from the pre-merge tokenization).
    // Since r15 the merges come from the at-rest artifact ("all-k3",
    // the whole-corpus flavor of c49/d18's tag) and the encode is the
    // stateless bpeApply replay — bit-identical to running the loop
    // (the round-i corpus IS the merge prefix applied; the unchanged
    // oracle hash-gates that equivalence at 3 SFs).
    (s, d) => {
      val docs = Tables.documents(s, d)
      CorpusStats.bpeApply(
          CorpusStats.bpeMergesCached(s, d, "all-k3", docs,
            "doc_id", "text", 3),
          docs, "doc_id", "text", k = 3)
        .orderBy(col("doc_id"))
    },
    Some(CorpusStats.bpeEncodeSql("text", k = 3, maxLen = 256)))

  val c48 = Q(
    "c48_shard_export",
    // Deterministic sharded-corpus export plan: content-hash shard
    // routing + a reproducible within-shard (hash, id) order — the
    // "write the corpus as S shuffled training files" layout — with a
    // per-shard manifest whose order_checksum is ORDER-SENSITIVE
    // (Σ rank·(h mod p) mod M), so the oracle verifies both engines
    // assign the exact same position to every document, not just the
    // same totals. One shuffle total: the per-shard rank window's
    // exchange IS the writer's repartition(shard); the manifest agg
    // reuses that partitioning (no second exchange).
    (s, d) => Packing.shardManifest(Tables.documents(s, d), "doc_id",
        "text", shards = 16)
      .orderBy(col("shard")),
    Some(Packing.shardManifestSql("doc_id", "text", shards = 16)))

  val c49 = Q(
    "c49_bpe_apply",
    // Train-once/encode-everywhere: merges trained on the %101<>0
    // corpus split (the c36/c44 eval-split convention), then APPLIED
    // to the held-out docs — the production seam where the tokenizer
    // artifact (the 3-row merge table, barriered so it never
    // re-derives) meets data it was not trained on. The apply side is
    // k broadcast one-row joins + framed-string replaces: stateless,
    // map-only per doc, no pair counting — encoding new data costs a
    // scan regardless of corpus size (and the same call encodes an
    // arriving stream). Oracle trains the same unrolled stages on the
    // train split and replays the replaces on the apply split.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      // merge table AT REST (shared with d18 — same split, same k)
      val merges = CorpusStats.bpeMergesCached(s, d, "mod101ne0-k3",
        docs.where(!isQ), "doc_id", "text", k = 3)
      CorpusStats.bpeApply(merges, docs.where(isQ), "doc_id", "text",
          k = 3)
        .orderBy(col("doc_id"))
    },
    Some(CorpusStats.bpeApplySql("text", k = 3, maxLen = 256,
      trainWhere = "doc_id % 101 <> 0", applyWhere = "doc_id % 101 = 0")))

  val c50 = Q(
    "c50_bigram_surprisal",
    // c28's next-order upgrade, split so the backoff fires: a bigram
    // LM (unigram + adjacent-pair + context-total tables) trained on
    // the %101<>0 corpus scores the held-out docs — bigram hit /
    // unigram backoff (+1 bit) / OOV (+2 past the rarest known) per
    // token occurrence, whole-bit integer surprisal (bitlength, no
    // float log), per-path occurrence counts in the output (the
    // hit/backoff/OOV mix IS the QA signal), mean in ppm of a bit.
    // Train tables are corpus-sized: shuffle-hash joins on token-hash
    // keys, never broadcast (c28's argument); the scoring side
    // pre-aggregates per (doc, context, token) so joins move
    // distinct-per-doc rows, not raw tokens.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      // reference LM AT REST (shared with d19/d22/c55 — same split)
      CorpusStats.bigramScore(
          CorpusStats.bigramLmCached(s, d, "mod101ne0",
            docs.where(!isQ), "text"),
          docs.where(isQ), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some(CorpusStats.bigramSurprisalSql("doc_id", "text",
      trainWhere = "doc_id % 101 <> 0", scoreWhere = "doc_id % 101 = 0",
      maxLen = 256)))

  val c52 = Q(
    "c52_trigram_surprisal",
    // c50's next order and the full Katz-style backoff chain:
    // trigram→bigram→unigram→OOV, +1 whole bit per backoff level,
    // contexts padded with the -1 sentinel so begin-of-doc contexts
    // are ordinary train rows (the <s> convention) and scoring has
    // no first-token special case. Same split discipline as c50
    // (train %101<>0, score the held-out %101=0) and the same scale
    // shape: the trigram/bigram/unigram tables are corpus-sized, so
    // every scoring join is shuffle-hash on token-hash keys — never
    // broadcast — and the scoring side pre-aggregates per
    // (doc, h0, h1, h2) so joins move distinct-per-doc rows. The
    // per-path counts expose the backoff slide a drifted doc takes
    // before it ever reaches OOV.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      // trigram LM AT REST (five tables, one artifact)
      CorpusStats.trigramScore(
          CorpusStats.trigramLmCached(s, d, "mod101ne0",
            docs.where(!isQ), "text"),
          docs.where(isQ), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some(CorpusStats.trigramSurprisalSql("doc_id", "text",
      trainWhere = "doc_id % 101 <> 0", scoreWhere = "doc_id % 101 = 0",
      maxLen = 256)))

  val c53 = Q(
    "c53_vocab_coverage",
    // The tokenizer team's coverage audit next to c50/c52's
    // occurrence-level n_oov: per SOURCE of the held-out split, how
    // many token TYPES (and occurrences) the %101<>0 train vocabulary
    // covers, at two tiers — the full vocab and the min-count>=2
    // truncation (hapax pruning, the standard vocab cut). The train
    // vocab is corpus-sized so the membership join is shuffle-hash,
    // never broadcast; the eval side pre-aggregates per (source,
    // token) so the join moves distinct rows; final groupBy is
    // O(sources).
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      CorpusStats.vocabCoverage(docs.where(!isQ), docs.where(isQ),
          "source", "text")
        .orderBy(col("source"))
    },
    Some(CorpusStats.vocabCoverageSql("source", "text",
      trainWhere = "doc_id % 101 <> 0", evalWhere = "doc_id % 101 = 0")))

  val c54 = Q(
    "c54_bpe_batch_train",
    // c45's production approximation: m=4 symbol-disjoint merges per
    // counting round (2 rounds) instead of one merge per pass — at
    // 100 TB each pair count is a full corpus scan, so a 32k-vocab
    // trainer batches hundreds of merges per scan. Disjointness
    // (one-pass dominance rule over the 4m-row ranked pool: a
    // candidate is excluded by ANY higher-ranked pool member sharing
    // a symbol) makes the batch order-independent with exact counts;
    // rounds may select fewer than m pairs — unfilled slots pass the
    // corpus through. Output = the ordered (round, j, pair, cnt)
    // merge artifact; c45 at equal total merges is the quality
    // bracket.
    (s, d) => CorpusStats.bpeBatchTrain(Tables.documents(s, d),
      "doc_id", "text", rounds = 2, m = 4),
    Some(CorpusStats.bpeBatchTrainSql("text", rounds = 2, m = 4,
      maxLen = 256)))

  val c55 = Q(
    "c55_moore_lewis",
    // The selection family's third member (next to c40 DSIR and
    // c50's absolute perplexity filter): Moore-Lewis cross-entropy
    // difference — held-out docs scored under an in-domain bigram LM
    // (train split, lang='en') AND the general-corpus LM (whole
    // train split), ranked by bits_general - bits_in_domain, so
    // domain-LIKENESS floats up rather than mere simplicity
    // (boilerplate is easy under every LM — the absolute filter's
    // failure mode). Two shuffle-hash-scored LM passes + a per-doc
    // equi-join + TakeOrderedAndProject top-10; all integer ppm.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isQ = pmod(col("doc_id"), lit(101)) === 0
      // both LMs AT REST (shared with d22; the general one with
      // c50/d19): only the two scoring passes + topK run here
      CorpusStats.mooreLewisSelect(
        CorpusStats.bigramLmCached(s, d, "mod101ne0-en",
          docs.where(!isQ && col("lang") === "en"), "text"),
        CorpusStats.bigramLmCached(s, d, "mod101ne0",
          docs.where(!isQ), "text"),
        docs.where(isQ), "doc_id", "text", topK = 10)
    },
    Some(CorpusStats.mooreLewisSelectSql("doc_id", "text",
      inDomainWhere = "doc_id % 101 <> 0 AND lang = 'en'",
      generalWhere = "doc_id % 101 <> 0",
      scoreWhere = "doc_id % 101 = 0", topK = 10, maxLen = 256)))

  val c56 = Q(
    "c56_tokenizer_fertility",
    // The BPE family's multilingual-fairness audit: merges trained
    // on the %101<>0 blend (k=3, barriered) applied to EVERY doc
    // (c49's scan-only seam), then per-LANGUAGE compression totals —
    // a minority language whose merges never win the argmax pays
    // more tokens per word, and its saved_ppm sits near 0: the
    // multilingual-pretraining cost audit. O(langs) final groupBy,
    // lang joined by id onto rows the apply already carries.
    (s, d) => {
      val docs = Tables.documents(s, d)
      CorpusStats.bpeFertility(docs, "doc_id", "text", "lang",
          trainFilter = pmod(col("doc_id"), lit(101)) =!= 0, k = 3,
          mergesPre = Some(CorpusStats.bpeMergesCached(s, d,
            "mod101ne0-k3",
            docs.where(pmod(col("doc_id"), lit(101)) =!= 0),
            "doc_id", "text", 3)))
        .orderBy(col("lang"))
    },
    Some(CorpusStats.bpeFertilitySql("text", k = 3, maxLen = 256,
      trainWhere = "doc_id % 101 <> 0", lang = "lang")))

  val c57 = Q(
    "c57_dup_window_rate",
    // The memorization-risk audit over c30's rolling 16-token window
    // hashes: per doc, the ppm fraction of its distinct windows that
    // occur in at least one OTHER document — the before/after
    // duplication evidence a dedup pipeline reports (Lee et al.'s
    // measurement side). Per-doc output, no quadratic bucket risk:
    // the window table joins its own count table on the window hash
    // (one shuffle key reused) + a per-doc partial-aggregable
    // groupBy; docs shorter than 16 tokens are absent by
    // construction.
    (s, d) => Dedup.dupWindowRate(Tables.documents(s, d), "doc_id",
        "text", w = 16)
      .orderBy(col("doc_id")),
    Some {
      val th = s"""list_transform(${TextOps.tokensSql("text")},
        tok -> ${TextOps.polyHashSql("tok")})"""
      s"""
      WITH th AS (SELECT doc_id, $th AS th FROM documents),
      wh AS (SELECT doc_id,
               unnest(list_distinct(${TextOps.ngramHashesSql("th", 16)}))
                 AS h
             FROM th),
      sizes AS (SELECT h, COUNT(*) AS nd FROM wh GROUP BY 1),
      agg AS (
        SELECT doc_id,
               COUNT(*) AS n_windows,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dup_windows
        FROM wh JOIN sizes USING (h)
        GROUP BY 1)
      SELECT doc_id, n_windows, n_dup_windows,
             CAST((CAST(n_dup_windows AS HUGEINT) * 1000000)
               // n_windows AS BIGINT) AS dup_ppm
      FROM agg
      ORDER BY doc_id"""
    })

  val c58 = Q(
    "c58_blob_neardup",
    // The multimodal family's near-dup member: a 64-bit block-mean
    // perceptual hash per blob (exact integer cross-multiply, no
    // float mean — engine-portable), computed entirely per-row with
    // higher-order array functions (map-only, no UDF), then c4's
    // band-and-verify: 8 byte-bands, candidates share a band value
    // (never all-pairs), verification = bit_count(xor) <= 12 on the
    // hashes alone (this corpus's closest payload pair sits at
    // hamming 9 — no exact dups — so 12 keeps the head selective).
    // The image-dedup production shape; on this ascii corpus the
    // blob bytes are the text's ascii codes, so the oracle
    // recomputes the identical hash from the text.
    (s, d) => Multimodal.blobNearDup(Tables.documents(s, d), "doc_id",
        "text", tau = 12)
      .orderBy(col("id_a"), col("id_b")),
    Some(Multimodal.blobNearDupSql("doc_id", "text", tau = 12)))

  val c59 = Q(
    "c59_ann_nprobe_curve",
    // The IVF tuning audit: recall@5 per query at nprobe = 1, 2, 4
    // against the same trained index — the recall-vs-cost curve an
    // operator reads before fixing nprobe at 100 TB (every probe
    // step scans another centroid's inverted list, so the curve IS
    // the latency budget decision; c17 reports the single point
    // nprobe=2). One kmeansFit + one barriered exact baseline,
    // re-probed three times; union of the three per-query recall
    // tables, never a global sort (TakeOrderedAndProject inside each
    // probe).
    (s, d) => {
      import graft.util.Barriers.BarrierOps
      val e = Tables.embeddings(s, d)
      val corpus = e.where(col("vec_id") >= 5)
      val queries = e.where(col("vec_id") < 5)
      val cent = Ann.kmeansFit(corpus, "vec_id", "embedding",
        k = 8, iters = 2)
      val exact = Ann.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 5).barrier(true)
      Seq(1, 2, 4).map { np =>
        val ivf = Ann.ivfTopK(corpus, queries, cent, "vec_id",
          "embedding", nprobe = np, k = 5)
        exact.alias("e")
          .join(ivf.alias("i"),
            col("e.q_id") === col("i.q_id") &&
              col("e.n_id") === col("i.n_id"), "left")
          .groupBy(col("e.q_id").as("q_id"))
          .agg(round(sum(when(col("i.n_id").isNotNull, 1).otherwise(0))
            .cast("double") / 5, 6).as("recall"))
          .select(lit(np.toLong).as("nprobe"), col("q_id"),
            col("recall"))
      }.reduce(_ unionAll _).orderBy(col("nprobe"), col("q_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      def rec(np: Int) =
        s"""qprobe$np AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= $np),
      ivf$np AS (
        SELECT q_id, n_id FROM (
          SELECT p.q_id, a.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY p.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            a.vec_id) AS rk
          FROM qprobe$np p
            JOIN pick3 a ON a.cid = p.cid
            JOIN corpus v ON v.vec_id = a.vec_id
            JOIN queries q ON q.vec_id = p.q_id) t
        WHERE rk <= 5),
      rec$np AS (
        SELECT CAST($np AS BIGINT) AS nprobe, e.q_id,
               round(CAST(SUM(CASE WHEN i.n_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6)
                 AS recall
        FROM exact e
          LEFT JOIN ivf$np i ON i.q_id = e.q_id AND i.n_id = e.n_id
        GROUP BY e.q_id)"""
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5),
      ${rec(1)},
      ${rec(2)},
      ${rec(4)}
      SELECT * FROM (
        SELECT * FROM rec1
        UNION ALL SELECT * FROM rec2
        UNION ALL SELECT * FROM rec4)
      ORDER BY nprobe, q_id"""
    })

  val c51 = Q(
    "c51_shard_pack",
    // c48's routing + c37's offset math composed into the layout a
    // pretraining writer actually emits: each shard's docs
    // concatenate in the deterministic (hash, id) order and chop
    // into 512-token sequences INDEPENDENTLY per shard (shards are
    // separate files — sequences never span them). Per shard:
    // totals, sequence count, boundary-straddler count (the loader's
    // split count) and the last sequence's fill in ppm (the
    // padding-waste audit). One exchange — the same shard window as
    // c48; the in-shard prefix sum needs no two-level scan because
    // the shard grid already partitions the order.
    (s, d) => Packing.shardPack(Tables.documents(s, d), "doc_id",
        "text", shards = 16, budget = 512L)
      .orderBy(col("shard")),
    Some(Packing.shardPackSql("doc_id", "text", shards = 16,
      budget = 512L)))

  val c63 = Q(
    "c63_bpe_curve",
    // Compression-vs-merge-count curve from ONE training loop
    // (CorpusStats.bpeCurve): corpus token totals after 0..k merges,
    // each step's learned pair and the cumulative ppm saving vs raw —
    // the "is merge k still paying" audit that fixes a tokenizer's
    // vocab size. Never k separate trainings: the totals aggregate
    // the same barriered per-round corpora the k-round trainer
    // (c45's loop) materializes anyway, so the curve adds k+1
    // partial-aggregable size scans and zero merge work. The winning
    // pair's count can't substitute for the scan (it counts
    // overlapping occurrences the greedy non-overlapping apply
    // skips).
    // Since r15 the curve replays the at-rest k=4 merge artifact
    // (bpeCurveFromMerges): k+1 map-side size scans over the applied
    // prefixes, zero pair counting — the unchanged oracle hash-gates
    // the loop-vs-replay equivalence at 3 SFs.
    (s, d) => {
      val docs = Tables.documents(s, d)
      CorpusStats.bpeCurveFromMerges(
        CorpusStats.bpeMergesCached(s, d, "all-k4", docs,
          "doc_id", "text", 4),
        docs, "doc_id", "text", k = 4)
    },
    Some(CorpusStats.bpeCurveSql("text", k = 4, maxLen = 256)))

  val c64 = Q(
    "c64_length_trim",
    // Length-outlier trim (Sampling.lengthTrim): cut docs outside the
    // corpus's exact [p5, p95] token-count band (nearest-rank over the
    // c38 histogram-cumsum — no global sort, the window runs on the
    // tiny bounded-domain histogram) and report the per-source audit
    // with the thresholds applied. The C4/Gopher "remove truncated
    // stubs and concatenation junk" gate, percentile-adaptive instead
    // of hardcoded; two partial-aggregable corpus scans + a one-row
    // threshold broadcast.
    (s, d) => Sampling.lengthTrim(Tables.documents(s, d), "source",
      "text", loPpm = 50000L, hiPpm = 950000L),
    Some(Sampling.lengthTrimSql("source", "text",
      loPpm = 50000L, hiPpm = 950000L)))

  val c65 = Q(
    "c65_tfidf_keywords",
    // Per-doc keyword extraction (CorpusStats.tfidfKeywords): top-3
    // most distinctive terms under the integer rational TF-IDF
    // tf·N/(df·len) in ppm — log-IDF replaced by the exact rarity
    // ratio so the score oracle-matches bit-for-bit. One explode, two
    // partial-aggregable aggs, a vocab-keyed df join, and a per-doc
    // row_number ≤ 3 the optimizer rewrites to the TopKPerKey bounded
    // heap. The cluster-naming / facet pass of a curation pipeline.
    (s, d) => CorpusStats.tfidfKeywords(Tables.documents(s, d),
      "doc_id", "text", topK = 3),
    Some(CorpusStats.tfidfKeywordsSql("doc_id", "text", topK = 3)))

  val c66 = Q(
    "c66_padding_audit",
    // Padding-waste audit (Packing.paddingAudit): fixed 16-doc
    // batches padded to their longest member, arrival-order vs
    // length-sorted batching — the waste gap is what length-bucketed
    // batch sampling buys; the audit a training-infra team runs
    // before picking a sampler. Both global ranks are two-level
    // distributed scans (id-bucket counts / length-histogram cumsum
    // prefixes + partitioned intra row_numbers), never a
    // one-partition corpus window.
    (s, d) => Packing.paddingAudit(Tables.documents(s, d), "doc_id",
      "text", batch = 16),
    Some(Packing.paddingAuditSql("doc_id", "text", batch = 16)))

  val c67 = Q(
    "c67_dedup_cluster_stats",
    // The savings report of a dedup run (Dedup.clusterStats): c16's
    // LSH→verify→CC clusters folded to the cluster-size histogram
    // with the doc/token mass each size class removes — singletons
    // included as the size-1 row, so the histogram partitions the
    // corpus (Σ size·n_clusters = docs) and a too-loose threshold
    // shows up as a giant component. Adds one id-keyed left join +
    // two partial-aggregable groupBys over c16's output; nothing
    // shuffles wider than the dedup itself — and the (id, keeper) map
    // is PERSISTED per corpus fingerprint (DiskCache, the b29/c29
    // index-once seam: dedup runs once, audits read it; c16 stays
    // the compute-path grade).
    (s, d) => {
      val docs = Tables.documents(s, d)
      val m = graft.util.DiskCache.cached(s, "dedup-map", "v1",
        Seq(s"$d/documents.parquet"), "tau05",
        Seq("map")) { tmp =>
        Dedup.deduplicate(docs, "doc_id", "text", 0.5)
          .write.mode("overwrite").parquet(s"$tmp/map")
      } { base => s.read.parquet(s"$base/map") }
      Dedup.clusterStatsOf(m, docs, "doc_id", "text")
    },
    Some(s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
      map AS (
        SELECT n AS doc_id, LEAST(n, MIN(m)) AS keeper
        FROM reach GROUP BY n),
      everydoc AS (
        SELECT d.doc_id, COALESCE(m.keeper, d.doc_id) AS keeper,
               CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n
        FROM documents d LEFT JOIN map m ON d.doc_id = m.doc_id),
      cl AS (
        SELECT keeper, COUNT(*) AS sz,
               SUM(CASE WHEN doc_id <> keeper THEN n ELSE 0 END) AS rm
        FROM everydoc GROUP BY 1)
      SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
             CAST(SUM(sz - 1) AS BIGINT) AS docs_removed,
             CAST(SUM(rm) AS BIGINT) AS tokens_removed
      FROM cl
      GROUP BY 1
      ORDER BY cluster_size"""))

  val c68 = Q(
    "c68_decontaminate",
    // c27 APPLIED (CorpusStats.decontaminate): training docs flagged
    // by the eval-overlap detector are anti-joined out and the cut is
    // reported per source (docs/tokens before vs cut) — the scrub a
    // pipeline logs before shipping its train split; the detect→apply
    // seam mirroring c16→c19. The flagged-id set is a tiny distinct
    // projection of the pair table, so the join back broadcasts; the
    // audit agg is partial-aggregable.
    (s, d) => CorpusStats.decontaminate(Tables.documents(s, d),
      "doc_id", "source", "text", pmod(col("doc_id"), lit(37)) === 0,
      minOverlap = 0.1),
    Some(CorpusStats.decontaminateSql("doc_id", "source", "text",
      "doc_id % 37 = 0", minOverlap = 0.1)))

  val c69 = Q(
    "c69_embedding_health",
    // Per-dimension embedding-health audit over c24's int8 codes
    // (Ann.quantHealth): count/min/max/sum/sum-of-squares per dim —
    // collapsed dims (max−min ≈ 0) and scale saturation (mass at
    // ±127) caught before a quantized index ships. Map-side
    // normalize+quantize against the broadcast one-row scale, one
    // partial-aggregable groupBy bounded by the dimensionality;
    // all-integer outputs (raw sums, no negative-sum division).
    (s, d) => Ann.quantHealth(Tables.embeddings(s, d), "vec_id",
      "embedding"),
    Some(s"""
      WITH corpusn AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding")})
                 AS nv
        FROM embeddings),
      mm AS (
        SELECT MAX(abs(x)) / CAST(127 AS DOUBLE) AS scale
        FROM (SELECT unnest(nv) AS x FROM corpusn)),
      cq AS (
        SELECT vec_id,
               list_transform(nv, x -> least(greatest(
                 CAST(floor(x / m.scale) AS BIGINT), -127), 127)) AS qv
        FROM corpusn CROSS JOIN mm m),
      codes AS (
        SELECT j - 1 AS dim, qv[j] AS code
        FROM cq CROSS JOIN (SELECT unnest(range(1, 65)) AS j) r)
      SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
             MIN(code) AS code_min, MAX(code) AS code_max,
             CAST(SUM(code) AS BIGINT) AS code_sum,
             CAST(SUM(code * code) AS BIGINT) AS code_sqsum
      FROM codes
      GROUP BY dim
      ORDER BY dim"""))

  val c70 = Q(
    "c70_lsh_precision",
    // The LSH banding tuning audit (Dedup.lshPrecision) — c59's
    // recall curve mirrored onto the dedup side: candidate volume,
    // verified count and precision ppm at bands = 4/8/12 over the
    // same k=24 signature. More bands ⇒ more (junkier) candidates:
    // recall at tau rises while candidate-shuffle volume — the real
    // 100 TB cost, verify touches every candidate — grows; this curve
    // prices that trade. Shingle explode + size table shared and
    // barriered across settings; per setting one bucketed equi-join
    // + candidates-only verify.
    (s, d) => Dedup.lshPrecision(Tables.documents(s, d), "doc_id",
      "text", k = 24, bandsList = Seq(4, 8, 12), tau = 0.5),
    Some {
      def leg(b: Int): String = {
        val r = 24 / b
        s"""banded$b AS (
        SELECT doc_id, t.bi AS band_idx,
               list_slice(sig, t.bi * $r + 1, t.bi * $r + $r) AS band_val
        FROM sigs CROSS JOIN (SELECT unnest(range(0, $b)) AS bi) t),
      cand$b AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded$b a JOIN banded$b b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id),
      ver$b AS (
        SELECT i.id_a FROM (
          SELECT c.id_a, c.id_b, COUNT(*) AS c
          FROM cand$b c
            JOIN sh sa2 ON sa2.doc_id = c.id_a
            JOIN sh sb2 ON sb2.doc_id = c.id_b AND sb2.s = sa2.s
          GROUP BY 1, 2) i
          JOIN sizes sa ON i.id_a = sa.doc_id
          JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
          >= 0.5)"""
      }
      s"""
      WITH sh AS (
        SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      sigs AS (
        SELECT doc_id, ${TextOps.minHashSignatureSql(SH, 24)} AS sig
        FROM documents),
      ${leg(4)},
      ${leg(8)},
      ${leg(12)},
      curve AS (
        SELECT 4 AS bands, (SELECT COUNT(*) FROM cand4) AS n_cand,
               (SELECT COUNT(*) FROM ver4) AS n_verified
        UNION ALL
        SELECT 8, (SELECT COUNT(*) FROM cand8),
               (SELECT COUNT(*) FROM ver8)
        UNION ALL
        SELECT 12, (SELECT COUNT(*) FROM cand12),
               (SELECT COUNT(*) FROM ver12))
      SELECT CAST(bands AS BIGINT) AS bands,
             CAST(n_cand AS BIGINT) AS n_cand,
             CAST(n_verified AS BIGINT) AS n_verified,
             CAST(CASE WHEN n_cand = 0 THEN 0
               ELSE (CAST(n_verified AS HUGEINT) * 1000000) // n_cand
               END AS BIGINT) AS precision_ppm
      FROM curve
      ORDER BY bands"""
    })

  val c71 = Q(
    "c71_quality_calibration",
    // Do the two quality signals agree? (CorpusStats.
    // qualityCalibration): c9's heuristic score vs c28's unigram
    // surprisal, bucketed into fixed-width quality deciles (pure map,
    // no percentile pass) with per-decile doc/token mass and both
    // averages — a monotone surprisal trend across deciles means the
    // heuristic and the LM agree about junk; a flat/inverted trend
    // means one is lying. Two per-doc passes + one doc-keyed join +
    // a 10-bucket groupBy; all-integer ppm outputs.
    (s, d) => CorpusStats.qualityCalibration(Tables.documents(s, d),
      "doc_id", "text"),
    Some(CorpusStats.qualityCalibrationSql("doc_id", "text")))

  val c72 = Q(
    "c72_mix_temperature_curve",
    // The mixing-temperature knob as a curve (CorpusStats.
    // mixTemperatureCurve): per-source shares at alpha = 0 (uniform) /
    // 0.5 (isqrt flattening, = c26's point) / 1 (proportional) — the
    // three integer-exact points of w ∝ tokens^alpha; the table a
    // pretraining team reads to pick its mixture temperature. One
    // barriered per-source agg + a one-row totals broadcast; the
    // three legs project the same tiny table, corpus scanned once.
    (s, d) => CorpusStats.mixTemperatureCurve(Tables.documents(s, d),
      "source", "text"),
    Some(CorpusStats.mixTemperatureCurveSql("source", "text")))

  val c73 = Q(
    "c73_split_leakage",
    // Split-leakage audit: assign every doc a deterministic
    // hash-based train/val/test split (98/1/1 — the c23 stable-hash
    // contract, so splits are reproducible across runs and cluster
    // layouts), then count VERIFIED near-dup pairs per split
    // combination (Dedup.nearDupPairs: banded candidates +
    // exact-Jaccard verify). A nonzero train↔val/test row is
    // evaluation leakage — near-copies of eval docs in the training
    // split — the classic split bug dedup-after-split pipelines ship;
    // the within-train row is the residual-dup context. Split mapping
    // is a pure map; the two id-keyed joins attach ranks to pair
    // endpoints; the (lo, hi) groupBy output is ≤ 6 rows.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5,
        k = 24, bands = 12)
      val bucket = pmod(TextOps.polyHashMixed(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
      val sp = docs.select(col("doc_id"),
        when(bucket < 98, 0L).when(bucket === 98, 1L).otherwise(2L)
          .as("rk"))
      def nameOf(c: org.apache.spark.sql.Column) =
        when(c === 0L, "train").when(c === 1L, "val").otherwise("test")
      pairs
        .join(sp.select(col("doc_id").as("id_a"), col("rk").as("ra")),
          "id_a")
        .join(sp.select(col("doc_id").as("id_b"), col("rk").as("rb")),
          "id_b")
        .select(least(col("ra"), col("rb")).as("lo"),
          greatest(col("ra"), col("rb")).as("hi"))
        .groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("lo"), col("hi"), nameOf(col("lo")).as("split_a"),
          nameOf(col("hi")).as("split_b"), col("n_pairs"))
        .orderBy(col("lo"), col("hi"))
    },
    Some {
      val bucket = TextOps.polyHashMixedSql(
        "('split:' || CAST(doc_id AS VARCHAR))")
      s"""
      WITH sh AS (
        SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      sigs AS (
        SELECT doc_id, ${TextOps.minHashSignatureSql(SH, 24)} AS sig
        FROM documents),
      banded AS (
        SELECT doc_id, t.bi AS band_idx,
               list_slice(sig, t.bi * 2 + 1, t.bi * 2 + 2) AS band_val
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 12)) AS bi) t),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id),
      ver AS (
        SELECT i.id_a, i.id_b FROM (
          SELECT c.id_a, c.id_b, COUNT(*) AS c
          FROM cand c
            JOIN sh sa2 ON sa2.doc_id = c.id_a
            JOIN sh sb2 ON sb2.doc_id = c.id_b AND sb2.s = sa2.s
          GROUP BY 1, 2) i
          JOIN sizes sa ON i.id_a = sa.doc_id
          JOIN sizes sb ON i.id_b = sb.doc_id
        WHERE round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6)
          >= 0.5),
      sp AS (
        SELECT doc_id,
               CASE WHEN ($bucket) % 100 < 98 THEN 0
                    WHEN ($bucket) % 100 = 98 THEN 1
                    ELSE 2 END AS rk
        FROM documents),
      lj AS (
        SELECT LEAST(a.rk, b.rk) AS lo, GREATEST(a.rk, b.rk) AS hi
        FROM ver
          JOIN sp a ON ver.id_a = a.doc_id
          JOIN sp b ON ver.id_b = b.doc_id)
      SELECT CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
             CASE lo WHEN 0 THEN 'train' WHEN 1 THEN 'val'
               ELSE 'test' END AS split_a,
             CASE hi WHEN 0 THEN 'train' WHEN 1 THEN 'val'
               ELSE 'test' END AS split_b,
             COUNT(*) AS n_pairs
      FROM lj
      GROUP BY lj.lo, lj.hi
      ORDER BY lo, hi"""
    })

  val c74 = Q(
    "c74_dedup_snapshot_diff",
    // Cross-snapshot dedup diff (Dedup.snapshotDiff + snapshotChurn):
    // two corpus versions (V1 = doc_id%10 < 8, V2 = doc_id%10 >= 2 —
    // docs 0-1 removed, 8-9 added, 2-7 carried), each represented
    // ONLY by its persisted band index (built once per corpus
    // fingerprint — the same DiskCache artifact family as c25/c29),
    // diffed into per-pair new/persisting/resolved near-dup statuses
    // and rolled up per (sorted) source pair with pair counts and
    // similarity mass — the release-over-release audit a corpus owner
    // reads: which sources are accumulating new duplication debt,
    // which cleanups actually resolved relations. Neither corpus text
    // is rescanned: candidates are each index's band self-join, the
    // verify reads index shingle sets, and the diff is one full-outer
    // join keyed by the pair. The oracle recomputes both snapshots'
    // relation sets from scratch with EXACT all-pairs Jaccard (the
    // c16 precedent pins banding lossless at k=48/b=24, tau=0.5).
    (s, d) => {
      val docs = Tables.documents(s, d)
      val v1 = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val v2 = docs.where(pmod(col("doc_id"), lit(10)) >= 2)
      def idx(tag: String, corpus: org.apache.spark.sql.DataFrame) =
        graft.util.DiskCache.cached(s, "dedup-index", "v2",
          Seq(s"$d/documents.parquet"), tag, Seq("shingles", "bands")) {
          tmp => Dedup.writeIndex(corpus, "doc_id", "text",
            k = 48, bands = 24, tmp)
        } { base => Dedup.readIndex(s, base) }
      val diff = Dedup.snapshotDiff(
        idx("mod10lt8-k48b24", v1), idx("mod10ge2-k48b24", v2), tau = 0.5)
      Dedup.snapshotChurn(diff, docs, "doc_id", "source")
        .orderBy(col("src_a"), col("src_b"), col("status"))
    },
    Some(s"""
      WITH sh AS (SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b,
               CAST((CAST(c AS HUGEINT) * 1000000)
                 // (sa.n + sb.n - c) AS BIGINT) AS j_ppm
        FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      st AS (
        SELECT id_a, id_b, j_ppm,
               CASE WHEN (id_a % 10 < 8 AND id_b % 10 < 8)
                     AND (id_a % 10 >= 2 AND id_b % 10 >= 2)
                    THEN 'persisting'
                    WHEN id_a % 10 >= 2 AND id_b % 10 >= 2 THEN 'new'
                    ELSE 'resolved' END AS status
        FROM pairs
        WHERE (id_a % 10 < 8 AND id_b % 10 < 8)
           OR (id_a % 10 >= 2 AND id_b % 10 >= 2)),
      lab AS (
        SELECT LEAST(a.source, b.source) AS src_a,
               GREATEST(a.source, b.source) AS src_b,
               status, j_ppm
        FROM st
          JOIN documents a ON st.id_a = a.doc_id
          JOIN documents b ON st.id_b = b.doc_id)
      SELECT src_a, src_b, status,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(j_ppm) AS BIGINT) AS j_ppm_sum
      FROM lab
      GROUP BY src_a, src_b, status
      ORDER BY src_a, src_b, status"""))

  val c75 = Q(
    "c75_ffd_packing",
    // First-fit-decreasing packing audit (Packing.ffdAudit) — c66's
    // padding question asked of WHOLE-DOC bin packing: docs into
    // fixed 512-token bins, no straddling, under arrival next-fit /
    // decreasing next-fit / first-fit-decreasing. The FFD leg is the
    // deterministic distributed formulation the r6 verdict asked for:
    // a global two-level decreasing rank slices contiguous 4096-doc
    // shards, each shard packs EXACTLY via a sequential integer fold
    // (aggregate ↔ list_reduce — the §4 id-ordered-fold pattern) with
    // bin state bounded by the shard; cross-shard waste is priced in.
    // The waste_ppm gaps are the numbers a batch-assembly owner tunes
    // against: sorted−arrival = what length-ordering alone buys,
    // ffd−sorted = what revisiting open bins buys on top.
    // shardSize=1024 bounds the oracle's recursion depth (one doc per
    // shard per recursive step); the Spark fold is depth-free.
    (s, d) => Packing.ffdAudit(Tables.documents(s, d), "doc_id",
      "text", budget = 512L, shardSize = 1024),
    Some(Packing.ffdAuditSql("doc_id", "text", budget = 512L,
      shardSize = 1024)))

  val c76 = Q(
    "c76_fuzzy_decontaminate",
    // Paraphrase-level decontamination (Dedup.fuzzyContamination):
    // train docs that are NEAR-dups of an eval doc — the leakage mode
    // c27/c68's exact ≥10%-shingle-containment scrub misses, since a
    // lightly rewritten eval item keeps few exact 3-shingles. Unit =
    // TOKEN-BIGRAM set (edit survival (1−e)² vs (1−e)³, ≈2× the
    // paraphrase Jaccard of shingles at e=1/3; unigram background on
    // this corpus is 1.0, bigram ≈0.1 — measured), detection = the
    // MinHash band index (k=48/bands=24 so r=2 — J=0.35 pairs
    // surface w.p. ≈0.96) composed with the BROADCAST eval side:
    // candidate generation never self-joins the corpus, its shuffle
    // is bounded by eval-band collisions; the exact bigram-Jaccard
    // verify touches candidates only and gates on integer ppm.
    // Output: contaminated train docs with hit count and worst
    // Jaccard — feed to the c68 anti-join seam to scrub.
    (s, d) => Dedup.fuzzyContamination(Tables.documents(s, d),
      "doc_id", "text", pmod(col("doc_id"), lit(37)) === 0,
      minPpm = 300000L),
    Some(s"""
      WITH tok AS (
        SELECT doc_id, doc_id % 37 = 0 AS is_eval,
               list_transform(${TextOps.tokensSql("text")},
                 tok -> ${TextOps.polyHashSql("tok")}) AS th
        FROM documents),
      base AS (
        SELECT doc_id, is_eval,
               list_distinct(${TextOps.ngramHashesSql("th", 2)}) AS shh
        FROM tok),
      sh AS (SELECT doc_id, unnest(shh) AS s FROM base),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      sigs AS (
        SELECT doc_id, is_eval,
               ${TextOps.minHashSignatureSql("shh", 48)} AS sig
        FROM base),
      banded AS (
        SELECT doc_id, is_eval, t.bi AS band_idx,
               list_slice(sig, t.bi * 2 + 1, t.bi * 2 + 2) AS band_val
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 24)) AS bi) t),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
        FROM banded a JOIN banded e
          ON a.band_idx = e.band_idx AND a.band_val = e.band_val
        WHERE NOT a.is_eval AND e.is_eval),
      inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sb.s = sa.s
        GROUP BY 1, 2),
      pairs AS (
        SELECT i.id_a,
               (CAST(i.c AS HUGEINT) * 1000000)
                 // (za.n + zb.n - i.c) AS j_ppm
        FROM inter i
          JOIN sizes za ON za.doc_id = i.id_a
          JOIN sizes zb ON zb.doc_id = i.id_b)
      SELECT id_a AS doc_id, COUNT(*) AS n_eval_hits,
             CAST(MAX(j_ppm) AS BIGINT) AS worst_j_ppm
      FROM pairs
      WHERE j_ppm >= 300000
      GROUP BY 1
      ORDER BY doc_id"""))

  val c77 = Q(
    "c77_quality_keeper",
    // Quality-aware keeper selection (Dedup.qualityKeepers): per
    // near-dup cluster (c16's LSH→verify→CC map, min-id as the
    // stable cluster KEY), the member with the best c9 quality ppm
    // (tie → smaller id) — the representative a curation pipeline
    // actually keeps: min-id keeps whichever copy was crawled first,
    // this keeps the best copy, and `upgraded` rows price the
    // difference. One bigint argmax score (q_ppm·1e12 − id) keeps
    // both engines' picks identical; reads the PERSISTED c67 keeper
    // map (DiskCache "dedup-map" — dedup priced once per corpus
    // fingerprint, audits just join), then one doc-keyed quality
    // join + per-cluster partial-aggregable max_by.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val m = graft.util.DiskCache.cached(s, "dedup-map", "v1",
        Seq(s"$d/documents.parquet"), "tau05",
        Seq("map")) { tmp =>
        Dedup.deduplicate(docs, "doc_id", "text", 0.5)
          .write.mode("overwrite").parquet(s"$tmp/map")
      } { base => s.read.parquet(s"$base/map") }
      Dedup.qualityKeepersOf(m, docs, "doc_id", "text")
    },
    Some(s"""
      WITH RECURSIVE sh AS (
        SELECT doc_id, unnest($SH) AS s FROM documents),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
      cl AS (
        SELECT n AS doc_id, LEAST(n, MIN(m)) AS keeper
        FROM reach GROUP BY n),
      qf AS (${graft.operators.TextQuality
        .qualityFeaturesSql("doc_id", "text")}),
      q AS (
        SELECT doc_id,
               CAST(round(quality * 1000000, 0) AS BIGINT) AS q_ppm
        FROM qf),
      m AS (
        SELECT cl.keeper AS cluster, cl.doc_id, q.q_ppm,
               q.q_ppm * 1000000000000 - cl.doc_id AS score
        FROM cl JOIN q USING (doc_id)),
      a AS (
        SELECT cluster, COUNT(*) AS n_docs,
               arg_max(doc_id, score) AS best_id,
               arg_max(q_ppm, score) AS best_q_ppm
        FROM m GROUP BY 1)
      SELECT a.cluster, a.n_docs, a.best_id, a.best_q_ppm,
             q.q_ppm AS minid_q_ppm,
             CAST(CASE WHEN a.best_id <> a.cluster THEN 1 ELSE 0 END
               AS BIGINT) AS upgraded
      FROM a JOIN q ON q.doc_id = a.cluster
      ORDER BY cluster"""))

  val c78 = Q(
    "c78_span_dedup_apply",
    // Span-level ExactSubstr APPLY (Dedup.spanRedact): c30 detects
    // pairs sharing exact 16-token windows; this REMOVES the
    // duplicated runs and keeps the rest of each doc (Lee et al.'s
    // deletion semantics — a boilerplate header costs its own tokens,
    // not the whole document). Per doc: before/after token counts,
    // kept ppm, and the redacted text re-rendered from the kept
    // token stream.
    (s, d) => Dedup.spanRedact(Tables.documents(s, d), "doc_id",
        "text", w = 16)
      .orderBy(col("doc_id")),
    Some(s"""
      ${Dedup.spanRedactSql("doc_id", "text", 16)}
      ORDER BY doc_id"""))

  val c79 = Q(
    "c79_ivf_append",
    // Incremental vector-index append + retrain-signal audit
    // (Ann.appendIndex / ivfAppendAudit, the r8-verdict gap-#2: the
    // production gap between "index once" and "index forever"):
    // arriving vectors (vec_id%10 >= 8) are assigned MAP-SIDE to the
    // persisted base index's static centroids (argmaxAssign — one-row
    // broadcast centroid array, arrivals never shuffled) and appended
    // to its inverted lists; the audit emits per-list growth and the
    // assignment-quality drift of arrivals vs the TRAINING
    // distribution (shifted floor-mean cosine ppm on both sides) —
    // the signal that says when the fixed centroids need retraining.
    // Append-equals-rebuild is spec-pinned (DedupAnnSpec); the oracle
    // recomputes the same deterministic k-means + assignments.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val arrivals = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) >= 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      Ann.ivfAppendAudit(idx, arrivals, "vec_id", "embedding")
        .orderBy(col("c_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      arrivals AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 >= 8),
      ${kmeansCtes(k = 8, iters = 2)},
      bsim AS (
        SELECT p.cid,
               CAST(round(${cos("v.embedding", "c.cv")} * 1000000, 0)
                 AS BIGINT) AS sim_ppm
        FROM pick3 p JOIN corpus v USING (vec_id)
          JOIN cent2 c ON c.cid = p.cid),
      apick AS (
        SELECT vec_id, cid, sim_ppm FROM (
          SELECT a.vec_id, c.cid,
                 CAST(round(${cos("a.embedding", "c.cv")} * 1000000, 0)
                   AS BIGINT) AS sim_ppm,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ${cos("a.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM arrivals a CROSS JOIN cent2 c) t
        WHERE rk = 1),
      bstat AS (
        SELECT cid, COUNT(*) AS n_base,
               CAST((SUM(sim_ppm + 1000000) // COUNT(*)) - 1000000
                 AS BIGINT) AS base_sim_ppm
        FROM bsim GROUP BY 1),
      astat AS (
        SELECT cid, COUNT(*) AS n_arrived,
               CAST((SUM(sim_ppm + 1000000) // COUNT(*)) - 1000000
                 AS BIGINT) AS arrived_sim_ppm
        FROM apick GROUP BY 1)
      SELECT coalesce(b.cid, a.cid) AS c_id,
             CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
             CAST(coalesce(a.n_arrived, 0) AS BIGINT) AS n_arrived,
             CASE WHEN b.cid IS NULL THEN CAST(-1 AS BIGINT)
                  ELSE CAST((CAST(coalesce(a.n_arrived, 0) AS HUGEINT)
                    * 1000000) // b.n_base AS BIGINT) END AS growth_ppm,
             CAST(coalesce(b.base_sim_ppm, -1) AS BIGINT)
               AS base_sim_ppm,
             CAST(coalesce(a.arrived_sim_ppm, -1) AS BIGINT)
               AS arrived_sim_ppm,
             CAST(CASE WHEN b.cid IS NOT NULL AND a.cid IS NOT NULL
                  THEN a.arrived_sim_ppm - b.base_sim_ppm
                  ELSE 0 END AS BIGINT) AS drift_ppm
      FROM bstat b FULL OUTER JOIN astat a ON b.cid = a.cid
      ORDER BY c_id"""
    })

  val c80 = Q(
    "c80_centroid_retrain",
    // Seeded centroid RETRAIN + audit (Ann.retrainAudit) — the act
    // c79's drift signal asks for, closing the "index forever" loop:
    // one Lloyd refresh step (the §4-exact fixed-point mean of
    // kmeansFit) over base lists ∪ arrivals, SEEDED from the
    // persisted centroids — ids stay stable, so the audit can price
    // each centroid's movement (old-vs-new cosine ppm; −1 = retired)
    // and member flow (n_before from the c79 audit vs n_after under
    // the refreshed centroids, map-side argmaxAssign). `retrain` is
    // retrainVerdict's flag (growth ≥ 30% of training size or drift
    // ≤ −2pp cosine). Retrain reads the index layout, never the raw
    // corpus; everything past the two linear member passes is k-row
    // arithmetic.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val arrivals = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) >= 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      Ann.retrainAudit(idx, arrivals, "vec_id", "embedding",
          maxGrowthPpm = 300000L, maxDriftDownPpm = 20000L)
        .orderBy(col("c_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      arrivals AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 >= 8),
      ${kmeansCtes(k = 8, iters = 2)},
      bsim AS (
        SELECT p.cid,
               CAST(round(${cos("v.embedding", "c.cv")} * 1000000, 0)
                 AS BIGINT) AS sim_ppm
        FROM pick3 p JOIN corpus v USING (vec_id)
          JOIN cent2 c ON c.cid = p.cid),
      apick AS (
        SELECT vec_id, cid, sim_ppm FROM (
          SELECT a.vec_id, c.cid,
                 CAST(round(${cos("a.embedding", "c.cv")} * 1000000, 0)
                   AS BIGINT) AS sim_ppm,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ${cos("a.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM arrivals a CROSS JOIN cent2 c) t
        WHERE rk = 1),
      bstat AS (
        SELECT cid, COUNT(*) AS n_base,
               CAST((SUM(sim_ppm + 1000000) // COUNT(*)) - 1000000
                 AS BIGINT) AS base_sim_ppm
        FROM bsim GROUP BY 1),
      astat AS (
        SELECT cid, COUNT(*) AS n_arrived,
               CAST((SUM(sim_ppm + 1000000) // COUNT(*)) - 1000000
                 AS BIGINT) AS arrived_sim_ppm
        FROM apick GROUP BY 1),
      audit AS (
        SELECT coalesce(b.cid, a.cid) AS c_id,
               CAST(coalesce(b.n_base, 0) AS BIGINT) AS n_base,
               CAST(coalesce(a.n_arrived, 0) AS BIGINT) AS n_arrived,
               CASE WHEN b.cid IS NULL THEN CAST(-1 AS BIGINT)
                    ELSE CAST((CAST(coalesce(a.n_arrived, 0) AS HUGEINT)
                      * 1000000) // b.n_base AS BIGINT) END AS growth_ppm,
               CAST(CASE WHEN b.cid IS NOT NULL AND a.cid IS NOT NULL
                    THEN a.arrived_sim_ppm - b.base_sim_ppm
                    ELSE 0 END AS BIGINT) AS drift_ppm
        FROM bstat b FULL OUTER JOIN astat a ON b.cid = a.cid),
      members AS (
        SELECT vec_id, embedding FROM corpus
        UNION ALL
        SELECT vec_id, embedding FROM arrivals),
      ${kmeansIterSql("cent2", 9, dim = 64, rel = "members")},
      ${kmeansPickSql("cent9", 10, rel = "members")},
      na AS (SELECT cid, COUNT(*) AS n_after FROM pick10 GROUP BY 1)
      SELECT a.c_id,
             CAST(CASE WHEN a.n_arrived > 0 AND (a.n_base = 0
                        OR a.growth_ppm >= 300000
                        OR a.drift_ppm <= -20000)
                  THEN 1 ELSE 0 END AS BIGINT) AS retrain,
             CAST(a.n_base + a.n_arrived AS BIGINT) AS n_before,
             CAST(coalesce(na.n_after, 0) AS BIGINT) AS n_after,
             CAST(coalesce(na.n_after, 0) - (a.n_base + a.n_arrived)
               AS BIGINT) AS delta_n,
             CASE WHEN c9.cid IS NULL THEN CAST(-1 AS BIGINT)
                  ELSE CAST(round(${cos("c2.cv", "c9.cv")} * 1000000, 0)
                    AS BIGINT) END AS move_ppm
      FROM audit a
        JOIN cent2 c2 ON c2.cid = a.c_id
        LEFT JOIN cent9 c9 ON c9.cid = a.c_id
        LEFT JOIN na ON na.cid = a.c_id
      ORDER BY a.c_id"""
    })

  val c81 = Q(
    "c81_retrain_migration",
    // Retrain migration matrix (Ann.retrainMigration) — what applying
    // c80's seeded refresh MOVES: per (old list -> new list) pair the
    // member count, moved=0 on the diagonal. Off-diagonal mass is the
    // only data a migration rewrites (Ann.migrateIndexDir rewrites
    // just the partitions a mover leaves or enters — dynamic
    // partition overwrite; full rewrite only if a list drains), so a
    // near-diagonal matrix is the evidence that seeded retrain costs
    // a few list rewrites, not an index rebuild. Row/column sums tie
    // to c80's n_before/n_after (spec-pinned); old side = stored
    // lists + assigned arrivals, new side = map-side argmaxAssign
    // against the refreshed centroids — two linear passes, no corpus
    // scan.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val arrivals = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) >= 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      Ann.retrainMigration(idx, arrivals, "vec_id", "embedding")
        .orderBy(col("from_c_id"), col("to_c_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      arrivals AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 >= 8),
      ${kmeansCtes(k = 8, iters = 2)},
      apick AS (
        SELECT vec_id, cid FROM (
          SELECT a.vec_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ${cos("a.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM arrivals a CROSS JOIN cent2 c) t
        WHERE rk = 1),
      old AS (
        SELECT vec_id, cid AS from_cid FROM pick3
        UNION ALL
        SELECT vec_id, cid FROM apick),
      members AS (
        SELECT vec_id, embedding FROM corpus
        UNION ALL
        SELECT vec_id, embedding FROM arrivals),
      ${kmeansIterSql("cent2", 9, dim = 64, rel = "members")},
      ${kmeansPickSql("cent9", 10, rel = "members")}
      SELECT o.from_cid AS from_c_id, p.cid AS to_c_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(CASE WHEN o.from_cid = p.cid THEN 0 ELSE 1 END
               AS BIGINT) AS moved
      FROM old o JOIN pick10 p USING (vec_id)
      GROUP BY o.from_cid, p.cid
      ORDER BY from_c_id, to_c_id"""
    })

  val c82 = Q(
    "c82_retrain_recall",
    // Did the retrain HELP? Per query, recall@5 vs the exact
    // brute-force baseline over base+arrivals, probed two ways with
    // the same nprobe=2 budget: BEFORE = the appended index (c79 —
    // arrivals in the lists, centroids still the ones trained before
    // the arrivals existed) vs AFTER = the migrated index (c80/c81 —
    // seeded refresh + list migration). The closing evidence of the
    // index-forever loop: drift that c79's audit flags should show up
    // here as recall the refresh recovers. Same plan class as c17 —
    // probes DPP-prune the lists, queries broadcast, the exact
    // baseline is the documented one-pass crossJoin.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val arrivals = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) >= 8)
      val queries = e.where(col("vec_id") < 5)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      val appended = Ann.appendIndex(idx, arrivals, "vec_id", "embedding")
      val migrated = Ann.migrateLists(idx, arrivals, "vec_id",
        "embedding")
      val exact = Ann.bruteForceTopK(base.unionByName(arrivals), queries,
        "vec_id", "embedding", k = 5)
      def recall(probed: org.apache.spark.sql.DataFrame, as: String) =
        exact.alias("e")
          .join(probed.alias("i"),
            col("e.q_id") === col("i.q_id") &&
              col("e.n_id") === col("i.n_id"), "left")
          .groupBy(col("e.q_id").as("q_id"))
          .agg(round(sum(when(col("i.n_id").isNotNull, 1).otherwise(0))
            .cast("double") / 5, 6).as(as))
      recall(Ann.indexedTopK(appended, queries, "vec_id", "embedding",
          nprobe = 2, k = 5), "recall_before")
        .join(recall(Ann.indexedTopK(migrated, queries, "vec_id",
          "embedding", nprobe = 2, k = 5), "recall_after"), Seq("q_id"))
        .orderBy(col("q_id"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      arrivals AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 >= 8),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      apick AS (
        SELECT vec_id, cid FROM (
          SELECT a.vec_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ${cos("a.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM arrivals a CROSS JOIN cent2 c) t
        WHERE rk = 1),
      members AS (
        SELECT vec_id, embedding FROM corpus
        UNION ALL
        SELECT vec_id, embedding FROM arrivals),
      ${kmeansIterSql("cent2", 9, dim = 64, rel = "members")},
      ${kmeansPickSql("cent9", 10, rel = "members")},
      lists_old AS (
        SELECT vec_id, cid FROM pick3
        UNION ALL
        SELECT vec_id, cid FROM apick),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN members v) t
        WHERE rk <= 5),
      qprobe_old AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 2),
      ivf_old AS (
        SELECT q_id, n_id FROM (
          SELECT p.q_id, a.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY p.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            a.vec_id) AS rk
          FROM qprobe_old p
            JOIN lists_old a ON a.cid = p.cid
            JOIN members v ON v.vec_id = a.vec_id
            JOIN queries q ON q.vec_id = p.q_id) t
        WHERE rk <= 5),
      qprobe_new AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent9 c) t
        WHERE rk <= 2),
      ivf_new AS (
        SELECT q_id, n_id FROM (
          SELECT p.q_id, a.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY p.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            a.vec_id) AS rk
          FROM qprobe_new p
            JOIN pick10 a ON a.cid = p.cid
            JOIN members v ON v.vec_id = a.vec_id
            JOIN queries q ON q.vec_id = p.q_id) t
        WHERE rk <= 5),
      rb AS (
        SELECT e.q_id,
               round(CAST(SUM(CASE WHEN i.n_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6)
                 AS recall_before
        FROM exact e
          LEFT JOIN ivf_old i ON i.q_id = e.q_id AND i.n_id = e.n_id
        GROUP BY e.q_id),
      ra AS (
        SELECT e.q_id,
               round(CAST(SUM(CASE WHEN i.n_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE) / 5, 6)
                 AS recall_after
        FROM exact e
          LEFT JOIN ivf_new i ON i.q_id = e.q_id AND i.n_id = e.n_id
        GROUP BY e.q_id)
      SELECT rb.q_id, rb.recall_before, ra.recall_after
      FROM rb JOIN ra USING (q_id)
      ORDER BY rb.q_id"""
    })

  val c83 = Q(
    "c83_filtered_ann",
    // Filtered (metadata-constrained) vector search over the
    // persisted IVF index (Ann.indexedFilteredTopK): each query's own
    // label is its predicate — top-3 nearest list members that SHARE
    // the query's label, nprobe=3. The filter rides the broadcast
    // probe join (q_label travels with the probes, the equality binds
    // before the cosine), so the lists scan keeps its c_id DPP
    // pruning and non-matching members never pay the similarity. The
    // classic filtered-ANN caveat is the operator's own output
    // surface: a selective filter thins probed lists, so a query can
    // return fewer than k rows at fixed nprobe — the signal to raise
    // nprobe or partition the index by label.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      Ann.indexedFilteredTopK(idx, e.where(col("vec_id") < 5), "vec_id",
          "embedding", "label", nprobe = 3, k = 3)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(filteredAnnOracleSql))

  /** Shared DuckDB mirror of the filtered probe (c83 flat layout and
    * c84 label-partitioned layout — identical results by contract;
    * only the physical lists layout differs). */
  private[operators] lazy val filteredAnnOracleSql: String = {
    def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
    s"""
      WITH corpus AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      queries AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 3)
      SELECT q_id, rank, n_id, label, c_id, sim FROM (
        SELECT p.q_id, a.vec_id AS n_id, v.label, p.cid AS c_id,
               ${cos("v.embedding", "q.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                 ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                          a.vec_id) AS rank
        FROM qprobe p
          JOIN pick3 a ON a.cid = p.cid
          JOIN corpus v ON v.vec_id = a.vec_id
          JOIN queries q ON q.vec_id = p.q_id
        WHERE v.label = q.label) t
      WHERE rank <= 3
      ORDER BY q_id, rank"""
  }

  val c84 = Q(
    "c84_ann_label_partition",
    // The SCALE PATH for selective filtered search: c83's contract
    // over a LABEL-PARTITIONED lists layout (Ann.writeIndexByLabel /
    // indexedFilteredTopKByLabel — lists partitioned by
    // (label, c_id), the query's label joins as a KEY next to c_id),
    // so the scan dynamic-prunes on BOTH partition columns and reads
    // exactly the (query label x probed centroid) directories; a
    // selective filter stops thinning probed lists because each
    // label owns complete per-centroid lists of its own members.
    // Results are IDENTICAL to c83 by contract (same oracle;
    // DedupAnnSpec cross-pins the two outputs row for row) — the
    // layout is the operator.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2-bylabel",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndexByLabel(base, "vec_id", "embedding", k = 8,
          iters = 2, tmp)
      } { b => Ann.readIndexByLabel(s, b) }
      Ann.indexedFilteredTopKByLabel(idx, e.where(col("vec_id") < 5),
          "vec_id", "embedding", "label", nprobe = 3, k = 3)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(filteredAnnOracleSql))

  val c85 = Q(
    "c85_paragraph_dedup",
    // Paragraph-granularity dedup, FIRST-OCCURRENCE-KEEPS
    // (Dedup.paragraphDedup — the C4/RefinedWeb boilerplate rule over
    // fixed 16-token blocks, the corpus having no newline structure):
    // every repeated block occurrence AFTER the first in global
    // (doc, position) order is removed; exactly one copy of each
    // repeated paragraph survives corpus-wide. The semantic
    // complement of c78's ExactSubstr deletion, which removes ALL
    // occurrences. Map-side block hashing (disjoint blocks — total
    // fold work = |tokens|), one block-hash exchange for the
    // first-occurrence rank, did-keyed removal list joined back for
    // the map-side re-render.
    (s, d) => Dedup.paragraphDedup(Tables.documents(s, d), "doc_id",
        "text", p = 16)
      .orderBy(col("doc_id")),
    Some(s"""
      ${Dedup.paragraphDedupSql("doc_id", "text", 16, 16)}
      ORDER BY doc_id"""))

  val c86 = Q(
    "c86_epoch_repeat",
    // Fractional-epoch REPEAT (Sampling.epochRepeat/epochAudit) —
    // the data-constrained mirror of c32: the same isqrt-flattened
    // share of a 2.5x token budget, but where c32 caps the rate at
    // 1.0 and samples DOWN, c86 runs it past 1.0 and repeats UP —
    // each doc emitted floor(epochs) times plus once more iff its
    // stable hash bucket falls below the fractional remainder, so a
    // 2.4-epoch source repeats every doc twice and the SAME
    // deterministic 40% a third time in every run (Muennighoff et
    // al., data-constrained scaling). Copy generation is a map-side
    // explode off a broadcast one-row-per-source target table — no
    // shuffle in the repeat; the audit aggregates the EMITTED frame
    // so the oracle checks the emit path, not a closed form.
    (s, d) => Sampling.epochAudit(Tables.documents(s, d), "source",
        "doc_id", "text", budgetPpm = 2500000L)
      .orderBy(col("source")),
    Some(s"""
      ${Sampling.epochAuditSql("source", "doc_id", "text", 2500000L)}
      ORDER BY source"""))

  val c87 = Q(
    "c87_hard_negatives",
    // Hard-negative mining for contrastive/retrieval training
    // (Ann.indexedHardNegatives) — the complement of c83: for each
    // query, the top-3 most-similar index members with a DIFFERENT
    // label. High-similarity different-label neighbors are the
    // negatives that carry gradient signal (ANCE); the mine is the
    // same c29 probe with the inequality riding the probe join, so
    // the lists scan keeps DPP pruning and same-label members never
    // pay the cosine. Anti-selective by construction: != thins each
    // probed list only by the query's own class share.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val idx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(base, "vec_id", "embedding", k = 8, iters = 2,
          tmp)
      } { b => Ann.readIndex(s, b) }
      Ann.indexedHardNegatives(idx, e.where(col("vec_id") < 5),
          "vec_id", "embedding", "label", nprobe = 3, k = 3)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id >= 5 AND vec_id % 10 < 8),
      queries AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < 5),
      ${kmeansCtes(k = 8, iters = 2)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 3)
      SELECT q_id, q_label, rank, n_id, label, c_id, sim FROM (
        SELECT p.q_id, q.label AS q_label, a.vec_id AS n_id, v.label,
               p.cid AS c_id,
               ${cos("v.embedding", "q.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY p.q_id
                 ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                          a.vec_id) AS rank
        FROM qprobe p
          JOIN pick3 a ON a.cid = p.cid
          JOIN corpus v ON v.vec_id = a.vec_id
          JOIN queries q ON q.vec_id = p.q_id
        WHERE v.label <> q.label) t
      WHERE rank <= 3
      ORDER BY q_id, rank"""
    })

  val c88 = Q(
    "c88_session_transcripts",
    // Corpus assembly from event logs (Streams.sessionTranscripts):
    // each 30-min-gap session renders as one ordered text line of
    // `type@offset_s` tokens — the behavioral-corpus step that turns
    // telemetry into trainable documents for the text pipeline. Same
    // single-shuffle core as d2's sessionize; in-group order is the
    // deterministic id-ordered fold, so the rendered line is
    // identical under any partitioning.
    (s, d) => graft.streaming.Streams.sessionTranscripts(
        Tables.events(s, d), gapUs = 1800000000L)
      .orderBy(col("user_id"), col("start_us")),
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events),
      l AS (
        SELECT *, LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS prev FROM e),
      f AS (
        SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                       THEN 1 ELSE 0 END AS brk FROM l),
      s AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess FROM f),
      s2 AS (
        SELECT *, MIN(us) OVER (PARTITION BY user_id, sess) AS start_us,
               MAX(us) OVER (PARTITION BY user_id, sess) AS end_us
        FROM s)
      SELECT user_id, MIN(start_us) AS start_us,
             COUNT(*) AS n_events,
             CAST((MIN(end_us) - MIN(start_us)) // 1000000 AS BIGINT)
               AS duration_s,
             string_agg(event_type || '@' ||
                 CAST((us - start_us) // 1000000 AS VARCHAR), ' '
               ORDER BY us, event_id) AS transcript
      FROM s2
      GROUP BY user_id, sess
      ORDER BY user_id, start_us"""))

  val c89 = Q(
    "c89_takedown_audit",
    // Takedown/opt-out propagation through the PERSISTED artifact
    // family — the r9-verdict gap #1 (a production pipeline hits this
    // the first time a deletion request lands; until now the only
    // path was a full rebuild of every artifact). The audit prices a
    // deterministic delete set (docs doc_id%10==3 inside the indexed
    // corpus; vectors vec_id%10==5 inside the indexed base) against
    // every artifact: the dedup band index (per-band row counts), the
    // shingle table, the span WindowIndex (a COUNT artifact — deletes
    // DECREMENT, and a hash leaves the index only when its count
    // reaches zero), the IVF inverted lists (per-list member counts,
    // Ann.takedownAudit), and the keeper map REBUILT from the
    // compacted index (Dedup.clustersFromIndex — components can
    // legitimately SPLIT when a bridge doc is deleted, so
    // n_after != n_before - n_deleted is a real outcome a row
    // tombstone could not express). The physical applies
    // (PartitionedRewrite.deleteRows over the bucket/c_id-partitioned
    // layouts, deleteFromWindowIndexDir's merge flavor) rewrite ONLY
    // touched partitions and are delete-equals-rebuild spec-pinned in
    // DedupAnnSpec; d39 is the streaming delete-feed flavor.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val delDocs = corpus.where(pmod(col("doc_id"), lit(10)) === 3)
      val e = Tables.embeddings(s, d)
      val baseE = e.where(col("vec_id") >= 5 &&
        pmod(col("vec_id"), lit(10)) < 8)
      val delVec = baseE.where(pmod(col("vec_id"), lit(10)) === 5)
      val dIdx = graft.util.DiskCache.cached(s, "dedup-index", "v2",
        Seq(s"$d/documents.parquet"), "mod10lt8-k48b24",
        Seq("shingles", "bands")) { tmp =>
        Dedup.writeIndex(corpus, "doc_id", "text", k = 48, bands = 24, tmp)
      } { base => Dedup.readIndex(s, base) }
      val widx = graft.util.DiskCache.cached(s, "span-index", "v2",
        Seq(s"$d/documents.parquet"), "mod10lt8-w16", Seq("windows")) {
        tmp => Dedup.writeWindowIndex(corpus, "doc_id", "text", 16, tmp)
      } { b => Dedup.readWindowIndex(s, b) }
      val aIdx = graft.util.DiskCache.cached(s, "ann-index", "v1",
        Seq(s"$d/embeddings.parquet"), "ge5mod10lt8-k8i2",
        Seq("centroids", "lists")) { tmp =>
        Ann.writeIndex(baseE, "vec_id", "embedding", k = 8, iters = 2, tmp)
      } { b => Ann.readIndex(s, b) }
      def summary(art: String, df: org.apache.spark.sql.DataFrame) = df
        .select(lit(art).as("artifact"), lit(-1L).as("part"),
          col("nb").cast("long").as("n_before"),
          col("ndel").cast("long").as("n_deleted"),
          (col("nb") - col("ndel")).cast("long").as("n_after"))
      val delFlag = sum(when(pmod(col("did"), lit(10)) === 3, 1L)
        .otherwise(0L)).as("ndel")
      val bandsRows = dIdx.bands.groupBy(col("band_idx"))
        .agg(count(lit(1)).as("nb"), delFlag)
        .select(lit("bands").as("artifact"),
          col("band_idx").cast("long").as("part"),
          col("nb").cast("long").as("n_before"),
          col("ndel").cast("long").as("n_deleted"),
          (col("nb") - col("ndel")).cast("long").as("n_after"))
      val shRow = summary("shingles",
        dIdx.shingles.agg(count(lit(1)).as("nb"), delFlag))
      val dc = Dedup.buildWindowIndex(delDocs, "doc_id", "text", 16)
        .select(col("h"), col("nd").as("dnd"))
      val wRow = summary("windows",
        widx.hashes.join(dc, Seq("h"), "left")
          .agg(count(lit(1)).as("nb"),
            sum(when(coalesce(col("dnd"), lit(0L)) === col("nd"), 1L)
              .otherwise(0L)).as("ndel")))
      val ivfRows = Ann
        .takedownAudit(aIdx, delVec.select(col("vec_id").as("n_id")))
        .select(lit("ivf_lists").as("artifact"),
          col("c_id").cast("long").as("part"),
          col("n_before"), col("n_deleted"), col("n_after"))
      val mBefore = Dedup.clustersFromIndex(dIdx, 0.5)
      val mAfter = Dedup.clustersFromIndex(
        Dedup.deleteFromIndex(dIdx,
          delDocs.select(col("doc_id").as("did"))), 0.5)
      val kRow = mBefore.agg(count(lit(1)).as("nb"), delFlag)
        .crossJoin(mAfter.agg(count(lit(1)).as("na")))
        .select(lit("keeper_map").as("artifact"), lit(-1L).as("part"),
          col("nb").cast("long").as("n_before"),
          col("ndel").cast("long").as("n_deleted"),
          col("na").cast("long").as("n_after"))
      bandsRows.unionAll(shRow).unionAll(wRow).unionAll(ivfRows)
        .unionAll(kRow)
        .orderBy(col("artifact"), col("part"))
    },
    Some {
      val th = s"""list_transform(string_split(text, ' '),
        tok -> ${TextOps.polyHashSql("tok")})"""
      s"""
      WITH RECURSIVE
      corpusdocs AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
      cnts AS (SELECT COUNT(*) AS nb,
                 SUM(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) AS ndel
               FROM corpusdocs),
      wth AS (SELECT doc_id, $th AS th FROM corpusdocs),
      wocc AS (SELECT doc_id,
                 unnest(${TextOps.ngramHashesSql("th", 16)}) AS h
               FROM wth),
      wcnt AS (SELECT h, COUNT(*) AS nd,
                 SUM(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) AS dnd
               FROM wocc GROUP BY 1),
      corpus AS (SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id >= 5 AND vec_id % 10 < 8),
      ${kmeansCtes(k = 8, iters = 2)},
      sh0 AS (SELECT doc_id, unnest($SH) AS s FROM corpusdocs),
      sizes0 AS (SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY 1),
      inter0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                 FROM sh0 a JOIN sh0 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
      pairs0 AS (SELECT id_a, id_b FROM inter0
                   JOIN sizes0 sa ON id_a = sa.doc_id
                   JOIN sizes0 sb ON id_b = sb.doc_id
                 WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6)
                   >= 0.5),
      und0 AS (SELECT id_a AS a, id_b AS b FROM pairs0
               UNION ALL SELECT id_b, id_a FROM pairs0),
      reach0(n, m) AS (
        SELECT a, b FROM und0
        UNION
        SELECT r.n, u.b FROM reach0 r JOIN und0 u ON r.m = u.a),
      mb AS (SELECT n AS doc_id FROM reach0 GROUP BY n),
      und1 AS (SELECT a, b FROM und0
               WHERE a % 10 != 3 AND b % 10 != 3),
      reach1(n, m) AS (
        SELECT a, b FROM und1
        UNION
        SELECT r.n, u.b FROM reach1 r JOIN und1 u ON r.m = u.a),
      ma AS (SELECT n AS doc_id FROM reach1 GROUP BY n)
      SELECT artifact, part, n_before, n_deleted, n_after FROM (
        SELECT 'bands' AS artifact, CAST(g.b AS BIGINT) AS part,
               CAST(nb AS BIGINT) AS n_before,
               CAST(ndel AS BIGINT) AS n_deleted,
               CAST(nb - ndel AS BIGINT) AS n_after
        FROM cnts, (SELECT unnest(range(0, 24)) AS b) g
        UNION ALL
        SELECT 'shingles', CAST(-1 AS BIGINT), CAST(nb AS BIGINT),
               CAST(ndel AS BIGINT), CAST(nb - ndel AS BIGINT)
        FROM cnts
        UNION ALL
        SELECT 'windows', CAST(-1 AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN dnd = nd THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) -
                 SUM(CASE WHEN dnd = nd THEN 1 ELSE 0 END) AS BIGINT)
        FROM wcnt
        UNION ALL
        SELECT 'ivf_lists', CAST(p.cid AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN p.vec_id % 10 = 5 THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST(COUNT(*) -
                 SUM(CASE WHEN p.vec_id % 10 = 5 THEN 1 ELSE 0 END)
                 AS BIGINT)
        FROM pick3 p GROUP BY p.cid
        UNION ALL
        SELECT 'keeper_map', CAST(-1 AS BIGINT),
               CAST((SELECT COUNT(*) FROM mb) AS BIGINT),
               CAST((SELECT COUNT(*) FROM mb WHERE doc_id % 10 = 3)
                 AS BIGINT),
               CAST((SELECT COUNT(*) FROM ma) AS BIGINT))
      ORDER BY artifact, part"""
    })

  val c90 = Q(
    "c90_surprisal_quantile_sketch",
    // Mergeable log-bucketed quantile sketch (QuantileSketch) over
    // the per-doc unigram-surprisal ppm (c28's quality signal) — the
    // bounded-state quantile path for UNBOUNDED domains, where c38's
    // exact histogram would carry one row per distinct value: state
    // is ≤252 (bucket, n) rows whatever the corpus size, counts add
    // across shards/batches (merge == global, spec-pinned in
    // QuantileSketchSpec), and the p50/p90/p99 nearest-rank marks
    // land within one sub-bucket (≤25% relative). All bucket math is
    // bitlength + integer shifts (§4 — no float log), so the DuckDB
    // oracle reproduces the sketch bit-for-bit.
    (s, d) => {
      import graft.util.Barriers.BarrierOps
      // barrier: both metric sketches read the one surprisal pass —
      // without it each sketch re-runs the corpus scoring
      val sur = CorpusStats.unigramSurprisal(
        Tables.documents(s, d), "doc_id", "text").barrier(true)
      val marks = Seq("p50" -> 500000L, "p90" -> 900000L,
        "p99" -> 990000L)
      // two metrics off the one surprisal pass: the quality signal
      // (mean bits ppm — narrow domain, few buckets) and the doc
      // length (n_tokens — the c37 packing input, wide domain)
      QuantileSketch.quantiles(
          QuantileSketch.sketch(sur, "mean_bits_ppm"), marks)
        .withColumn("metric", lit("mean_bits_ppm"))
        .unionByName(QuantileSketch.quantiles(
            QuantileSketch.sketch(sur, "n_tokens"), marks)
          .withColumn("metric", lit("n_tokens")))
        .orderBy(col("metric"), col("bucket"))
    },
    Some {
      val qsql = QuantileSketch.quantilesSql(
        Seq("p50" -> 500000L, "p90" -> 900000L, "p99" -> 990000L))
      s"""
      WITH src AS (${CorpusStats.unigramSurprisalSql("doc_id", "text")}),
      m1 AS (WITH vals AS (SELECT mean_bits_ppm AS v FROM src),
        $qsql),
      m2 AS (WITH vals AS (SELECT n_tokens AS v FROM src),
        $qsql)
      SELECT 'mean_bits_ppm' AS metric, * FROM m1
      UNION ALL
      SELECT 'n_tokens' AS metric, * FROM m2
      ORDER BY metric, bucket"""
    })

  val c91 = Q(
    "c91_window_index_append_audit",
    // Incremental re-price of the span WindowIndex — c89's decrement
    // in REVERSE (Dedup.incrementWindowIndex): arriving docs' window
    // hashes fold into the persisted COUNT artifact with one linear
    // pass over the batch, no corpus rescan, so d33's span gate can
    // absorb arrivals into the corpus contract at append cost. The
    // audit prices the increment per hash bucket (the c81 partition
    // seam appendToWindowIndexDir rewrites): hashes already indexed
    // (n_before), index-new hashes the batch opens (n_new), existing
    // hashes it increments (n_upd), occurrence mass added
    // (occ_added), and the bucket's post-append size (n_after =
    // n_before + n_new). Bounded output (IndexBuckets rows);
    // append-equals-rebuild and untouched-bucket byte-identity are
    // spec-pinned in DedupAnnSpec.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val arrivals = docs.where(pmod(col("doc_id"), lit(10)) >= 8)
      val widx = graft.util.DiskCache.cached(s, "span-index", "v2",
        Seq(s"$d/documents.parquet"), "mod10lt8-w16", Seq("windows")) {
        tmp => Dedup.writeWindowIndex(corpus, "doc_id", "text", 16, tmp)
      } { b => Dedup.readWindowIndex(s, b) }
      val inc = Dedup.buildWindowIndex(arrivals, "doc_id", "text", 16)
        .select(col("h"), col("nd").as("ind"))
      val j = widx.hashes.join(inc, Seq("h"), "full")
        .select(col("nd"), col("ind"),
          pmod(col("h"), lit(Dedup.IndexBuckets.toLong)).as("bk"))
      j.groupBy(col("bk"))
        .agg(
          sum(when(col("nd").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_before"),
          sum(when(col("nd").isNull, 1L).otherwise(0L))
            .cast("long").as("n_new"),
          sum(when(col("nd").isNotNull && col("ind").isNotNull, 1L)
            .otherwise(0L)).cast("long").as("n_upd"),
          sum(coalesce(col("ind"), lit(0L))).cast("long").as("occ_added"))
        .withColumn("n_after",
          (col("n_before") + col("n_new")).cast("long"))
        .orderBy(col("bk"))
    },
    Some {
      val th = s"""list_transform(${TextOps.tokensSql("text")},
        tok -> ${TextOps.polyHashSql("tok")})"""
      s"""
      WITH thc AS (SELECT $th AS th FROM documents WHERE doc_id % 10 < 8),
      cw AS (SELECT u AS h, CAST(COUNT(*) AS BIGINT) AS nd
             FROM (SELECT unnest(${TextOps.ngramHashesSql("th", 16)}) AS u
                   FROM thc)
             GROUP BY 1),
      tha AS (SELECT $th AS th FROM documents WHERE doc_id % 10 >= 8),
      aw AS (SELECT u AS h, CAST(COUNT(*) AS BIGINT) AS ind
             FROM (SELECT unnest(${TextOps.ngramHashesSql("th", 16)}) AS u
                   FROM tha)
             GROUP BY 1),
      j AS (SELECT coalesce(cw.h, aw.h) AS h, cw.nd AS nd, aw.ind AS ind
            FROM cw FULL JOIN aw ON cw.h = aw.h)
      SELECT CAST(h % ${Dedup.IndexBuckets} AS BIGINT) AS bk,
             CAST(SUM(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_before,
             CAST(SUM(CASE WHEN nd IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN nd IS NOT NULL AND ind IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
             CAST(SUM(coalesce(ind, 0)) AS BIGINT) AS occ_added,
             CAST(SUM(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END) +
                  SUM(CASE WHEN nd IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_after
      FROM j
      GROUP BY 1
      ORDER BY bk"""
    })

  val c92 = Q(
    "c92_sketch_ks_drift",
    // KS-style per-source length-distribution drift computed ONLY
    // from c90 sketch states (QuantileSketch.ksDrift) — the
    // artifact-vs-artifact compare c43 can't do: c43's L1 needs the
    // corpus-sized unigram tables, while this reads each source's
    // ≤252-row sketch and the corpus blend (which IS the fold of the
    // per-source states — mergeability makes the reference free).
    // Two shards/days/sources compare without any raw-data rescan:
    // the shape a 100 TB ingest monitor actually runs, since the
    // states are what the d40 stream already maintains. Distance =
    // max over buckets of |cum_g ppm − cum_all ppm|; everything past
    // the one corpus pass is |sources| × ≤252-row arithmetic.
    (s, d) => QuantileSketch.ksDrift(
      Tables.documents(s, d).select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("v")),
      "source", "v"),
    Some(QuantileSketch.ksDriftSql("documents", "source",
      s"len(${TextOps.tokensSql("text")})")))

  val c93 = Q(
    "c93_image_resize",
    // Block-mean gray8 resize to an 8×8 thumbnail
    // (Multimodal.resizeGray8) — the image-preprocessing step before
    // feature extraction, on the opaque-payload contract: the blob
    // reads as a row-major w×h raster (w from the blob table's
    // metadata, ragged last row), each output pixel is the exact
    // integer floor-mean of its source block, empty/degenerate
    // blocks emit -1 (decode shortfall is data, not an exception).
    // Map-only per-row higher-order functions — no shuffle, no UDF;
    // a real decoder feeds pixel buffers through the same column
    // (the BlobCodec boundary, c12).
    (s, d) => Multimodal.resizeGray8(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("doc_id"), col("k")),
    Some(Multimodal.resizeGray8Sql("doc_id", "text")))

  val c94 = Q(
    "c94_video_frame_sample",
    // Stride frame-sampling over video-shaped payloads
    // (Multimodal.frameSample) — the subsample step a video pipeline
    // runs instead of decoding every frame: 256-byte frames (full
    // frames only, c18's convention), every 4th kept, per kept frame
    // the fps-25 timestamp in integer ms, floor-mean luma ×100 and a
    // rolling content hash (the cross-modal dedup/alignment key).
    // Exact integers end to end, map-only per row.
    (s, d) => Multimodal.frameSample(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("doc_id"), col("frame_idx")),
    Some(Multimodal.frameSampleSql("doc_id", "text")))

  val c95 = Q(
    "c95_bottomk_sample",
    // Per-source bottom-k-by-hash sample over DISTINCT content + the
    // KMV distinct estimate (Sampling.bottomKSample): k smallest
    // mixed poly hashes per source, rep_id = min doc id per hash —
    // a duplication-invariant uniform QA sample (a doc crawled a
    // million times holds one slot) whose k-th hash doubles as the
    // distinct-count estimator est = (k−1)·P div h_k, emitted next
    // to the exact count so the synopsis audits itself. Mergeable
    // bottom-k state (the d43 streaming seam); one map-side-
    // combinable groupBy + the TopKPerKey bounded heap.
    (s, d) => Sampling.bottomKSample(Tables.documents(s, d),
        "source", "doc_id", "text")
      .orderBy(col("source"), col("rk")),
    Some(Sampling.bottomKSampleSql("source", "doc_id", "text")))

  val c96 = Q(
    "c96_embedding_pca",
    // Top principal component of the int8 embedding codes by
    // fixed-point power iteration (Ann.pcaTop) — the spectral half
    // of c69's embedding-health audit: 3 exact-integer v ← B·v
    // rounds on the CENTERED scatter B = n·QᵀQ − m·mᵀ, computed
    // matrix-free (two linear passes per round, 64-row broadcast
    // artifacts between, codes materialized once). A dominant
    // component = the embedding collapsed toward a line (anisotropy)
    // and cosine retrieval is about to stop separating — the joint-
    // structure failure c69's marginals can't see. Oracle replays
    // the identical rounds, digit-exact.
    (s, d) => Ann.pcaTop(Tables.embeddings(s, d), "vec_id", "embedding"),
    Some(Ann.pcaTopSql()))

  val c97 = Q(
    "c97_priority_sample",
    // Deterministic token-mass-weighted PRIORITY SAMPLING per source
    // (Sampling.prioritySample — Duffield–Lund–Thorup integerized):
    // priority = id-hash div token-count, k smallest kept — docs
    // sampled ≈ proportional to token mass, the right sampler when
    // the budget is tokens (uniform doc sampling over-represents
    // short docs' tokens). The DLT threshold estimator of total
    // token mass rides along next to the exact total (self-auditing,
    // c95's discipline). Mergeable bottom-k (d43's fold pattern);
    // map-only priorities + TopKPerKey bounded heap.
    (s, d) => Sampling.prioritySample(Tables.documents(s, d),
        "source", "doc_id", "text")
      .orderBy(col("source"), col("rk")),
    Some(Sampling.prioritySampleSql("source", "doc_id", "text")))

  val c98 = Q(
    "c98_epoch_shuffle",
    // Deterministic epoch shuffle + mixing-quality audit
    // (Packing.epochShuffle) — the training-order step between
    // mixing (c32/c86) and packing (c37/c48): a stable per-epoch
    // hash permutation (reproducible for resumable loaders),
    // sharded by key mod S, audited per shard for balance (doc/
    // token mass), clumping (same-source adjacency count — a
    // shuffle that leaves source runs intact feeds correlated
    // batches), and an order-sensitive position checksum the loader
    // re-derives to prove it read the right order. The within-shard
    // window is the shard write's own sort; S scales with the
    // cluster.
    (s, d) => Packing.epochShuffle(Tables.documents(s, d),
      "doc_id", "text", "source", epoch = 1L),
    Some(Packing.epochShuffleSql("doc_id", "text", "source",
      epoch = 1L)))

  val c99 = Q(
    "c99_perplexity_buckets",
    // CCNet-style head/middle/tail perplexity bucketing
    // (CorpusStats.perplexityBuckets, Wenzek et al. LREC 2020): every
    // doc scored against the reference-split bigram LM, corpus split
    // into surprisal TERCILES via the c90 sketch's nearest-rank
    // marks (sketch-granular thresholds — deterministic, oracle-
    // exact), audited per (source, bucket) with docs / token mass /
    // summed surprisal. The quality triage CCNet runs first, kept as
    // buckets so downstream mixing can weight them.
    (s, d) => {
      val docs = Tables.documents(s, d)
      // reference LM AT REST (shared with d40/d45 — same %10<8 split)
      CorpusStats.perplexityBuckets(docs, "doc_id", "text", "source",
        lmPre = Some(CorpusStats.bigramLmCached(s, d, "mod10lt8",
          docs.where(pmod(col("doc_id"), lit(10)) < 8), "text")))
    },
    Some(CorpusStats.perplexityBucketsSql("doc_id", "text", "source")))

  val c100 = Q(
    "c100_data_card",
    // Per-source DATA CARD (CorpusStats.dataCard — "Datasheets for
    // Datasets", Gebru et al. 2021): size (docs/token mass/min-max),
    // corpus-wide duplication exposure, language mix, integerized
    // quality mass, and sketch-state KS drift vs the corpus blend —
    // the engine's own audit primitives composed into the one-frame
    // report a corpus owner reads before training. Three partial-
    // aggregable passes joined on the |sources|-row key.
    (s, d) => CorpusStats.dataCard(Tables.documents(s, d),
      "doc_id", "text", "source"),
    Some(CorpusStats.dataCardSql("doc_id", "text", "source")))

  val c101 = Q(
    "c101_gopher_rules",
    // The five word-level Gopher quality rules (Rae et al. 2021,
    // Appendix A1.1) as an explicit per-source rule-gate audit
    // (TextQuality.gopherRules): independent fail counts per rule
    // (which rule kills how many docs — the tuning view c9's
    // composite hides) + kept doc/token mass and kept_ppm. Every
    // ratio rule is a cross-multiplied integer comparison (§4), the
    // flags are one map stage, the audit one partial-aggregable
    // groupBy — the gate shape a 100 TB filter pass needs. Raw sums
    // are mergeable (the d46 streaming fold state).
    (s, d) => TextQuality.gopherRules(Tables.documents(s, d),
      "doc_id", "text", "source"),
    Some(TextQuality.gopherRulesSql("doc_id", "text", "source")))

  val c102 = Q(
    "c102_hamming_ann",
    // Binary-sketch ANN (Ann.hammingTopK — the SimHash/binary-
    // passage-retrieval member of the compressed-ANN family next to
    // c24's int8 and c61's PQ): 1 bit per dimension, mean-balanced
    // via cross-multiplied integer thresholds (§4 — no float mean),
    // packed into two longs (16 B/vector: a 32× smaller scan than
    // floats, 4× smaller than int8), Hamming = two XOR+popcounts.
    // Threshold artifact = one bounded agg; encode = map-side vs the
    // broadcast row (NO shuffle); scan = broadcast-query crossJoin +
    // TopKPerKey heap; only the top-50 shortlist fetches floats for
    // the exact rescore, with exact-top-5 membership flagged per row
    // (the c61 funnel + evidence shape).
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.hammingTopK(e.where(col("vec_id") >= 5),
          e.where(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      thr AS (
        SELECT t.i AS dim,
               SUM(CAST(FLOOR(CAST(c.embedding[t.i] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT)) AS s,
               CAST(COUNT(*) AS HUGEINT) AS n
        FROM corpus c CROSS JOIN range(1, 65) t(i)
        GROUP BY t.i),
      cbits AS (
        SELECT c.vec_id, t.dim,
               CASE WHEN CAST(FLOOR(CAST(c.embedding[t.dim] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT) * t.n > t.s
                 THEN 1 ELSE 0 END AS bit
        FROM corpus c CROSS JOIN thr t),
      qbits AS (
        SELECT q.vec_id, t.dim,
               CASE WHEN CAST(FLOOR(CAST(q.embedding[t.dim] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT) * t.n > t.s
                 THEN 1 ELSE 0 END AS bit
        FROM queries q CROSS JOIN thr t),
      ccode AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dim <= 32 THEN bit
                 * CAST(pow(2, dim - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS c_lo,
               CAST(SUM(CASE WHEN dim > 32 THEN bit
                 * CAST(pow(2, dim - 33) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS c_hi
        FROM cbits GROUP BY vec_id),
      qcode AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dim <= 32 THEN bit
                 * CAST(pow(2, dim - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS q_lo,
               CAST(SUM(CASE WHEN dim > 32 THEN bit
                 * CAST(pow(2, dim - 33) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS q_hi
        FROM qbits GROUP BY vec_id),
      cand AS (
        SELECT q_id, n_id, hamming FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 CAST(bit_count(xor(c.c_lo, q.q_lo))
                   + bit_count(xor(c.c_hi, q.q_hi)) AS BIGINT) AS hamming,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(c.c_lo, q.q_lo))
                     + bit_count(xor(c.c_hi, q.q_hi)), c.vec_id) AS hrank
          FROM ccode c CROSS JOIN qcode q) t
        WHERE hrank <= 50),
      rescored AS (
        SELECT cand.q_id, cand.n_id, cand.hamming,
               ${cos("v.embedding", "q.embedding")} AS sim,
               ROW_NUMBER() OVER (PARTITION BY cand.q_id
                 ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                          cand.n_id) AS rank
        FROM cand
          JOIN corpus v ON v.vec_id = cand.n_id
          JOIN queries q ON q.vec_id = cand.q_id),
      approx AS (SELECT * FROM rescored WHERE rank <= 5),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5)
      SELECT a.q_id AS q_id, CAST(a.rank AS BIGINT) AS rank,
             a.n_id AS n_id, a.hamming, a.sim,
             e.n_id IS NOT NULL AS in_exact
      FROM approx a
        LEFT JOIN exact e ON e.q_id = a.q_id AND e.n_id = a.n_id
      ORDER BY a.q_id, a.rank"""
    })

  val c103 = Q(
    "c103_winnowing",
    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD 2003 —
    // the MOSS scheme, Dedup.winnowingPairs): every w-window of
    // kg-gram rolling hashes contributes its minimum, giving a
    // candidate index with a proven guarantee (any shared run >=
    // w+kg-1 tokens IS caught) at ~2/(w+1) the density of c30's
    // every-window index — the subsampled fingerprint index a 100 TB
    // corpus can afford to persist. Output: doc pairs sharing >= 2
    // prints with the winnowed-Jaccard estimate as integer ppm.
    // Shape: one native map-side pass per doc (expr.WinnowPrints —
    // rolling gram hashes + monotonic-deque sliding min + per-doc
    // distinct, O(tokens), zero shuffles) → hash equi-join (a hash
    // is its own bucket) + linear count-backs.
    (s, d) => Dedup.winnowingPairs(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")),
    Some(Dedup.winnowingPairsSql("doc_id", "text")))

  val c104 = Q(
    "c104_hybrid_rrf",
    // Reciprocal-rank fusion (Cormack et al. SIGIR 2009,
    // Retrieval.hybridRrf) of the two retrieval legs the engine
    // already has — BM25 (c36, lexical) and dense mock-embedding
    // cosine (c15's provider) — each top-20 per eval doc, fused as
    // rrf_ppm = Σ 10^6 div (60 + rank): integer-exact, and rank-based
    // so BM25's integer scores and cosine's [-1,1] never need
    // calibration (why RRF is the standard hybrid baseline; the
    // contamination-triage upgrade over either leg alone). Absent
    // legs contribute 0 (rank 0 = absent). Fusion joins two tiny
    // rank lists full-outer; each leg keeps its own bounded shape.
    // Since r15 the BM25 leg probes the shared at-rest impact index
    // (c36's artifact — same split, same df cap).
    (s, d) => {
      val docs = Tables.documents(s, d)
      Retrieval.hybridRrf(docs, "doc_id", "text",
          pmod(col("doc_id"), lit(101)) === 0, k = 5,
          contribPre = Some(Retrieval.bm25ImpactsCached(s, d,
            "mod101ne0-df1m",
            docs.where(pmod(col("doc_id"), lit(101)) =!= 0),
            "doc_id", "text")))
        .orderBy(col("eval_id"), col("rank"))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      s"""
      WITH tt AS (
        SELECT doc_id, (doc_id % 101 = 0) AS is_q,
               unnest(${TextOps.tokensSql("text")}) AS tok
        FROM documents),
      tk AS (SELECT * FROM tt WHERE tok <> ''),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk
             WHERE NOT is_q GROUP BY 1, 2),
      lens AS (SELECT doc_id, COUNT(*) AS len FROM tk
               WHERE NOT is_q GROUP BY 1),
      totals AS (SELECT COUNT(*) AS n_train,
                        CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
      dft AS (
        SELECT k.tok, k.df, t.n_train, t.tot_len,
               ${Retrieval.bitLenSql("(t.n_train // k.df)")} AS idf
        FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1) k
          CROSS JOIN totals t
        WHERE k.df * 1000000 <= 1000000 * t.n_train),
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
        SELECT eval_id, doc_id, CAST(rank AS BIGINT) AS rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
            ORDER BY score DESC, doc_id) AS rank
          FROM bscored) t
        WHERE rank <= 20),
      emb AS (
        SELECT doc_id, (doc_id % 101 = 0) AS is_q,
               list_transform(${VectorOps.mockEmbeddingSql("h", 16)},
                 x -> CAST(x AS FLOAT)) AS embedding
        FROM (SELECT doc_id, ${TextOps.polyHashSql("text")} AS h
              FROM documents) t),
      dn AS (
        SELECT eval_id, doc_id, CAST(rank AS BIGINT) AS rank FROM (
          SELECT a.doc_id AS eval_id, b.doc_id AS doc_id,
                 ROW_NUMBER() OVER (PARTITION BY a.doc_id
                   ORDER BY ${cos("b.embedding", "a.embedding")} DESC,
                            b.doc_id) AS rank
          FROM emb a JOIN emb b ON NOT b.is_q
          WHERE a.is_q) t
        WHERE rank <= 20),
      fused AS (
        SELECT COALESCE(b.eval_id, d.eval_id) AS eval_id,
               COALESCE(b.doc_id, d.doc_id) AS doc_id,
               CAST(COALESCE(1000000 // (60 + b.rank), 0)
                 + COALESCE(1000000 // (60 + d.rank), 0) AS BIGINT)
                 AS rrf_ppm,
               CAST(COALESCE(b.rank, 0) AS BIGINT) AS bm25_rank,
               CAST(COALESCE(d.rank, 0) AS BIGINT) AS dense_rank
        FROM bm b FULL OUTER JOIN dn d
          ON b.eval_id = d.eval_id AND b.doc_id = d.doc_id)
      SELECT eval_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_ppm,
             bm25_rank, dense_rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
              ORDER BY rrf_ppm DESC, doc_id) AS rank
            FROM fused) t
      WHERE rank <= 5
      ORDER BY eval_id, rank"""
    })

  val c105 = Q(
    "c105_source_overlap",
    // Cross-source duplication overlap matrix over the winnowing
    // print index (Dedup.sourceOverlap — artifact-only compute, the
    // c92 argument on the dedup side): per unordered source pair,
    // distinct shared fingerprints + each side's print total +
    // winnowed overlap ppm. The "which sources copy from each other"
    // audit (mirrors, syndication, cross-posting) that c100's
    // per-source exposure scalar can't localize to a pair. Shape:
    // distinct (source, print) partial-agg, pair equi-join on the
    // hash, ≤|sources|²/2-row matrix, broadcast totals back.
    (s, d) => Dedup.sourceOverlap(Tables.documents(s, d),
        "doc_id", "text", "source")
      .orderBy(col("src_a"), col("src_b")),
    Some(Dedup.sourceOverlapSql("doc_id", "text", "source")))

  val c106 = Q(
    "c106_edit_verify",
    // Edit-distance verification of winnowing candidates
    // (Dedup.editVerify — the MOSS funnel's second stage): c103's
    // print index shortlists pairs, ONLY those pay the O(n·m)
    // Levenshtein DP on raw text (both engines ship the identical
    // classic DP natively — integer-exact, §4), reported as
    // sim_ppm = (maxlen−dist)·10^6 div maxlen, kept at >= 0.5.
    // Character-level similarity prices reorderings and in-token
    // edits that set-based Jaccard ignores; the funnel (sketch →
    // bounded verify) is what makes it affordable at 100 TB.
    (s, d) => Dedup.editVerify(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")),
    Some(Dedup.editVerifySql("doc_id", "text")))

  val c107 = Q(
    "c107_kmv_set_ops",
    // KMV set operations between sources (Beyer et al. SIGMOD 2007,
    // Sampling.kmvSetOps — the multi-set extension of c95's
    // estimator): per unordered source pair, union and intersection
    // distinct counts estimated from the two bounded bottom-k states
    // ALONE (merge → k smallest → est_union = (k−1)·P div h_k;
    // shared-in-top-k s → est_inter = s·est_union div k), with BOTH
    // exact counts alongside from one extra pair join (the synopsis
    // audits itself, c95/c97's discipline; exact when the pair's
    // union fits the state). The estimate a 1000-source corpus
    // consults BEFORE deciding which pairs deserve c105's exact
    // index pass — everything pairwise runs on |sources|·k rows.
    (s, d) => Sampling.kmvSetOps(Tables.documents(s, d),
        "source", "text")
      .orderBy(col("src_a"), col("src_b")),
    Some(Sampling.kmvSetOpsSql("source", "text")))

  val c108 = Q(
    "c108_threshold_sweep",
    // Dedup threshold sweep (Dedup.thresholdSweep — the curve family
    // on c16's tau knob, next to c59/c63/c72): per candidate
    // threshold, verified pair count + the direct-evidence removable
    // doc/token mass (docs with a smaller near-dup at tau), all from
    // ONE shingle-overlap pass at the sweep floor. A too-loose tau
    // shows up as the removable curve exploding between adjacent
    // thresholds — read BEFORE committing a corpus-wide dedup run.
    // Integer-ppm Jaccard (§4); the sweep itself is a broadcast
    // tau grid over the tiny verified-pair list.
    (s, d) => Dedup.thresholdSweep(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("tau_ppm")),
    Some(Dedup.thresholdSweepSql("doc_id", "text")))

  val c109 = Q(
    "c109_leakage_free_split",
    // Leakage-FREE train/val/test split (Sampling.leakFreeSplit —
    // the constructive complement of c73's leakage detector):
    // assignment keyed on the near-dup CLUSTER (c16's CC keeper),
    // not the doc id, so no near-dup pair can straddle splits BY
    // CONSTRUCTION; split = stable keeper-hash bucket (80/10/10),
    // reproducible across runs and layouts. The audit PROVES the
    // property from the verified pair set itself: cross_split_pairs
    // is recomputed, not asserted (0 everywhere; nonzero = the split
    // was keyed wrong). One dedup pass + a keeper join + one audit
    // groupBy; leak audit joins the bounded pair list linearly.
    // Since r15 the tau-verified pair table comes AT REST — the
    // split keying probes the dedup service's artifact.
    (s, d) => {
      val docs = Tables.documents(s, d)
      Sampling.leakFreeSplit(docs, "doc_id", "text",
          pairsPre = Some(Dedup.verifiedPairsCached(s, d, "all-tau05",
            docs, "doc_id", "text", 0.5)))
        .orderBy(col("split"))
    },
    Some(Sampling.leakFreeSplitSql("doc_id", "text")))

  val c110 = Q(
    "c110_contamination_report",
    // Per-eval-doc contamination REPORT (Retrieval.
    // contaminationReport — the c100 composition move on eval
    // integrity): all four evidence legs side by side per eval doc —
    // verbatim content-hash twin (c1), max exact shingle-Jaccard +
    // arg (c27's leg per-eval-max), BM25 top-1 (c36), dense cosine
    // top-1 (c14's provider) — with the verdict folding only the
    // EXACT legs (verbatim > near_dup at tau > clean; retrieval legs
    // stay evidence because their scores have no calibrated
    // threshold, c71's honest line). Eval sets are small by
    // construction, so every leg broadcasts the eval side against
    // one linear train pass. The four frozen train-side artifacts
    // (content-hash set, shingle explode + sizes, BM25 impact index,
    // train embeddings) are served from the train-once DiskCache
    // seam — the annFits move applied to the contamination index,
    // which is exactly what d51 already treats as a static artifact;
    // every producer is deterministic, so the persisted index is
    // bit-identical to an inline rebuild.
    (s, d) => {
      val tagged = Tables.documents(s, d)
        .select(col("doc_id").as("did"), col("text").as("t"),
          (pmod(col("doc_id"), lit(101)) === 0).as("is_q"))
      val idx = Retrieval.contaminationIndexCached(s,
        s"$d/documents.parquet", "mod101ne0-dim16",
        tagged.where(!col("is_q")))
      Retrieval.contaminationProbe(idx, tagged.where(col("is_q")))
        .orderBy(col("eval_id"))
    },
    Some(Retrieval.contaminationReportSql("doc_id", "text",
      evalCond = "doc_id % 101 = 0")))

  val c111 = Q(
    "c111_jackknife_influence",
    // Leave-one-source-out quality influence (CorpusStats.
    // jackknifeInfluence — the delete-one statistic at source
    // granularity, where a corpus owner can act): influence_ppm =
    // mean(corpus minus source) − mean(corpus), positive = removing
    // the source RAISES corpus quality. Quality integerized per doc
    // exactly as c100 (floor(q·1e6+0.5), never a float sum); both
    // means are integer div of ppm sums — exact, no negative
    // division. One per-source pass; the jackknife's point at 100 TB
    // is that leave-one-out needs NO second scan (totals minus the
    // group).
    (s, d) => CorpusStats.jackknifeInfluence(Tables.documents(s, d),
        "doc_id", "text", "source")
      .orderBy(col("source")),
    Some(CorpusStats.jackknifeInfluenceSql("doc_id", "text", "source")))

  val c112 = Q(
    "c112_containment_pairs",
    // Asymmetric containment (Broder 1997, Dedup.containmentPairs):
    // C(A→B) = |A∩B|/|A| over distinct shingles — catches a SMALL
    // doc embedded in a LARGE one (quote farms, concatenation junk),
    // which symmetric Jaccard structurally misses (J ≈ |A|/|B| → 0
    // while C → 1). Both directions + the Jaccard alongside so the
    // Jaccard-blind region is visible in the output; integer ppm
    // (§4). Same one shingle equi-join as c2 (a shingle is its own
    // bucket; per LSH bucket at 100 TB) — containment adds only the
    // asymmetric division on the same (inter, na, nb) triple.
    (s, d) => Dedup.containmentPairs(Tables.documents(s, d),
        "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")),
    Some(Dedup.containmentPairsSql("doc_id", "text")))

  val c113 = Q(
    "c113_dedup_certificate",
    // The post-dedup certificate (Dedup.dedupCertificate): run c16's
    // dedup, keep survivors, RE-RUN pair detection on them and
    // publish the residual count — zero by CC construction, and
    // PROVEN from the data rather than asserted (a nonzero residual
    // means the dedup and the release came from different snapshots,
    // exactly what a shipped certificate exists to catch). One row:
    // docs, survivors, removed, kept token mass, residual_pairs.
    // The re-verify is a second banded pass over survivors — the
    // honest price, strictly cheaper than the first pass.
    (s, d) => Dedup.dedupCertificate(Tables.documents(s, d),
      "doc_id", "text"),
    Some(Dedup.dedupCertificateSql("doc_id", "text")))

  val c114 = Q(
    "c114_print_index_audit",
    // Incremental maintenance of c103's winnowing PRINT index
    // (Dedup.buildPrintIndex / appendToPrintIndexDir /
    // deleteFromPrintIndexDir) — the c91 discipline applied to the
    // last persisted dedup artifact that lacked it. The structural
    // difference from c91 IS the audit's story: prints are per-doc
    // independent (a pure function of each doc's own text), so
    // append is a pure INSERT (n_after = n_before + n_added, no
    // merge, untouched buckets never opened) and delete is a pure
    // did anti-join on touched buckets — both equal the rebuild by
    // construction (DedupAnnSpec pins set equality + untouched-
    // bucket byte-identity). Per hash bucket: corpus prints
    // (n_before), arrival print rows inserted (n_added), arriving
    // docs landing in the bucket (n_docs_new), arrival prints whose
    // hash already exists in the index (n_hash_hits — the candidate
    // mass a live containment/plagiarism gate would probe), and the
    // post-append size. Bounded output (IndexBuckets rows).
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val arrivals = docs.where(pmod(col("doc_id"), lit(10)) >= 8)
      val cidx = graft.util.DiskCache.cached(s, "print-index", "v1",
        Seq(s"$d/documents.parquet"), "mod10lt8-kg4w4", Seq("prints")) {
        tmp => Dedup.writePrintIndex(corpus, "doc_id", "text", 4, 4, tmp)
      } { b => Dedup.readPrintIndex(s, b) }
      val ap = Dedup.buildPrintIndex(arrivals, "doc_id", "text", 4, 4)
      val ch = cidx.select(col("h")).distinct()
        .withColumn("inidx", lit(1L))
      val aug = ap.join(ch, Seq("h"), "left")
        .select(pmod(col("h"), lit(Dedup.IndexBuckets.toLong)).as("bk"),
          col("did"), coalesce(col("inidx"), lit(0L)).as("hit"))
      val before = cidx
        .groupBy(pmod(col("h"), lit(Dedup.IndexBuckets.toLong)).as("bk"))
        .agg(count(lit(1)).as("n_before"))
      val added = aug.groupBy(col("bk"))
        .agg(count(lit(1)).as("n_added"),
          countDistinct(col("did")).as("n_docs_new"),
          sum(col("hit")).cast("long").as("n_hash_hits"))
      before.join(added, Seq("bk"), "full")
        .select(col("bk"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_added"), lit(0L)).as("n_added"),
          coalesce(col("n_docs_new"), lit(0L)).as("n_docs_new"),
          coalesce(col("n_hash_hits"), lit(0L)).as("n_hash_hits"))
        .withColumn("n_after",
          (col("n_before") + col("n_added")).cast("long"))
        .orderBy(col("bk"))
    },
    Some {
      def sel(alias: String, pred: String) =
        Dedup.winnowSelSqlCte(alias, "doc_id", "text", 4, 4, pred)
      s"""
      WITH ${sel("csel", "doc_id % 10 < 8")},
      ${sel("asel", "doc_id % 10 >= 8")},
      chash AS (SELECT DISTINCT h FROM csel),
      bef AS (SELECT h % ${Dedup.IndexBuckets} AS bk,
                     CAST(COUNT(*) AS BIGINT) AS n_before
              FROM csel GROUP BY 1),
      addd AS (SELECT a.h % ${Dedup.IndexBuckets} AS bk,
                      CAST(COUNT(*) AS BIGINT) AS n_added,
                      CAST(COUNT(DISTINCT a.did) AS BIGINT) AS n_docs_new,
                      CAST(SUM(CASE WHEN c.h IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hash_hits
               FROM asel a LEFT JOIN chash c ON a.h = c.h
               GROUP BY 1)
      SELECT CAST(coalesce(b.bk, a.bk) AS BIGINT) AS bk,
             CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
             CAST(coalesce(n_added, 0) AS BIGINT) AS n_added,
             CAST(coalesce(n_docs_new, 0) AS BIGINT) AS n_docs_new,
             CAST(coalesce(n_hash_hits, 0) AS BIGINT) AS n_hash_hits,
             CAST(coalesce(n_before, 0) + coalesce(n_added, 0) AS BIGINT)
               AS n_after
      FROM bef b FULL JOIN addd a ON b.bk = a.bk
      ORDER BY bk"""
    })

  val c115 = Q(
    "c115_ann_pareto",
    // The ANN family selection table AS DATA (Ann.paretoTable — the
    // r12-verdict #2 item): one row per index member at its own
    // §2-registered parameters — exact / LSH(8 bits) / IVF(nprobe 2)
    // / int8(3k rescore) / PQ(8×16, 50 rescore) / IVFPQ / Hamming
    // (two longs, 50 rescore) — with first-stage candidates scanned,
    // exact-cosine rescores, bytes-per-vector at rest, and recall@5
    // vs the exact baseline as integer ppm. Every member reuses its
    // own operator's machinery, so each row summarizes that
    // operator's funnel; candidates × bytes is the scan cost the
    // table exists to compare. 7 rows, all-scalar. FULL DuckDB
    // mirror (closes the r13 allowlist — the last rows-only entry):
    // the seven members' CTE chains composed into ONE query, the
    // coarse-kmeans CTEs shared by IVF and IVFPQ exactly as the
    // Spark side shares the coarse table, the two PQ codebook
    // instances (raw-vector c61 / residual c62) disambiguated by
    // pqCtes' prefix parameter, and DedupAnnSpec still pins the
    // cross-member invariants.
    (s, d) => {
      val e = Tables.embeddings(s, d)
      // every trainable/encodable artifact from the train-once
      // DiskCache seam (annFits — r13-verdict #1 + the r14
      // codes-at-rest extension: the audit op neither retrains
      // kmeans/PQ nor re-encodes the corpus per run)
      Ann.paretoTable(e.where(col("vec_id") >= 5),
        e.where(col("vec_id") < 5), "vec_id", "embedding",
        fits = annFits(s, d))
    },
    Some {
      def cos(a: String, b: String) = VectorOps.cosine6Sql(a, b)
      def dotS(a: String, b: String) = VectorOps.dotSql(a, b)
      // one pareto row: ord/method/bytes literal, candidate-count
      // expression, LEAST(rescore, nc)*nq, and recall@5 ppm = exact
      // pairs surviving a semi-join against the member's top-5
      def row(ord: Int, method: String, cand: String, resc: Long,
              bytes: Long, top: String) = {
        val hits = s"""(SELECT COUNT(*) FROM exact e
             WHERE EXISTS (SELECT 1 FROM $top t2
                           WHERE t2.q_id = e.q_id AND t2.n_id = e.n_id))"""
        s"""SELECT CAST($ord AS BIGINT) AS ord, '$method' AS method,
           $cand AS n_candidates,
           CAST(LEAST($resc, z.nc) * z.nq AS BIGINT) AS n_rescored,
           CAST($bytes AS BIGINT) AS bytes_per_vector,
           ${CorpusStats.ppmSql(hits, "t.tot")} AS recall_ppm
         FROM sizes z, tot t"""
      }
      val fullScan = "CAST(z.nc * z.nq AS BIGINT)"
      s"""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      queries AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      sizes AS (SELECT (SELECT COUNT(*) FROM corpus) AS nc,
                       (SELECT COUNT(*) FROM queries) AS nq),
      exact AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, v.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            v.vec_id) AS rk
          FROM queries q CROSS JOIN corpus v) t
        WHERE rk <= 5),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM exact),
      lshtop AS (
        SELECT q_id, n_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id
                   ORDER BY ${cos("b.embedding", "a.embedding")} DESC,
                            b.vec_id) AS rank
          FROM queries a JOIN corpus b
            ON ${Ann.lshBucketSql("b.embedding", 8)}
             = ${Ann.lshBucketSql("a.embedding", 8)}) t
        WHERE rank <= 5),
      lshcand AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates
        FROM (SELECT ${Ann.lshBucketSql("embedding", 8)} AS b
              FROM corpus) c
          JOIN (SELECT ${Ann.lshBucketSql("embedding", 8)} AS b
                FROM queries) q USING (b)),
      ${kmeansCtes(k = 8, iters = 2)},
      qprobe AS (
        SELECT q_id, cid FROM (
          SELECT q.vec_id AS q_id, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid)
                   AS rk
          FROM queries q CROSS JOIN cent2 c) t
        WHERE rk <= 2),
      ivfcand AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates
        FROM pick3 a JOIN qprobe p ON a.cid = p.cid),
      ivftop AS (
        SELECT q_id, n_id FROM (
          SELECT p.q_id, a.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY p.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            a.vec_id) AS rk
          FROM qprobe p
            JOIN pick3 a ON a.cid = p.cid
            JOIN corpus v ON v.vec_id = a.vec_id
            JOIN queries q ON q.vec_id = p.q_id) t
        WHERE rk <= 5),
      i8corpusn AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding")})
                 AS nv
        FROM corpus),
      i8queriesn AS (
        SELECT vec_id, list_transform(embedding,
                 x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding")})
                 AS nv
        FROM queries),
      i8mm AS (
        SELECT MAX(abs(x)) / CAST(127 AS DOUBLE) AS scale
        FROM (SELECT unnest(nv) AS x FROM i8corpusn)),
      i8cq AS (
        SELECT vec_id,
               list_transform(nv, x -> least(greatest(
                 CAST(floor(x / m.scale) AS BIGINT), -127), 127)) AS qv
        FROM i8corpusn CROSS JOIN i8mm m),
      i8qq AS (
        SELECT vec_id,
               list_transform(nv, x -> least(greatest(
                 CAST(floor(x / m.scale) AS BIGINT), -127), 127)) AS qv
        FROM i8queriesn CROSS JOIN i8mm m),
      i8cand AS (
        SELECT q_id, n_id FROM (
          SELECT b.vec_id AS q_id, a.vec_id AS n_id,
            ROW_NUMBER() OVER (PARTITION BY b.vec_id
              ORDER BY list_reduce(list_transform(range(1, 65),
                         j -> a.qv[j] * b.qv[j]), (x, y) -> x + y) DESC,
                       a.vec_id) AS rk
          FROM i8cq a CROSS JOIN i8qq b) t
        WHERE rk <= 15),
      i8top AS (
        SELECT q_id, n_id FROM (
          SELECT i8cand.q_id, i8cand.n_id,
            ROW_NUMBER() OVER (PARTITION BY i8cand.q_id
              ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                       i8cand.n_id) AS rank
          FROM i8cand
            JOIN corpus v ON v.vec_id = i8cand.n_id
            JOIN queries q ON q.vec_id = i8cand.q_id) t
        WHERE rank <= 5),
      ${pqCtes(mSub = 8, subDim = 8, k = 16, iters = 2, prefix = "r")},
      rqsub AS (
        SELECT vec_id, m,
               embedding[m * 8 + 1 : (m + 1) * 8] AS vm
        FROM (SELECT *, unnest(range(0, 8)) AS m FROM queries)),
      rqtab AS (
        SELECT q.vec_id AS q_id, q.m, c.cid,
               ${dotS("q.vm", "c.cv")} AS dt
        FROM rqsub q JOIN rpcent2 c ON q.m = c.m),
      rnorms AS (
        SELECT vec_id AS vid,
               sqrt(${dotS("embedding", "embedding")}) AS vn
        FROM corpus),
      rqnorms AS (
        SELECT vec_id AS q_id,
               sqrt(${dotS("embedding", "embedding")}) AS qn
        FROM queries),
      rscores AS (
        SELECT s.q_id, s.vid,
               round(s.adc_ip / (n.vn * qq2.qn), 6) AS adc6
        FROM (
          SELECT t.q_id, rcodes.vid,
                 CAST(SUM(CAST(FLOOR(dt * 1073741824.0) AS HUGEINT))
                   AS DOUBLE) / 1073741824.0 AS adc_ip
          FROM rcodes JOIN rqtab t ON rcodes.m = t.m AND rcodes.code = t.cid
          GROUP BY 1, 2) s
          JOIN rnorms n ON n.vid = s.vid
          JOIN rqnorms qq2 ON qq2.q_id = s.q_id),
      rranked AS (
        SELECT * FROM (
          SELECT q_id, vid, adc6,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc6 DESC, vid) AS rank
          FROM rscores) t
        WHERE rank <= 50),
      rtop AS (
        SELECT q_id, n_id FROM (
          SELECT r.q_id, r.vid AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY r.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            r.vid) AS frank
          FROM rranked r
            JOIN corpus v ON v.vec_id = r.vid
            JOIN queries q ON q.vec_id = r.q_id) t
        WHERE frank <= 5),
      resid AS (
        SELECT p.vec_id, p.cid AS c_id,
               sqrt(${dotS("v.embedding", "v.embedding")}) AS vn,
               list_transform(range(1, 65),
                 i -> CAST(CAST(v.embedding[i] AS DOUBLE)
                        - CAST(c.cv[i] AS DOUBLE) AS FLOAT))
                 AS embedding
        FROM pick3 p
          JOIN corpus v USING (vec_id)
          JOIN cent2 c ON p.cid = c.cid),
      ${pqCtes(mSub = 8, subDim = 8, k = 16, iters = 2,
        from = "resid", prefix = "s")},
      scodes2 AS (
        SELECT c.vid, c.m, c.code, r.c_id, r.vn
        FROM scodes c JOIN resid r ON r.vec_id = c.vid),
      vqpre AS (
        SELECT p.q_id, p.cid AS c_id,
               sqrt(${dotS("q.embedding", "q.embedding")}) AS qn,
               ${dotS("q.embedding", "c.cv")} AS qc,
               list_transform(range(1, 65),
                 i -> CAST(CAST(q.embedding[i] AS DOUBLE)
                        - CAST(c.cv[i] AS DOUBLE) AS FLOAT))
                 AS embedding
        FROM qprobe p
          JOIN queries q ON q.vec_id = p.q_id
          JOIN cent2 c ON c.cid = p.cid),
      vqtab AS (
        SELECT s2.q_id, s2.c_id, s2.m, c.cid,
               ${dotS("s2.vm", "c.cv")} AS dt
        FROM (SELECT q_id, c_id, m,
                     embedding[m * 8 + 1 : (m + 1) * 8] AS vm
              FROM (SELECT *, unnest(range(0, 8)) AS m FROM vqpre)) s2
          JOIN spcent2 c ON s2.m = c.m),
      vscores AS (
        SELECT s3.q_id, s3.vid,
               round((qp.qc + s3.adc_r) / (s3.vn * qp.qn), 6) AS adc6
        FROM (
          SELECT t.q_id, c.vid, c.c_id, c.vn,
                 CAST(SUM(CAST(FLOOR(dt * 1073741824.0) AS HUGEINT))
                   AS DOUBLE) / 1073741824.0 AS adc_r
          FROM scodes2 c JOIN vqtab t
            ON c.m = t.m AND c.code = t.cid AND c.c_id = t.c_id
          GROUP BY 1, 2, 3, 4) s3
          JOIN vqpre qp ON qp.q_id = s3.q_id AND qp.c_id = s3.c_id),
      vranked AS (
        SELECT * FROM (
          SELECT q_id, vid, adc6,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc6 DESC, vid) AS rank
          FROM vscores) t
        WHERE rank <= 50),
      vtop AS (
        SELECT q_id, n_id FROM (
          SELECT r.q_id, r.vid AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY r.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            r.vid) AS frank
          FROM vranked r
            JOIN corpus v ON v.vec_id = r.vid
            JOIN queries q ON q.vec_id = r.q_id) t
        WHERE frank <= 5),
      hmthr AS (
        SELECT t.i AS dim,
               SUM(CAST(FLOOR(CAST(c.embedding[t.i] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT)) AS s,
               CAST(COUNT(*) AS HUGEINT) AS n
        FROM corpus c CROSS JOIN range(1, 65) t(i)
        GROUP BY t.i),
      hmcbits AS (
        SELECT c.vec_id, t.dim,
               CASE WHEN CAST(FLOOR(CAST(c.embedding[t.dim] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT) * t.n > t.s
                 THEN 1 ELSE 0 END AS bit
        FROM corpus c CROSS JOIN hmthr t),
      hmqbits AS (
        SELECT q.vec_id, t.dim,
               CASE WHEN CAST(FLOOR(CAST(q.embedding[t.dim] AS DOUBLE)
                 * 1073741824.0) AS HUGEINT) * t.n > t.s
                 THEN 1 ELSE 0 END AS bit
        FROM queries q CROSS JOIN hmthr t),
      hmccode AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dim <= 32 THEN bit
                 * CAST(pow(2, dim - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS c_lo,
               CAST(SUM(CASE WHEN dim > 32 THEN bit
                 * CAST(pow(2, dim - 33) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS c_hi
        FROM hmcbits GROUP BY vec_id),
      hmqcode AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dim <= 32 THEN bit
                 * CAST(pow(2, dim - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS q_lo,
               CAST(SUM(CASE WHEN dim > 32 THEN bit
                 * CAST(pow(2, dim - 33) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS q_hi
        FROM hmqbits GROUP BY vec_id),
      hmcand AS (
        SELECT q_id, n_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(c.c_lo, q.q_lo))
                     + bit_count(xor(c.c_hi, q.q_hi)), c.vec_id) AS hrank
          FROM hmccode c CROSS JOIN hmqcode q) t
        WHERE hrank <= 50),
      hmtop AS (
        SELECT q_id, n_id FROM (
          SELECT hmcand.q_id, hmcand.n_id,
                 ROW_NUMBER() OVER (PARTITION BY hmcand.q_id
                   ORDER BY ${cos("v.embedding", "q.embedding")} DESC,
                            hmcand.n_id) AS rank
          FROM hmcand
            JOIN corpus v ON v.vec_id = hmcand.n_id
            JOIN queries q ON q.vec_id = hmcand.q_id) t
        WHERE rank <= 5)
      SELECT * FROM (
        ${row(1, "exact", fullScan, 0L, 256L, "exact")}
        UNION ALL
        ${row(2, "lsh8", "(SELECT n_candidates FROM lshcand)", 0L,
          264L, "lshtop")}
        UNION ALL
        ${row(3, "ivf_np2", "(SELECT n_candidates FROM ivfcand)", 0L,
          264L, "ivftop")}
        UNION ALL
        ${row(4, "int8", fullScan, 15L, 64L, "i8top")}
        UNION ALL
        ${row(5, "pq8x16", fullScan, 50L, 16L, "rtop")}
        UNION ALL
        ${row(6, "ivfpq", "(SELECT n_candidates FROM ivfcand)", 50L,
          24L, "vtop")}
        UNION ALL
        ${row(7, "hamming64", fullScan, 50L, 16L, "hmtop")})
      ORDER BY ord"""
    })

  val c116 = Q(
    "c116_bm25_postings_append",
    // Incremental maintenance of the BM25 index's POSTINGS layer
    // (Retrieval.writePostingsIndex / appendToPostingsIndexDir — the
    // c114 print-index discipline on the retrieval side). Impacts
    // (c36's at-rest artifact) bake in GLOBAL df/length stats, so an
    // append invalidates every impact value — but the raw
    // (doc, tok, tf) postings are per-doc independent: append is a
    // pure INSERT into the arrivals' token-hash buckets (append ==
    // rebuild by construction, untouched buckets never opened —
    // RetrievalSpec pins set equality, byte-identity and double-
    // append idempotence), and an impact refresh derives from the
    // postings without re-tokenizing the corpus. The audit prices an
    // arrival batch per hash bucket: postings before / inserted /
    // arriving docs landing there / tokens NEW to the index (the
    // df-0→>0 rows whose idf the refresh must create) / after.
    // Bounded output (PostingsBuckets rows), all partial-aggregable
    // counts + one bucketed left-anti equi-join. d55 is the live
    // gate-then-fold half.
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val arrivals = docs.where(pmod(col("doc_id"), lit(10)) >= 8)
      val pidx = graft.util.DiskCache.cached(s, "postings-index", "v1",
        Seq(s"$d/documents.parquet"), "mod10lt8", Seq("postings")) {
        tmp => Retrieval.writePostingsIndex(corpus, "doc_id", "text",
          tmp)
      } { b => s.read.parquet(s"$b/postings") }
      Retrieval.postingsAppendAudit(pidx, arrivals, "doc_id", "text")
    },
    Some(Retrieval.postingsAppendAuditSql("doc_id", "text",
      corpusWhere = "doc_id % 10 < 8",
      arrivalWhere = "doc_id % 10 >= 8")))

  val c117 = Q(
    "c117_bm25_impact_refresh",
    // The refresh half of c116's maintenance story: the impact table
    // (c36's query-optimized artifact) REBUILDS from the at-rest
    // postings layer — doc lengths are Σtf per doc and df is the
    // posting count per token, so the refresh never re-tokenizes a
    // byte of corpus text (Retrieval.bm25ImpactsFromPostings; at
    // 100 TB this is the difference between an index refresh that
    // reads the compact postings artifact and one that re-scans the
    // corpus). The op refreshes over corpus-postings-at-rest ∪ the
    // arrival batch's postings and emits the per-bucket impact
    // summary (rows / distinct tokens / exact Σcontrib — integers,
    // so the oracle's FROM-SCRATCH build over corpus ∪ arrivals
    // proves refresh-from-postings == retokenize-everything).
    (s, d) => {
      import graft.functions.TextOps
      val docs = Tables.documents(s, d)
      val corpus = docs.where(pmod(col("doc_id"), lit(10)) < 8)
      val arrivals = docs.where(pmod(col("doc_id"), lit(10)) >= 8)
      val pidx = graft.util.DiskCache.cached(s, "postings-index", "v1",
        Seq(s"$d/documents.parquet"), "mod10lt8", Seq("postings")) {
        tmp => Retrieval.writePostingsIndex(corpus, "doc_id", "text",
          tmp)
      } { b => s.read.parquet(s"$b/postings") }
      val merged = pidx.select(col("doc_id"), col("tok"), col("tf"))
        .unionByName(Retrieval.postings(arrivals, "doc_id", "text"))
      Retrieval.bm25ImpactsFromPostings(merged)
        .withColumn("bk", pmod(TextOps.polyHash(col("tok")),
          lit(Retrieval.PostingsBuckets.toLong)))
        .groupBy(col("bk"))
        .agg(count(lit(1)).as("n_impacts"),
          countDistinct(col("tok")).as("n_tokens"),
          sum(col("contrib")).cast("long").as("sum_contrib"))
        .orderBy(col("bk"))
    },
    Some(s"""
      WITH tk AS (
        SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok
          FROM documents)
        WHERE tok <> ''),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
      lens AS (SELECT doc_id, COUNT(*) AS len FROM tk GROUP BY 1),
      totals AS (SELECT COUNT(*) AS n_train,
                        CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
      dft AS (
        SELECT k.tok, k.df, t.n_train, t.tot_len,
               ${Retrieval.bitLenSql("(t.n_train // k.df)")} AS idf
        FROM (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1) k
          CROSS JOIN totals t
        WHERE k.df * 1000000 <= 1000000 * t.n_train),
      imp AS (
        SELECT f.tok,
               d.idf * CAST(
                 (CAST(22 AS HUGEINT) * f.tf * d.tot_len * 1000000) //
                 (CAST(10 AS HUGEINT) * f.tf * d.tot_len
                  + CAST(3 AS HUGEINT) * d.tot_len
                  + CAST(9 AS HUGEINT) * l.len * d.n_train)
                 AS BIGINT) AS contrib
        FROM tf f
          JOIN dft d USING (tok)
          JOIN lens l ON l.doc_id = f.doc_id)
      SELECT ${TextOps.polyHashSql("tok")} %
               ${Retrieval.PostingsBuckets} AS bk,
             COUNT(*) AS n_impacts,
             COUNT(DISTINCT tok) AS n_tokens,
             CAST(SUM(contrib) AS BIGINT) AS sum_contrib
      FROM imp
      GROUP BY 1
      ORDER BY bk"""))

  override val queries: Seq[Q] =
    Seq(c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12, c13, c14, c15,
      c16, c17, c18, c19, c20, c21, c22, c23, c24, c25, c26, c27, c28, c29,
      c30, c31, c32, c33, c34, c35, c36, c37, c38, c39, c40, c41, c42, c43,
      c44, c45, c46, c47, c48, c49, c50, c51, c52, c53, c54, c55, c56,
      c57, c58, c59, c60, c61, c62, c63, c64, c65, c66, c67, c68, c69,
      c70, c71, c72, c73, c74, c75, c76, c77, c78, c79, c80, c81, c82,
      c83, c84, c85, c86, c87, c88, c89, c90, c91, c92, c93, c94, c95,
      c96, c97, c98, c99, c100, c101, c102, c103, c104, c105, c106,
      c107, c108, c109, c110, c111, c112, c113, c114, c115, c116,
      c117)
}
