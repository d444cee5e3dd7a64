package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic stratified sampling for corpus rebalancing (e.g.
  * downsampling an over-represented language before training).
  *
  * Mechanism: each row hashes its (stratum, id) pair into one of `mod`
  * buckets with the portable polynomial hash; the row is kept iff its
  * bucket falls below the stratum's quota. Properties that matter at
  * 100 TB:
  *
  *   - map-only: the quota table is a driver-side Map folded into a
  *     codegen'd CASE chain — no join, no shuffle, no sampleBy (whose
  *     Bernoulli draw is seed/partitioning-dependent);
  *   - deterministic & stable: the same row is kept in every run and
  *     on every cluster layout, so samples are reproducible and
  *     incremental re-runs agree with full runs;
  *   - exact-rate in expectation with hash-uniformity, and
  *     oracle-checkable row-by-row (the DuckDB mirror recomputes the
  *     same hash).
  */
object Sampling {

  /** Keep rows whose hash bucket (over `mod`) is below their stratum's
    * quota; strata absent from `quotas` default to quota 0 (dropped).
    * Adds the `bucket` column for auditability. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       quotas: Map[String, Int], mod: Int = 100): DataFrame = {
    val bucket = pmod(
      TextOps.polyHashMixed(concat(stratum, lit(":"), id.cast("string"))),
      lit(mod.toLong))
    val quota = quotas.foldLeft(lit(0)) {
      case (acc, (s, q)) => when(stratum === s, lit(q)).otherwise(acc)
    }
    df.withColumn("bucket", bucket).where(col("bucket") < quota)
  }

  /** DuckDB mirror of the bucket computation. */
  def bucketSql(stratum: String, id: String, mod: Int = 100): String =
    s"(${TextOps.polyHashMixedSql(s"($stratum || ':' || CAST($id AS VARCHAR))")}) % $mod"

  def quotaSql(stratum: String, quotas: Map[String, Int]): String =
    quotas.foldLeft("0") {
      case (acc, (s, q)) => s"CASE WHEN $stratum = '$s' THEN $q ELSE $acc END"
    }

  /** Per-stratum bottom-k-by-hash sample over DISTINCT content — the
    * KMV (k-minimum-values) synopsis made a first-class operator. For
    * each stratum, hash every doc's text with the mixed poly hash,
    * collapse to distinct hashes (rep_id = the smallest doc id per
    * hash — duplication-invariant: a doc pasted a million times holds
    * exactly one sample slot), and keep the k smallest hashes. Two
    * things fall out of that one bounded state:
    *
    *   - a UNIFORM sample of distinct content (hash order is
    *     content-blind), reproducible across runs/layouts — the
    *     eyeball-k-docs-per-source QA probe that ISN'T biased toward
    *     whatever got crawled twice, unlike naive row sampling;
    *   - the KMV distinct-count estimate est = (k−1)·P div h_k
    *     (Bar-Yossef et al. 2002): the k-th smallest of n uniform
    *     draws on [0,P) sits near k·P/n. Exact n_distinct is emitted
    *     alongside — the estimate audits itself.
    *
    * MERGEABLE: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))
    * and rep ids combine by min, so per-shard states fold without
    * rescans — the d43 streaming seam, same contract as c90's sketch.
    * Shape at 100 TB: one map-side-combinable groupBy(stratum, h),
    * then the bounded-heap TopKPerKey (partial per partition, k rows
    * per stratum cross the exchange) + one tiny distinct-count agg.
    * All-integer outputs. */
  def bottomKSample(docs: DataFrame, stratum: String, id: String,
                    text: String, k: Int = 8): DataFrame = {
    val perHash = docs
      .select(col(stratum), TextOps.polyHashMixed(col(text)).as("h"),
        col(id).cast("long").as("rep0"))
      .groupBy(col(stratum), col("h"))
      .agg(min(col("rep0")).as("rep_id"))
    val nd = perHash.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_distinct"))
    val kept = graft.plans.TopKPerKey(perHash, Seq(col(stratum)),
      Seq(col("h"), col("rep_id")), k, rankName = "rk")
    val kth = kept.groupBy(col(stratum)).agg(max(col("h")).as("h_k"))
    kept
      .join(broadcast(nd), Seq(stratum))
      .join(broadcast(kth), Seq(stratum))
      .withColumn("est_distinct",
        when(col("n_distinct") >= k,
          expr(s"${(k - 1).toLong * TextOps.P} div h_k"))
          .otherwise(col("n_distinct")))
      .select(col(stratum), col("rk").cast("long").as("rk"),
        col("rep_id"), col("h"), col("est_distinct"), col("n_distinct"))
  }

  /** DuckDB mirror of [[bottomKSample]]. */
  def bottomKSampleSql(stratum: String, id: String, text: String,
                       k: Int = 8): String = s"""
      WITH ph AS (
        SELECT $stratum, h, MIN($id) AS rep_id FROM (
          SELECT $stratum, ${TextOps.polyHashMixedSql(text)} AS h, $id
          FROM documents) t
        GROUP BY $stratum, h),
      nd AS (SELECT $stratum, COUNT(*) AS n_distinct FROM ph GROUP BY 1),
      ranked AS (
        SELECT $stratum, h, rep_id,
               ROW_NUMBER() OVER (PARTITION BY $stratum
                 ORDER BY h, rep_id) AS rk
        FROM ph),
      kept AS (SELECT * FROM ranked WHERE rk <= $k),
      kth AS (SELECT $stratum, MAX(h) AS h_k FROM kept GROUP BY 1)
      SELECT kept.$stratum AS $stratum, rk, rep_id, h,
             CAST(CASE WHEN nd.n_distinct >= $k
                  THEN ${(k - 1).toLong * TextOps.P} // kth.h_k
                  ELSE nd.n_distinct END AS BIGINT) AS est_distinct,
             CAST(nd.n_distinct AS BIGINT) AS n_distinct
      FROM kept
        JOIN nd ON nd.$stratum = kept.$stratum
        JOIN kth ON kth.$stratum = kept.$stratum
      ORDER BY $stratum, rk"""

  /** Leakage-FREE train/val/test split (the constructive complement
    * of c73's leakage DETECTOR): assignment is keyed on the near-dup
    * CLUSTER label (c16's CC keeper), not the doc id, so every member
    * of a near-dup cluster lands in the same split BY CONSTRUCTION —
    * the eval-set integrity rule train/test splits of crawled corpora
    * break when they hash raw ids (a near-copy of a test doc in train
    * is contamination measured as generalization). Split = stable
    * hash bucket of the keeper (80/10/10 over 100 buckets, the
    * [[stratifiedSample]] contract: reproducible across runs and
    * layouts).
    *
    * The audit output proves the property instead of asserting it:
    * per split, doc/token/cluster counts PLUS cross_split_pairs —
    * verified near-dup pairs whose ends landed in different splits —
    * recomputed from the pair set itself (0 by construction; a
    * nonzero value would mean the split was keyed wrong). Shape:
    * c16's LSH→verify→CC dedup once, a broadcast-friendly keeper
    * join, one partial-aggregable audit groupBy; the leak audit joins
    * the verified pair list (bounded by true near-dups) to the
    * |docs|-row split map on the two id keys — linear. */
  def leakFreeSplit(docs: DataFrame, id: String, text: String,
                    tau: Double = 0.5,
                    pairsPre: Option[DataFrame] = None): DataFrame = {
    import graft.util.Barriers.BarrierOps
    // one banded verify pass, reused by BOTH the CC clustering and
    // the leak audit (running deduplicate + a second exact pair pass
    // measured 9.3 s vs 5.8 s at sf0.1); `pairsPre` = the
    // tau-verified pair table AT REST (Dedup.verifiedPairsCached) —
    // the split keying is a PROBE of the dedup service's artifact
    val pairs = pairsPre.getOrElse(
      Dedup.verifiedPairs(docs, id, text, tau).barrier(true))
    val m = graft.graph.GraphAlgo
      .connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .select(col("node").as(id), col("component").as("keeper"))
    val withSplit = docs
      .select(col(id), size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .join(m, Seq(id), "left")
      .withColumn("keeper", coalesce(col("keeper"), col(id)))
      .withColumn("bucket", pmod(TextOps.polyHashMixed(
        concat(lit("sp:"), col("keeper").cast("string"))), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .barrier(true)
    val leaks = pairs
      .join(withSplit.select(col(id).as("id_a"), col("split").as("sa")),
        "id_a")
      .join(withSplit.select(col(id).as("id_b"), col("split").as("sb")),
        "id_b")
      .where(col("sa") =!= col("sb"))
    val leaksPerSplit = leaks.select(col("sa").as("split"))
      .unionAll(leaks.select(col("sb").as("split")))
      .groupBy(col("split")).agg(count(lit(1)).as("cross_split_pairs"))
    withSplit.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast("long").as("n_tokens"),
        countDistinct(col("keeper")).as("n_clusters"))
      .join(leaksPerSplit, Seq("split"), "left")
      .withColumn("cross_split_pairs",
        coalesce(col("cross_split_pairs"), lit(0L)))
  }

  /** DuckDB mirror of [[leakFreeSplit]] (c16's exact recursive-CTE CC
    * — banding pinned lossless at tau 0.5 by the c16 precedent). */
  def leakFreeSplitSql(id: String, t: String): String = {
    val sh = TextOps.shingleHashesSql(t)
    s"""
      WITH RECURSIVE sh AS (
        SELECT $id AS did, unnest($sh) AS s FROM documents),
      sizes AS (SELECT did, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.did AS id_a, b.did AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.did < b.did
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.did
          JOIN sizes sb ON id_b = sb.did
        WHERE round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
      reach(n, m) AS (
        SELECT a, b FROM und
        UNION
        SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a),
      mp AS (
        SELECT n AS did, LEAST(n, MIN(m)) AS keeper
        FROM reach GROUP BY n),
      base AS (
        SELECT d.$id AS did,
               CAST(len(${TextOps.tokensSql(t)}) AS BIGINT) AS tok,
               COALESCE(mp.keeper, d.$id) AS keeper
        FROM documents d LEFT JOIN mp ON mp.did = d.$id),
      assigned AS (
        SELECT did, tok, keeper,
               CASE WHEN bkt < 80 THEN 'train'
                    WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT *, (${TextOps.polyHashMixedSql(
          "('sp:' || CAST(keeper AS VARCHAR))")}) % 100 AS bkt
          FROM base) b),
      leaks AS (
        SELECT sa.split AS s1, sb.split AS s2
        FROM pairs p
          JOIN assigned sa ON sa.did = p.id_a
          JOIN assigned sb ON sb.did = p.id_b
        WHERE sa.split <> sb.split),
      lps AS (
        SELECT split, COUNT(*) AS cross_split_pairs FROM (
          SELECT s1 AS split FROM leaks
          UNION ALL SELECT s2 FROM leaks)
        GROUP BY 1)
      SELECT a.split, COUNT(*) AS n_docs,
             CAST(SUM(a.tok) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT a.keeper) AS BIGINT) AS n_clusters,
             CAST(COALESCE(MAX(lps.cross_split_pairs), 0) AS BIGINT)
               AS cross_split_pairs
      FROM assigned a LEFT JOIN lps ON lps.split = a.split
      GROUP BY a.split
      ORDER BY a.split"""
  }

  /** Per-source bottom-k KMV STATE alone (the c95 synopsis without
    * the sample columns): the k smallest mixed content hashes per
    * source over distinct content. The bounded artifact
    * [[kmvSetOps]] reads — and the d48 streaming fold maintains
    * (bottom-k of a union = bottom-k of the two bottom-k's). */
  def kmvStates(docs: DataFrame, source: String, text: String,
                k: Int): DataFrame = {
    val ph = docs
      .select(col(source).as("src"), TextOps.polyHashMixed(col(text)).as("h"))
      .distinct()
    graft.plans.TopKPerKey(ph, Seq(col("src")), Seq(col("h")), k,
        rankName = "rk")
      .select(col("src"), col("h"))
  }

  /** KMV set operations between sources (Beyer et al. SIGMOD 2007 —
    * the multi-set extension of c95's Bar-Yossef estimator): for
    * every unordered source pair, the UNION and INTERSECTION distinct
    * counts estimated from the two bounded bottom-k states ALONE —
    * merge the states, take the k smallest of the merge (the union's
    * own KMV: est_union = (k−1)·P div h_k), and count how many of
    * those k sit in BOTH states (s): est_inter = s·est_union div k.
    * Exact when a pair's true union fits the state (≤ k distinct
    * contents); both EXACT counts ride along from one extra pair
    * join — the synopsis audits itself, c95/c97's discipline.
    *
    * Why it earns a row next to c105: the overlap matrix there reads
    * the full print index; this one answers the same "how much do
    * these sources share?" from |sources|·k rows — the estimate a
    * 1000-source corpus consults BEFORE deciding which pairs are
    * worth the exact pass. All-integer (§4: every ratio is
    * multiply-then-div, widened through decimal(38,0)/HUGEINT).
    *
    * Shape: ONE corpus pass for the states (partial-aggregable
    * distinct + the TopKPerKey heap) and one for the exact audit
    * (distinct (src, h) self-join — a hash is its own bucket);
    * everything pairwise runs on ≤ |sources|·k-row artifacts with
    * broadcast joins. */
  def kmvSetOps(docs: DataFrame, source: String, text: String,
                k: Int = 64): DataFrame = {
    import graft.util.Barriers.BarrierOps
    val ph = docs
      .select(col(source).as("src"), TextOps.polyHashMixed(col(text)).as("h"))
      .distinct().barrier(true)
    val states = kmvStates(docs, source, text, k).barrier(true)
    setOpsFromStates(states, ph, k)
  }

  /** The pairwise ESTIMATE alone over prepared `states` (src, h —
    * bottom-k per src): (src_a, src_b, shared_in_topk, est_union,
    * est_inter). Everything runs on ≤ |sources|·k-row artifacts.
    * Factored so the d48 streaming fold re-emits from its folded
    * states — the estimate needs nothing the bounded state doesn't
    * hold (exact counts deliberately excluded: not mergeable from a
    * k-row state, c95/d43's discipline). */
  def setOpsEstimate(states: DataFrame, k: Int): DataFrame = {
    val srcs = states.select(col("src")).distinct()
    val pairs = broadcast(srcs.alias("x")
      .join(srcs.alias("y"), col("x.src") < col("y.src"))
      .select(col("x.src").as("src_a"), col("y.src").as("src_b")))
    // per (pair, h): which side(s) hold the hash in-state
    val merged = pairs.join(states.withColumnRenamed("src", "src_a")
        .withColumn("ia", lit(1L)), Seq("src_a"))
      .unionByName(pairs.join(states.withColumnRenamed("src", "src_b")
        .withColumn("ia", lit(0L)), Seq("src_b")))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("ia")).as("in_a"), min(col("ia")).as("nb0"))
      .withColumn("in_both", col("in_a") === 1L && col("nb0") === 0L)
    val topk = graft.plans.TopKPerKey(merged,
      Seq(col("src_a"), col("src_b")), Seq(col("h")), k, rankName = "rk")
    topk.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_state"), max(col("h")).as("h_k"),
        sum(when(col("in_both"), 1L).otherwise(0L)).as("shared_in_topk"))
      .withColumn("est_union",
        when(col("n_state") >= k,
          expr(s"${(k - 1).toLong * TextOps.P} div h_k"))
          .otherwise(col("n_state")))
      .withColumn("est_inter",
        when(col("n_state") >= k,
          expr(s"cast(cast(shared_in_topk as decimal(38,0)) * est_union div $k as bigint)"))
          .otherwise(col("shared_in_topk")))
      .select(col("src_a"), col("src_b"), col("shared_in_topk"),
        col("est_union"), col("est_inter"))
  }

  /** Estimate + exact audit composed (the c107 batch operator body):
    * the estimate from the bounded states, the exact union/inter from
    * the full distinct (src, h) relation. */
  def setOpsFromStates(states: DataFrame, ph: DataFrame,
                       k: Int): DataFrame = {
    val est = setOpsEstimate(states, k)
    val nd = ph.groupBy(col("src")).agg(count(lit(1)).as("nd"))
    val exactInter = ph.alias("a")
      .join(ph.alias("b"),
        col("a.h") === col("b.h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    est
      .join(broadcast(nd.select(col("src").as("src_a"), col("nd").as("na"))),
        Seq("src_a"))
      .join(broadcast(nd.select(col("src").as("src_b"), col("nd").as("nb"))),
        Seq("src_b"))
      .join(exactInter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("src_a"), col("src_b"), col("shared_in_topk"),
        col("est_union"), col("est_inter"),
        (col("na") + col("nb") - col("exact_inter")).as("exact_union"),
        col("exact_inter"))
  }

  /** DuckDB mirror of [[kmvSetOps]]. */
  def kmvSetOpsSql(source: String, text: String, k: Int = 64): String = s"""
      WITH ph AS (
        SELECT DISTINCT $source AS src,
               ${TextOps.polyHashMixedSql(text)} AS h
        FROM documents),
      states AS (
        SELECT src, h FROM (
          SELECT src, h, ROW_NUMBER() OVER (PARTITION BY src
            ORDER BY h) AS rk
          FROM ph) t
        WHERE rk <= $k),
      srcs AS (SELECT DISTINCT src FROM states),
      prs AS (
        SELECT x.src AS src_a, y.src AS src_b
        FROM srcs x JOIN srcs y ON x.src < y.src),
      merged AS (
        SELECT src_a, src_b, h, MAX(ia) AS in_a, MIN(ia) AS nb0
        FROM (
          SELECT p.src_a, p.src_b, s.h, 1 AS ia
          FROM prs p JOIN states s ON s.src = p.src_a
          UNION ALL
          SELECT p.src_a, p.src_b, s.h, 0 AS ia
          FROM prs p JOIN states s ON s.src = p.src_b)
        GROUP BY 1, 2, 3),
      topk AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
            ORDER BY h) AS rk
          FROM merged) t
        WHERE rk <= $k),
      est AS (
        SELECT src_a, src_b, COUNT(*) AS n_state, MAX(h) AS h_k,
               CAST(SUM(CASE WHEN in_a = 1 AND nb0 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS shared_in_topk
        FROM topk GROUP BY 1, 2),
      est2 AS (
        SELECT src_a, src_b, shared_in_topk, n_state,
               CASE WHEN n_state >= $k
                 THEN ${(k - 1).toLong * TextOps.P} // h_k
                 ELSE n_state END AS est_union
        FROM est),
      est3 AS (
        SELECT src_a, src_b, shared_in_topk,
               CAST(est_union AS BIGINT) AS est_union,
               CAST(CASE WHEN n_state >= $k
                 THEN (CAST(shared_in_topk AS HUGEINT) * est_union) // $k
                 ELSE shared_in_topk END AS BIGINT) AS est_inter
        FROM est2),
      nd AS (SELECT src, COUNT(*) AS nd FROM ph GROUP BY 1),
      ei AS (
        SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS exact_inter
        FROM ph a JOIN ph b ON a.h = b.h AND a.src < b.src
        GROUP BY 1, 2)
      SELECT e.src_a, e.src_b, e.shared_in_topk, e.est_union,
             e.est_inter,
             CAST(na.nd + nb.nd - COALESCE(ei.exact_inter, 0) AS BIGINT)
               AS exact_union,
             CAST(COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_inter
      FROM est3 e
        JOIN nd na ON na.src = e.src_a
        JOIN nd nb ON nb.src = e.src_b
        LEFT JOIN ei ON ei.src_a = e.src_a AND ei.src_b = e.src_b
      ORDER BY e.src_a, e.src_b"""

  /** Deterministic PRIORITY SAMPLING (Duffield–Lund–Thorup, VLDB'04 /
    * JACM'07, integerized) per stratum, weighted by token mass: doc i
    * draws u_i = mixed-poly-hash(stratum:id) ∈ [0,P) and gets
    * priority p_i = u_i div w_i (w_i = token count) — keeping the k
    * SMALLEST priorities samples docs with probability ≈ proportional
    * to w, which is the right sampler when the budget is tokens, not
    * documents (every token equally likely, so a 10k-token doc is
    * 100× likelier than a 100-token one — a uniform doc sample
    * over-represents short docs' tokens). The DLT threshold estimator
    * rides along: with τ = P div p_(k+1), est_mass = Σ_kept
    * max(w_i, τ) estimates the stratum's TOTAL token mass from the k
    * kept rows (exact by construction when the stratum has ≤ k docs);
    * the exact total is emitted alongside — the synopsis audits
    * itself, c95's discipline. Integer truncation makes the
    * estimator's unbiasedness approximate (documented), determinism
    * and the oracle exact.
    *
    * Mergeable exactly like c95 (bottom-k by priority; priorities are
    * per-doc constants), so the streaming fold is d43's pattern
    * verbatim. Same scale shape: map-only priorities, TopKPerKey
    * bounded heap, broadcast joins of per-stratum scalars. */
  def prioritySample(docs: DataFrame, stratum: String, id: String,
                     text: String, k: Int = 8): DataFrame = {
    val w = size(TextOps.tokens(col(text))).cast("long")
    val u = TextOps.polyHashMixed(
      concat(col(stratum), lit(":"), col(id).cast("string")))
    val rows = docs.select(col(stratum), col(id).cast("long").as("did"),
        w.as("w"), u.as("u"))
      .withColumn("priority", expr("u div greatest(w, 1L)"))
    val totals = rows.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).cast("long").as("total_mass"))
    val kept1 = graft.plans.TopKPerKey(rows, Seq(col(stratum)),
      Seq(col("priority"), col("did")), k + 1, rankName = "rk")
    val tau = kept1.groupBy(col(stratum))
      .agg(max(when(col("rk") === k + 1,
        expr(s"${TextOps.P} div greatest(priority, 1L)"))).as("tau"))
    val kept = kept1.where(col("rk") <= k)
    val est = kept.join(broadcast(tau), Seq(stratum))
      .groupBy(col(stratum))
      .agg(sum(greatest(col("w"), coalesce(col("tau"), lit(0L))))
        .cast("long").as("est_mass"))
    kept
      .join(broadcast(totals), Seq(stratum))
      .join(broadcast(est), Seq(stratum))
      .select(col(stratum), col("rk").cast("long").as("rk"),
        col("did"), col("w"), col("priority"),
        col("est_mass"), col("total_mass"))
  }

  /** DuckDB mirror of [[prioritySample]]. */
  def prioritySampleSql(stratum: String, id: String, text: String,
                        k: Int = 8): String = {
    val u = TextOps.polyHashMixedSql(
      s"($stratum || ':' || CAST($id AS VARCHAR))")
    val w = s"CAST(len(${TextOps.tokensSql(text)}) AS BIGINT)"
    s"""
      WITH rows_ AS (
        SELECT $stratum, CAST($id AS BIGINT) AS did, $w AS w,
               ($u) // greatest($w, 1) AS priority
        FROM documents),
      totals AS (
        SELECT $stratum, COUNT(*) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS total_mass
        FROM rows_ GROUP BY 1),
      ranked AS (
        SELECT $stratum, did, w, priority,
               ROW_NUMBER() OVER (PARTITION BY $stratum
                 ORDER BY priority, did) AS rk
        FROM rows_),
      tau AS (
        SELECT $stratum,
               MAX(CASE WHEN rk = ${k + 1}
                   THEN ${TextOps.P} // greatest(priority, 1) END) AS tau
        FROM ranked WHERE rk <= ${k + 1} GROUP BY 1),
      kept AS (SELECT * FROM ranked WHERE rk <= $k),
      est AS (
        SELECT kept.$stratum,
               CAST(SUM(greatest(w, COALESCE(tau, 0))) AS BIGINT)
                 AS est_mass
        FROM kept JOIN tau ON tau.$stratum = kept.$stratum
        GROUP BY 1)
      SELECT kept.$stratum AS $stratum, rk, did, w, priority,
             est.est_mass, totals.total_mass
      FROM kept
        JOIN totals ON totals.$stratum = kept.$stratum
        JOIN est ON est.$stratum = kept.$stratum
      ORDER BY $stratum, rk"""
  }

  /** Apply a temperature-flattened mixture (CorpusStats.domainMix's
    * alpha=0.5 weights) as an ACTUAL deterministic resample — the
    * daily step that turns mixture math into a training corpus.
    *
    * Per source s: target tokens T_s = budget · isqrt(tokens_s)/Σisqrt
    * (the flattened share of `budgetPpm`·total tokens), sampling rate
    * r_s = min(1, T_s/tokens_s) quantized to parts-per-million, and a
    * doc is kept iff its id-hash bucket (over 10^6) falls below the
    * source's quota — same stable-hash contract as
    * [[stratifiedSample]], so the sample is reproducible across runs
    * and cluster layouts. ALL arithmetic is exact integers — every
    * ratio is multiply-then-integer-divide, and every product is
    * widened through decimal(38,0) (HUGEINT on the oracle side), so
    * there is no float division anywhere and no 64-bit overflow even
    * at 100 TB corpus token counts (tot_tokens·budgetPpm and
    * budget_tokens·isq both exceed 2^63 well below that scale).
    *
    * Shape: one per-source token agg (map-side combinable), a one-row
    * totals broadcast, a broadcast quota join back onto the docs (the
    * quota table has one row per source), and the keep-filter is then
    * a pure map. Returns the per-source audit: kept docs/tokens next
    * to the quota applied. */
  def applyMixture(docs: DataFrame, source: String, id: String,
                   text: String, budgetPpm: Long): DataFrame = {
    val perSource = docs
      .select(col(source),
        size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("isq", CorpusStats.isqrtExact(col("n_tokens")))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"), sum(col("isq")).as("tot_isq"))
    val quotas = perSource.crossJoin(broadcast(totals))
      // budget · share, all-integer with decimal(38,0)-wide products:
      // T_s = (tot_tokens·budgetPpm div 1e6) · isq div tot_isq
      .withColumn("budget_tokens",
        expr(s"(cast(tot_tokens as decimal(38,0)) * $budgetPpm) div 1000000"))
      .withColumn("target_tokens",
        expr("(cast(budget_tokens as decimal(38,0)) * isq) div tot_isq"))
      .withColumn("quota_ppm",
        least(lit(1000000L),
          CorpusStats.ppmExpr("target_tokens", "n_tokens")))
      .select(col(source), col("n_docs"), col("n_tokens"), col("quota_ppm"))
    val bucket = pmod(
      TextOps.polyHashMixed(
        concat(col(source), lit(":"), col(id).cast("string"))),
      lit(1000000L))
    val kept = docs
      .select(col(source), col(id),
        size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .withColumn("bucket", bucket)
      .join(broadcast(quotas.select(col(source), col("quota_ppm"))),
        Seq(source))
      .where(col("bucket") < col("quota_ppm"))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("tokens_kept"))
    quotas.join(kept, Seq(source), "left")
      .select(col(source), col("n_docs"), col("n_tokens"), col("quota_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
  }

  def applyMixtureSql(source: String, id: String, text: String,
                      budgetPpm: Long): String = {
    val tk = TextOps.tokensSql(text)
    // d.-qualified: `source` exists on both sides of the quota join
    val bucket =
      s"(${TextOps.polyHashMixedSql(s"(d.$source || ':' || CAST(d.$id AS VARCHAR))")}) % 1000000"
    s"""
      WITH base AS (
        SELECT $source, COUNT(*) AS n_docs,
               SUM(CAST(len($tk) AS BIGINT)) AS n_tokens
        FROM documents GROUP BY 1),
      per_source AS (
        SELECT $source, n_docs, n_tokens,
               ${CorpusStats.isqrtCorrectSql("n_tokens", "isq0")} AS isq
        FROM (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS isq0
              FROM base)),
      tot AS (SELECT SUM(n_tokens) AS tot_tokens, SUM(isq) AS tot_isq
              FROM per_source),
      targets AS (
        SELECT $source, n_docs, n_tokens,
               ((CAST(tot_tokens AS HUGEINT) * $budgetPpm) // 1000000)
                 * isq // tot_isq AS target_tokens
        FROM per_source CROSS JOIN tot),
      quotas AS (
        SELECT $source, n_docs, n_tokens,
               least(1000000,
                 ${CorpusStats.ppmSql("target_tokens", "n_tokens")})
                 AS quota_ppm
        FROM targets),
      kept AS (
        SELECT d.$source, COUNT(*) AS n_kept,
               SUM(CAST(len($tk) AS BIGINT)) AS tokens_kept
        FROM documents d JOIN quotas q ON d.$source = q.$source
        WHERE $bucket < q.quota_ppm
        GROUP BY 1)
      SELECT q.$source AS $source, q.n_docs,
             CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quota_ppm,
             CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
             CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
      FROM quotas q LEFT JOIN kept k ON q.$source = k.$source"""
  }

  /** Length-outlier trim (the C4/Gopher "drop the freaks" gate, made
    * exact): cut every document whose token count falls outside the
    * corpus's [loPpm, hiPpm] nearest-rank percentile band, and report
    * the per-source audit (docs cut low/high, docs and tokens kept)
    * plus the thresholds applied. Truncated-length extremes are the
    * classic quality tells — boilerplate stubs at the short end,
    * concatenation junk at the long end — and a percentile band
    * adapts to the corpus where a fixed cut doesn't.
    *
    * Exactness without a global sort: token counts live on a bounded
    * integer domain, so the c38 move applies — histogram groupBy
    * (partial-aggregable, ≤ |domain| rows) + a cumsum over the TINY
    * histogram; the single-partition window is over the histogram,
    * never the corpus. Thresholds are a broadcast one-row table; the
    * gate and the audit agg are then one map + one partial-aggregable
    * groupBy over the corpus — two corpus scans total (count pass +
    * gate pass), both pushdown-friendly. Nearest-rank = smallest n
    * whose running count reaches ceil(q·N): integer-only, so the
    * oracle matches bit-for-bit. */
  def lengthTrim(docs: DataFrame, source: String, text: String,
                 loPpm: Long, hiPpm: Long): DataFrame = {
    val t = docs.select(col(source),
      size(TextOps.tokens(col(text))).cast("long").as("n"))
    val th = lengthThresholds(docs, text, loPpm, hiPpm)
    t.crossJoin(broadcast(th))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") < col("lo"), 1L).otherwise(0L)).as("cut_low"),
        sum(when(col("n") > col("hi"), 1L).otherwise(0L)).as("cut_high"),
        sum(when(col("n").between(col("lo"), col("hi")), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(when(col("n").between(col("lo"), col("hi")), col("n"))
          .otherwise(0L)).cast("long").as("tokens_kept"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .orderBy(col(source))
  }

  /** The [[lengthTrim]] band alone: one row (lo, hi) of exact
    * nearest-rank token-count percentiles — the trained artifact a
    * streaming gate broadcasts (Streams.lengthGateStreaming). Same
    * c38 shape: histogram groupBy over the bounded count domain, then
    * the cumsum window runs on the TINY histogram, never the corpus. */
  def lengthThresholds(docs: DataFrame, text: String,
                       loPpm: Long, hiPpm: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .select(size(TextOps.tokens(col(text))).cast("long").as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(lit(1))))
    def q(ppm: Long): Column =
      min(when(col("cum") >= expr(s"($ppm * tot + 999999) div 1000000"),
        col("n")))
    cum.agg(q(loPpm).as("lo"), q(hiPpm).as("hi"))
  }

  /** DuckDB CTE body computing the [[lengthThresholds]] row as `th`
    * (expects to be spliced after WITH; `from` picks the corpus). */
  def lengthThresholdsCtes(text: String, loPpm: Long, hiPpm: Long,
                           from: String = "documents"): String = {
    val tk = TextOps.tokensSql(text)
    s"""lt_t AS (
        SELECT CAST(len($tk) AS BIGINT) AS n FROM $from),
      lt_hist AS (SELECT n, COUNT(*) AS cnt FROM lt_t GROUP BY 1),
      lt_cum AS (
        SELECT n,
               SUM(cnt) OVER (ORDER BY n ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS tot
        FROM lt_hist),
      th AS (
        SELECT CAST(MIN(CASE WHEN cum >= ($loPpm * tot + 999999) // 1000000
                 THEN n END) AS BIGINT) AS lo,
               CAST(MIN(CASE WHEN cum >= ($hiPpm * tot + 999999) // 1000000
                 THEN n END) AS BIGINT) AS hi
        FROM lt_cum)"""
  }

  /** DuckDB mirror of [[lengthTrim]] (same histogram-cumsum
    * nearest-rank thresholds, same audit agg). */
  def lengthTrimSql(source: String, text: String,
                    loPpm: Long, hiPpm: Long): String = {
    val tk = TextOps.tokensSql(text)
    s"""
      WITH t AS (
        SELECT $source, CAST(len($tk) AS BIGINT) AS n FROM documents),
      ${lengthThresholdsCtes(text, loPpm, hiPpm)}
      SELECT $source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN n < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS cut_low,
             CAST(SUM(CASE WHEN n > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS cut_high,
             CAST(SUM(CASE WHEN n BETWEEN lo AND hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN n BETWEEN lo AND hi THEN n ELSE 0 END)
               AS BIGINT) AS tokens_kept,
             MAX(lo) AS lo, MAX(hi) AS hi
      FROM t CROSS JOIN th
      GROUP BY $source
      ORDER BY $source"""
  }

  /** Per-source fractional-epoch targets for the data-constrained
    * regime — [[applyMixture]]'s flattened share WITHOUT the 1.0 cap:
    * when the token budget exceeds a source's share of the corpus,
    * the source is REPEATED (multiple epochs) instead of sampled
    * down. epochs_ppm = target_tokens·10^6 div n_tokens, where
    * target_tokens is the same isqrt-flattened share of
    * budgetPpm·total tokens. Repeating data for a handful of epochs
    * trades close to fresh data early and degrades predictably
    * (Muennighoff et al., "Scaling Data-Constrained Language
    * Models"), which is why the repeat step is a first-class mixing
    * operator, not a training-loop hack. All-integer, same
    * decimal(38,0)/HUGEINT widening discipline as [[applyMixture]]. */
  private def epochTargets(docs: DataFrame, source: String,
                           text: String, budgetPpm: Long): DataFrame = {
    val perSource = docs
      .select(col(source),
        size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .withColumn("isq", CorpusStats.isqrtExact(col("n_tokens")))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"), sum(col("isq")).as("tot_isq"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("budget_tokens",
        expr(s"(cast(tot_tokens as decimal(38,0)) * $budgetPpm) div 1000000"))
      .withColumn("target_tokens",
        expr("(cast(budget_tokens as decimal(38,0)) * isq) div tot_isq"))
      .withColumn("epochs_ppm",
        CorpusStats.ppmExpr("target_tokens", "n_tokens"))
      .select(col(source), col("n_docs"), col("n_tokens"),
        col("epochs_ppm"))
  }

  /** The repeated corpus itself: each doc emitted
    * `epochs_ppm div 10^6` times, plus once more iff its stable hash
    * bucket falls below the fractional remainder — so a 2.4-epoch
    * source repeats every doc twice and a deterministic 40% of docs a
    * third time, and the SAME docs get the extra copy in every run
    * and on every cluster layout (the [[stratifiedSample]] hash
    * contract, applied above 1.0 instead of below). The copy index
    * makes repeats distinct rows for downstream shuffling/packing.
    *
    * Shape at 100 TB: the target table is one row per source
    * (broadcast); copy generation is a map-side explode whose fanout
    * is the epoch count (single digits by construction — repeating
    * data past a few epochs is the regime the paper shows stops
    * paying) — no shuffle anywhere in the repeat itself. */
  def epochRepeat(docs: DataFrame, source: String, id: String,
                  text: String, budgetPpm: Long): DataFrame = {
    val bucket = pmod(
      TextOps.polyHashMixed(
        concat(col(source), lit(":"), col(id).cast("string"))),
      lit(1000000L))
    docs.select(col(source), col(id),
        size(TextOps.tokens(col(text))).cast("long").as("tok"))
      .withColumn("bucket", bucket)
      .join(broadcast(epochTargets(docs, source, text, budgetPpm)
        .select(col(source), col("epochs_ppm"))), Seq(source))
      .withColumn("n_copies",
        expr("epochs_ppm div 1000000") +
          when(col("bucket") < expr("epochs_ppm % 1000000"), lit(1L))
            .otherwise(lit(0L)))
      .where(col("n_copies") > 0L)
      .withColumn("copy",
        explode(sequence(lit(0L), col("n_copies") - lit(1L))))
      .select(col(source), col(id), col("copy"), col("tok"))
  }

  /** Per-source audit of [[epochRepeat]]: the emitted doc/token mass
    * aggregated FROM the repeated frame (so the audit checks the emit
    * path, not a closed form) next to the target, with realized_ppm
    * quantifying the hash-uniformity error of the fractional step. */
  def epochAudit(docs: DataFrame, source: String, id: String,
                 text: String, budgetPpm: Long): DataFrame = {
    val emitted = epochRepeat(docs, source, id, text, budgetPpm)
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_emitted"),
        sum(col("tok")).cast("long").as("tokens_emitted"))
    epochTargets(docs, source, text, budgetPpm)
      .join(emitted, Seq(source), "left")
      .withColumn("n_emitted", coalesce(col("n_emitted"), lit(0L)))
      .withColumn("tokens_emitted",
        coalesce(col("tokens_emitted"), lit(0L)))
      .withColumn("realized_ppm",
        CorpusStats.ppmExpr("tokens_emitted", "n_tokens"))
      .select(col(source), col("n_docs"), col("n_tokens"),
        col("epochs_ppm"), col("n_emitted"), col("tokens_emitted"),
        col("realized_ppm"))
  }

  /** DuckDB mirror of [[epochAudit]]. The repeat is a bounded unnest
    * (`range(0, $copyCap)` + WHERE) because range() takes no lateral
    * column argument; the error() guard makes an epoch count at or
    * above the cap fail loudly instead of silently truncating. */
  def epochAuditSql(source: String, id: String, text: String,
                    budgetPpm: Long, copyCap: Int = 16): String = {
    val tk = TextOps.tokensSql(text)
    val bucket =
      s"(${TextOps.polyHashMixedSql(s"(d.$source || ':' || CAST(d.$id AS VARCHAR))")}) % 1000000"
    s"""
      WITH base AS (
        SELECT $source, COUNT(*) AS n_docs,
               SUM(CAST(len($tk) AS BIGINT)) AS n_tokens
        FROM documents GROUP BY 1),
      per_source AS (
        SELECT $source, n_docs, n_tokens,
               ${CorpusStats.isqrtCorrectSql("n_tokens", "isq0")} AS isq
        FROM (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS isq0
              FROM base)),
      tot AS (SELECT SUM(n_tokens) AS tot_tokens, SUM(isq) AS tot_isq
              FROM per_source),
      targets AS (
        SELECT $source, n_docs, n_tokens,
               CASE WHEN ep >= ${copyCap}000000
                    THEN error('epochAudit: epoch count exceeds oracle copy cap $copyCap')
                    ELSE ep END AS epochs_ppm
        FROM (
          SELECT $source, n_docs, n_tokens,
                 ${CorpusStats.ppmSql("target_tokens", "n_tokens")} AS ep
          FROM (
            SELECT $source, n_docs, n_tokens,
                   ((CAST(tot_tokens AS HUGEINT) * $budgetPpm) // 1000000)
                     * isq // tot_isq AS target_tokens
            FROM per_source CROSS JOIN tot))),
      rep AS (
        SELECT d.$source, d.$id, r.copy,
               CAST(len($tk) AS BIGINT) AS tok
        FROM documents d JOIN targets t ON d.$source = t.$source
          CROSS JOIN (SELECT unnest(range(0, $copyCap)) AS copy) r
        WHERE r.copy < (t.epochs_ppm // 1000000)
              + CASE WHEN $bucket < (t.epochs_ppm % 1000000)
                     THEN 1 ELSE 0 END),
      emitted AS (
        SELECT $source, COUNT(*) AS n_emitted,
               SUM(tok) AS tokens_emitted
        FROM rep GROUP BY 1)
      SELECT t.$source AS $source, t.n_docs,
             CAST(t.n_tokens AS BIGINT) AS n_tokens,
             CAST(t.epochs_ppm AS BIGINT) AS epochs_ppm,
             CAST(COALESCE(e.n_emitted, 0) AS BIGINT) AS n_emitted,
             CAST(COALESCE(e.tokens_emitted, 0) AS BIGINT)
               AS tokens_emitted,
             CAST((CAST(COALESCE(e.tokens_emitted, 0) AS HUGEINT)
               * 1000000) // t.n_tokens AS BIGINT) AS realized_ppm
      FROM targets t LEFT JOIN emitted e ON t.$source = e.$source"""
  }
}
