package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Ann
import graft.util.Barriers.BarrierOps

/** The index-forever loop on a DRIFTED arrival distribution — the
  * r9/r10-carried evidence item: c79's alarm must FIRE, d36's cycle
  * must TRIGGER before the scheduled drain, and c82's
  * recall_after > recall_before must show the retrain RECOVERING
  * recall on the drifted mass, each with a same-distribution control
  * alongside so the signal is the drift, not the machinery.
  *
  * Fixture: deterministic mock-embed families. The indexed corpus is
  * family A — a 5.0 spike on dim 16·(id mod 4) over 0.2-amplitude
  * mock noise (four tight clusters, so the trained centroids
  * actually MEAN something; the raw testdata embeddings barely
  * cluster — base sim ≈0.27 — which is why this spec synthesizes its
  * corpus instead of reusing them, keeping the assertions robust to
  * driver data regeneration). Control arrivals draw from family A
  * with fresh ids (same distribution); drifted arrivals are family B
  * — the SAME generator with spike dims SHIFTED by 8 (the "shifted
  * mock-embed seed" drift): directions the trained centroids do not
  * cover at all. Growth alarms are disabled throughout (huge
  * maxGrowthPpm): the isolated signal is assignment-quality DRIFT.
  *
  * Measured at head (deterministic): control drift ≈ −6k ppm
  * (quiet at the 150k bar), drifted ≈ −800k (fires); recall@5 on the
  * drifted queries: see the c82 test's info line and SURVEY §7h.
  */
class RetrainDriftSpec extends SparkSpec {
  import spark.implicits._

  private val NoGrowthAlarm = 1000000000L
  private val DriftDown = 150000L

  /** Mock-embed family: 5.0 spike on dim 16·(id mod 4) + dimOff,
    * plus 0.2·mock noise seeded by the id — fully deterministic. */
  private def family(ids: Range, dimOff: Int): DataFrame =
    ids.toDF("vec_id")
      .select($"vec_id".cast("long").as("vec_id"),
        transform(VectorOps.mockEmbedding(
            pmod($"vec_id" * lit(7919L) + lit(123457L), lit(1000003L)),
            64),
          (x, i) => x * lit(0.2) +
            when(i === (pmod($"vec_id", lit(4)).cast("int") * lit(16) +
                lit(dimOff)), lit(5.0))
              .otherwise(lit(0.0)))
          .cast("array<float>").as("embedding"),
        lit(0).cast("int").as("label"))

  private lazy val base = family(0 until 200, 0).barrier(true)
  private lazy val control = family(1000 until 1100, 0).barrier(true)
  private lazy val arrivalsDrift = family(2000 until 2100, 8).barrier(true)
  private lazy val queriesDrift = family(3000 until 3050, 8).barrier(true)

  private lazy val idx: Ann.IvfIndex = {
    val cent = Ann.kmeansFit(base, "vec_id", "embedding",
      k = 8, iters = 2).barrier(true)
    Ann.IvfIndex(
      cent.select($"vec_id".as("c_id"), $"embedding".as("c_vec")),
      Ann.buildLists(base, Ann.centTable(cent, "vec_id", "embedding"),
        "vec_id", "embedding").barrier(true))
  }

  private def flagged(arr: DataFrame): Long =
    Ann.retrainVerdict(
        Ann.ivfAppendAudit(idx, arr, "vec_id", "embedding"),
        NoGrowthAlarm, DriftDown)
      .agg(sum($"retrain")).as[Long].head()

  test("c79 alarm: drifted arrivals flag retrain, in-distribution " +
      "control stays quiet") {
    val fCtrl = flagged(control)
    val fDrift = flagged(arrivalsDrift)
    assert(fCtrl === 0L,
      s"control (same distribution) must not fire the drift alarm, got $fCtrl")
    assert(fDrift > 0L, "drifted arrivals must fire the drift alarm")
  }

  test("d36 cycle: drifted feed triggers before the drain fallback, " +
      "control only drains") {
    val nB = 4
    def trigger(arr: DataFrame): Long =
      Ann.retrainCycle(idx, arr, "vec_id", "embedding",
          nBatches = nB, majorityPpm = 750000L,
          maxGrowthPpm = NoGrowthAlarm, maxDriftDownPpm = DriftDown)
        .select($"trigger_batch").as[Long].head()
    assert(trigger(arrivalsDrift) < (nB - 1).toLong,
      "drifted feed must fire the majority vote before drain")
    assert(trigger(control) === (nB - 1).toLong,
      "control feed must only reach the scheduled drain")
  }

  test("c82 recall: the retrain recovers recall on the drifted mass " +
      "(recall_after > recall_before), control recall stays high " +
      "either way") {
    def meanRecallPpm(probed: DataFrame, exact: DataFrame): Long =
      exact.alias("e")
        .join(probed.alias("i"),
          $"e.q_id" === $"i.q_id" && $"e.n_id" === $"i.n_id", "left")
        .agg((sum(when($"i.n_id".isNotNull, 1L).otherwise(0L))
          * 1000000L / count(lit(1))).cast("long")).as[Long].head()
    val members = base.select($"vec_id", $"embedding", $"label")
      .unionByName(arrivalsDrift).barrier(true)
    val exact = Ann.bruteForceTopK(members, queriesDrift,
      "vec_id", "embedding", k = 5).barrier(true)
    val before = meanRecallPpm(Ann.indexedTopK(
      Ann.appendIndex(idx, arrivalsDrift, "vec_id", "embedding"),
      queriesDrift, "vec_id", "embedding", nprobe = 2, k = 5), exact)
    val after = meanRecallPpm(Ann.indexedTopK(
      Ann.migrateLists(idx, arrivalsDrift, "vec_id", "embedding"),
      queriesDrift, "vec_id", "embedding", nprobe = 2, k = 5), exact)
    info(s"drifted-set recall@5 ppm: before=$before after=$after " +
      s"delta=${after - before}")
    assert(after > before,
      s"retrain must recover recall on the drifted set: " +
        s"before=$before after=$after")
    // no-drift control: the same machinery on in-distribution
    // arrivals — appended recall is already high and the migrate
    // does not damage it
    val membersC = base.select($"vec_id", $"embedding", $"label")
      .unionByName(control).barrier(true)
    val queriesC = family(4000 until 4050, 0).barrier(true)
    val exactC = Ann.bruteForceTopK(membersC, queriesC,
      "vec_id", "embedding", k = 5).barrier(true)
    val beforeC = meanRecallPpm(Ann.indexedTopK(
      Ann.appendIndex(idx, control, "vec_id", "embedding"),
      queriesC, "vec_id", "embedding", nprobe = 2, k = 5), exactC)
    val afterC = meanRecallPpm(Ann.indexedTopK(
      Ann.migrateLists(idx, control, "vec_id", "embedding"),
      queriesC, "vec_id", "embedding", nprobe = 2, k = 5), exactC)
    info(s"control-set recall@5 ppm: before=$beforeC after=$afterC")
    assert(afterC >= beforeC - 50000L,
      s"migrate must not damage in-distribution recall: " +
        s"before=$beforeC after=$afterC")
  }
}
