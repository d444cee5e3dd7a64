package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup

/** Control harness for the r9-verdict window-skew question: the
  * c57/c78/c85 per-hash occurrence counts used to ride
  * `count()/row_number() over Window.partitionBy(h)` — no partial
  * aggregation, so a viral boilerplate window (one 16-token block
  * repeated across the whole corpus) lands EVERY occurrence in one
  * sorted task. The reshaped operators use a map-side-combinable
  * groupBy(h) joined back on h (AQE-skew-splittable).
  *
  * Two measurements:
  *
  * 1. STAGE microbench — the disputed count stage alone, over a
  *    pre-materialized (did, h) parquet with one hash carrying
  *    `hotN` occurrences against `hotN` singleton hashes. AQE skew
  *    thresholds are scaled down (16 MB / 8 MB advisory) so the
  *    skew-split fires at the same hot-partition/threshold RATIO a
  *    100 TB corpus hits with the 256 MB default — locally the hot
  *    partition is ~150 MB; at corpus scale it is terabytes.
  * 2. OPERATOR A/B — the full c57/c85 pipelines (old window form
  *    inlined here vs the shipped groupBy form) on a tokenized
  *    synthetic corpus, showing what the reshape costs when the
  *    scan dominates (the group form pays a second tokenize scan).
  *
  * Usage: runMain graft.tools.HotHashAB [hotN] [nDocs]
  */
object HotHashAB {
  def main(args: Array[String]): Unit = {
    val hotN = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(400000L)
    val w = 16
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      // Emulate the 100 TB skew regime at local data sizes: the stock
      // 256 MB skewedPartitionThreshold never fires on a ~150 MB local
      // hot partition, but a 100 TB corpus's hot partition is TBs over
      // the same threshold. Scaling both knobs keeps the ratio.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .appName("hot-hash-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // ================= 1. stage microbench =============================
    // one hash with hotN occurrences + hotN singleton hashes
    val whPath = "/tmp/hothash_wh"
    s.range(hotN).select((col("id") % 10000L).as("did"), lit(42L).as("h"))
      .union(s.range(hotN)
        .select((col("id") % 10000L).as("did"), (col("id") + 1000L).as("h")))
      .repartition(32)
      .write.mode("overwrite").parquet(whPath)
    def whT = s.read.parquet(whPath)
    // window form: per-hash count via WindowExec — the hot partition is
    // one task that must buffer+sort every occurrence
    def stageWindow(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      whT.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("h"))))
        .groupBy(col("did"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("nd2"))
    }
    // group form (the shipped shape): map-side-combinable count,
    // FILTERED to the duplicated hashes before the join-back — the
    // build side is |dup hashes|, AQE-broadcastable, and the probe is
    // skew-splittable when shuffle-sized
    def stageGroup(): DataFrame = {
      val wh = whT
      val dup = wh.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .where(col("nd") >= 2).select(col("h"), lit(1L).as("isdup"))
      wh.join(dup, Seq("h"), "left")
        .groupBy(col("did"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("isdup"), lit(0L))).as("nd2"))
    }

    // ================= 2. full-operator A/B ============================
    val hot = (0 until w).map(i => s"boiler$i").mkString(" ")
    val docs = s.range(nDocs).select(col("id").cast("string").as("doc_id"),
      concat(lit(hot + " "), array_join(transform(sequence(lit(0), lit(7)),
        i => concat(lit("u"), col("id"), lit("_"), i)), " ")).as("text"))
      .repartition(32)
    def c57Window(d: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val th = d.select(col("doc_id").as("did"),
        transform(TextOps.tokens(col("text")),
          t => TextOps.polyHash(t)).as("th"))
      val wh = th.select(col("did"),
        explode(array_distinct(TextOps.ngramHashes(col("th"), w))).as("h"))
      wh.withColumn("nd", count(lit(1)).over(Window.partitionBy(col("h"))))
        .groupBy(col("did"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
    }
    def c57Group(d: DataFrame): DataFrame =
      Dedup.dupWindowRate(d, "doc_id", "text", w)
    def c85Window(d: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val p = w
      val th = d.select(col("doc_id").as("did"),
          TextOps.tokens(col("text")).as("toks"),
          transform(TextOps.tokens(col("text")),
            t => TextOps.polyHash(t)).as("th"))
        .withColumn("nc", size(col("toks")))
        .withColumn("nb",
          floor((col("nc") + lit(p - 1)) / lit(p)).cast("int"))
        .withColumn("bh", transform(sequence(lit(0), col("nb") - 1),
          b => aggregate(slice(col("th"), b * p + 1, lit(p)), lit(0L),
            (acc, x) => (acc * 31L + x) % lit(TextOps.P))))
      th.select(col("did"), posexplode(col("bh")).as(Seq("b", "h")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("did"), col("b"))))
        .where(col("rk") >= 2)
        .groupBy(col("did")).agg(count(lit(1)).as("n_removed_blocks"))
    }
    def c85Group(d: DataFrame): DataFrame =
      Dedup.paragraphDedup(d, "doc_id", "text", w)
        .select(col("doc_id"), col("n_removed_blocks"))

    // SPARK_GRAFT_AB_ARMS=stage (prefix filter) / SPARK_GRAFT_AB_REPS=2
    // restrict the sweep for big-hotN scaling points.
    val armFilter = sys.env.get("SPARK_GRAFT_AB_ARMS")
    val reps = sys.env.get("SPARK_GRAFT_AB_REPS").map(_.toInt).getOrElse(4)
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "stage/window" -> (() => stageWindow()),
      "stage/group " -> (() => stageGroup()),
      "c57/window  " -> (() => c57Window(docs)),
      "c57/group   " -> (() => c57Group(docs)),
      "c85/window  " -> (() => c85Window(docs)),
      "c85/group   " -> (() => c85Group(docs)))
      .filter { case (k, _) => armFilter.forall(k.startsWith) }
    def run(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, f) => run(f) } // warmup
    val times = scala.collection.mutable.Map[String, List[Double]]()
    // Arm order ALTERNATES per rep (GraphAB lesson: a fixed order lets
    // the second arm ride the first arm's page cache).
    for (rep <- 1 to reps;
         (k, f) <- if (rep % 2 == 1) arms else arms.reverse) {
      val dt = run(f)
      times(k) = dt :: times.getOrElse(k, Nil)
      println(f"AB rep=$rep $k%-14s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-14s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
