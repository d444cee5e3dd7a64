package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** A/B harness for the r12-verdict rolling-hash question: the five
  * w=16 window-hash sites (c30/c57/c78/c85/c91) built their gram
  * hashes via interpreted array-HOF folds (TextOps.ngramHashesHof —
  * w element_at calls per window, 1.9-2.9 s each at sf0.1), and the
  * winnowing reshape (posexplode + lead-chain + doc-keyed WindowExec)
  * had won 15.6x on a related pattern, suggesting ~2x headroom here.
  *
  * Three candidate shapes per primitive, measured on the REAL sf
  * corpus (SPARK_GRAFT_SF_DIR, default sf0.1):
  *
  *   hof       — the r12-shipped interpreted HOF composition
  *   native    — native Catalyst expressions (TokenHashes /
  *               NgramHashes with the O(n) rolling update /
  *               BlockHashes): map-side, zero extra shuffle
  *   leadchain — the winnowing-style WindowExec reshape: pays a full
  *               (did, p)-shuffle + sort of the token stream to get
  *               codegen'd lead() arithmetic
  *
  * The native arm is the scale pick a priori (same shuffle count as
  * hof, primitive loops); leadchain is measured to document WHY it
  * was rejected for these sites — its shuffle grows with the corpus
  * while hof/native stay map-side. Every arm ends in the same
  * count+checksum aggregate, and the harness ASSERTS hof == native
  * checksums (bit-identity) before timing.
  *
  * Usage: runMain graft.tools.GramHashAB [w] [reps]
  */
object GramHashAB {
  def main(args: Array[String]): Unit = {
    val w = args.headOption.map(_.toInt).getOrElse(16)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.locality.wait", "0s")
      .appName("gram-hash-ab").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    println(s"docs: ${docs.count()} @ $sfDir, w=$w")

    def tokHof(d: DataFrame): DataFrame =
      d.select(col("doc_id").as("did"),
        transform(TextOps.tokens(col("text")),
          t => TextOps.polyHash(t)).as("th"))
    def tokNative(d: DataFrame): DataFrame =
      d.select(col("doc_id").as("did"),
        TextOps.tokenHashesSeq(col("text")).as("th"))

    // every arm collapses to the same (count, checksum) row
    def sink(wh: DataFrame): DataFrame =
      wh.agg(count(lit(1)).as("n"),
        sum(pmod(col("h"), lit(1000003L))).as("chk"))

    // --- token-hash stage ------------------------------------------
    def tokenArm(tok: DataFrame => DataFrame)(): DataFrame =
      sink(tok(docs).select(explode(col("th")).as("h")))

    // --- gram-hash stage (the five-site primitive) -------------------
    def gramHof(): DataFrame =
      sink(tokHof(docs).select(
        explode(TextOps.ngramHashesHof(col("th"), w)).as("h")))
    def gramNative(): DataFrame =
      sink(tokNative(docs).select(
        explode(TextOps.ngramHashes(col("th"), w)).as("h")))
    def gramLeadChain(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val byPos = Window.partitionBy(col("did")).orderBy(col("p"))
      val toks = docs
        .select(col("doc_id").as("did"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("p", "tok")))
        .select(col("did"), col("p"),
          TextOps.polyHash(col("tok")).as("th"))
      val gram = (1 until w).foldLeft(col("th")) { (acc, j) =>
        (acc * 31L + lead(col("th"), j).over(byPos)) % lit(TextOps.P)
      }
      sink(toks.select(gram.as("h")).where(col("h").isNotNull))
    }

    // --- block-hash stage (c85's primitive) --------------------------
    def blockHof(): DataFrame = {
      val th = tokHof(docs)
        .withColumn("n", size(col("th")))
        .withColumn("nb",
          floor((col("n") + lit(w - 1)) / lit(w)).cast("int"))
      sink(th.select(explode(transform(sequence(lit(0), col("nb") - 1),
        b => aggregate(slice(col("th"), b * w + 1, lit(w)), lit(0L),
          (acc, x) => (acc * 31L + x) % lit(TextOps.P)))).as("h")))
    }
    def blockNative(): DataFrame =
      sink(tokNative(docs).select(
        explode(TextOps.blockHashes(col("th"), w)).as("h")))

    // --- full-operator arms: c57 as shipped vs its r12 HOF form ------
    def c57Hof(): DataFrame = {
      val th = tokHof(docs)
      val wh = th.select(col("did"),
        explode(array_distinct(TextOps.ngramHashesHof(col("th"), w)))
          .as("h"))
      val dup = wh.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .where(col("nd") >= 2).select(col("h"), lit(1L).as("isdup"))
      wh.join(dup, Seq("h"), "left")
        .groupBy(col("did"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("isdup"), lit(0L))).as("nd2"))
        .agg(count(lit(1)).as("n"), sum(col("nd2")).as("chk"))
    }
    def c57Native(): DataFrame =
      graft.operators.Dedup.dupWindowRate(docs, "doc_id", "text", w)
        .agg(count(lit(1)).as("n"), sum(col("n_dup_windows")).as("chk"))

    // --- minhash signature (the c16/c19/c60/c109/c113 family) -------
    def shhT(d: DataFrame): DataFrame =
      d.select(col("doc_id").as("did"),
        TextOps.shingleHashes(col("text")).as("shh"))
    def mhHof(): DataFrame =
      sink(shhT(docs).select(
        explode(TextOps.minHashSignatureHof(col("shh"), 48)).as("h")))
    def mhNative(): DataFrame =
      sink(shhT(docs).select(
        explode(TextOps.minHashSignature(col("shh"), 48)).as("h")))

    // --- simhash (c4/c58's signature stage) --------------------------
    def tokSetT(d: DataFrame): DataFrame =
      d.select(col("doc_id").as("did"),
        TextOps.tokenHashes(col("text")).as("shh"))
    def shHof(): DataFrame =
      sink(tokSetT(docs).select(
        TextOps.simHash30Hof(col("shh")).as("h")))
    def shNative(): DataFrame =
      sink(tokSetT(docs).select(TextOps.simHash30(col("shh")).as("h")))

    // --- winnowing prints: r12 lead-chain WindowExec vs native ------
    def winnowLeadChain(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val kg = 4; val ww = 4
      val byPos = Window.partitionBy(col("did")).orderBy(col("p"))
      val toks = docs
        .select(col("doc_id").as("did"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("p", "tok")))
        .select(col("did"), col("p"),
          TextOps.polyHash(col("tok")).as("th"))
      val gram = (1 until kg).foldLeft(col("th")) { (acc, j) =>
        (acc * 31L + lead(col("th"), j).over(byPos)) % lit(TextOps.P)
      }
      val grams = toks
        .select(col("did"), col("p"), gram.as("g"),
          (count(lit(1)).over(Window.partitionBy(col("did"))) -
            (kg - 1)).as("glen"))
        .where(col("g").isNotNull)
      val winMin = min(col("g")).over(
        Window.partitionBy(col("did")).orderBy(col("p"))
          .rowsBetween(Window.currentRow, ww - 1))
      sink(grams
        .select(col("did"), col("p"), col("glen"), winMin.as("h"))
        .where(col("p") <= greatest(col("glen") - ww, lit(0L)))
        .select(col("did"), col("h")).distinct())
    }
    def winnowNative(): DataFrame =
      sink(graft.operators.Dedup.winnowingPrints(
        docs, "doc_id", "text", 4, 4))

    // bit-identity gate before timing: hof == native on every stage
    def row(df: DataFrame): (Long, Long) = {
      val r = df.collect()(0)
      (r.getAs[Long]("n"), r.getAs[Long]("chk"))
    }
    assert(row(tokenArm(tokHof)()) == row(tokenArm(tokNative)()),
      "token-hash checksum mismatch")
    val gh = row(gramHof()); val gn = row(gramNative())
    assert(gh == gn, s"gram checksum mismatch: $gh vs $gn")
    assert(gh == row(gramLeadChain()), "leadchain checksum mismatch")
    assert(row(blockHof()) == row(blockNative()),
      "block checksum mismatch")
    assert(row(c57Hof()) == row(c57Native()), "c57 checksum mismatch")
    assert(row(winnowLeadChain()) == row(winnowNative()),
      "winnow checksum mismatch")
    assert(row(mhHof()) == row(mhNative()), "minhash checksum mismatch")
    assert(row(shHof()) == row(shNative()), "simhash checksum mismatch")
    println("CHECKSUMS OK (hof == native == leadchain)")

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "token/hof      " -> tokenArm(tokHof) _,
      "token/native   " -> tokenArm(tokNative) _,
      "gram/hof       " -> (() => gramHof()),
      "gram/native    " -> (() => gramNative()),
      "gram/leadchain " -> (() => gramLeadChain()),
      "block/hof      " -> (() => blockHof()),
      "block/native   " -> (() => blockNative()),
      "c57/hof        " -> (() => c57Hof()),
      "c57/native     " -> (() => c57Native()),
      "winnow/leadwin " -> (() => winnowLeadChain()),
      "winnow/native  " -> (() => winnowNative()),
      "minhash/hof    " -> (() => mhHof()),
      "minhash/native " -> (() => mhNative()),
      "simhash/hof    " -> (() => shHof()),
      "simhash/native " -> (() => shNative()))
    def run(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    arms.foreach { case (_, f) => run(f) } // warmup
    val times = scala.collection.mutable.Map[String, List[Double]]()
    // arm order alternates per rep (GraphAB lesson: page-cache bias)
    for (rep <- 1 to reps;
         (k, f) <- if (rep % 2 == 1) arms else arms.reverse) {
      val dt = run(f)
      times(k) = dt :: times.getOrElse(k, Nil)
      println(f"AB rep=$rep $k%-16s $dt%6.2f s")
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1))
      println(f"AB SUMMARY $name%-16s median=${ts.sorted.apply(ts.size / 2)}%6.2f min=${ts.min}%6.2f")
    s.stop()
  }
}
