package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketches}

/** Unit specs for the deterministic sketches and substring dedup. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: estimate within the m=64 error band, partition-stable") {
    val n = 2000
    val df = (0 until n).map(i => ("k", i.toLong)).toDF("key", "v")
    val out = Sketches.hllDistinct(df, "key", $"v").collect()(0)
    assert(out.getAs[Long]("n_exact") == n.toLong)
    val est = out.getAs[Double]("hll_estimate")
    // sigma = 1.04/sqrt(64) = 13%; 3-sigma bound
    assert(math.abs(est - n) / n < 0.39, s"estimate $est too far from $n")
    // register folds are max/sum — partitioning must not change the
    // estimate (the property that makes the sketch mergeable)
    val rep = Sketches.hllDistinct(df.repartition(13, $"v"), "key", $"v")
      .collect()(0)
    assert(rep.getAs[Double]("hll_estimate") == est)
  }

  test("substringPairs: shared 16-token run found, boilerplate capped") {
    val run = (1 to 16).map(i => s"tok$i").mkString(" ")
    def noise(seed: Int) = (1 to 20).map(i => s"w${seed}_$i").mkString(" ")
    val docs = Seq(
      (1L, s"${noise(1)} $run ${noise(2)}"),
      (2L, s"${noise(3)} $run"),
      (3L, noise(4))).toDF("doc_id", "text")
    val pairs = Dedup.substringPairs(docs, "doc_id", "text",
        w = 16, maxBucket = 32)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // a span shared by MORE than maxBucket docs is boilerplate: with
    // the cap at 2, a run appearing in 3 docs yields no pairs
    val many = Seq(
      (1L, s"${noise(1)} $run"), (2L, s"${noise(2)} $run"),
      (3L, s"${noise(3)} $run")).toDF("doc_id", "text")
    assert(Dedup.substringPairs(many, "doc_id", "text",
      w = 16, maxBucket = 2).count() == 0L)
    assert(Dedup.substringPairs(many, "doc_id", "text",
      w = 16, maxBucket = 3).count() == 3L)
  }
}
