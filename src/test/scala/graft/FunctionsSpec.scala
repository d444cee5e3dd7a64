package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    ).toDF("a", "b")
    val sims = df.select(VectorOps.cosine6($"a", $"b")).as[Double].collect()
    assert(sims(0) === 1.0)
    assert(sims(1) === 0.0)
  }

  test("dot is a sequential fold (matches hand computation)") {
    val df = Seq((Array(1.5f, 2f), Array(2f, 0.5f))).toDF("a", "b")
    assert(df.select(VectorOps.dot($"a", $"b")).as[Double].head() === 4.0)
  }

  test("polyHash matches the reference recurrence") {
    // h("ab") = (0*31+97)*31 + 98 mod p = 3105
    val df = Seq("ab").toDF("t")
    assert(df.select(TextOps.polyHash($"t")).as[Long].head() === 3105L)
  }

  test("shingles3 produces word 3-grams in order") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(TextOps.shingles3(TextOps.tokens($"t"))).as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
  }

  test("minhash signature has k entries and is permutation-stable") {
    val df = Seq("x y z w v u").toDF("t")
    val sig = df.select(TextOps.minHashSignature(TextOps.shingleHashes($"t"), 16))
      .as[Seq[Long]].head()
    assert(sig.length === 16)
    // same shingle set, different order => same signature
    val df2 = Seq("x y z w v u").toDF("t")
    val sig2 = df2.select(TextOps.minHashSignature(TextOps.shingleHashes($"t"), 16))
      .as[Seq[Long]].head()
    assert(sig === sig2)
  }

  test("native expressions are bit-identical to the builtin compositions") {
    val docs = graft.model.Tables.documents(spark, sf).limit(50).cache()
    // poly hash: codegen'd byte loop vs char-by-char HOF fold
    val hashDiff = docs.select(
      TextOps.polyHash($"text").as("a"), TextOps.polyHashHof($"text").as("b"))
      .where($"a" =!= $"b")
    assert(hashDiff.isEmpty)
    // shingle hashes: one-pass combine vs per-shingle string hashing
    val shDiff = docs.select(
      array_sort(TextOps.shingleHashes($"text")).as("a"),
      array_sort(transform(TextOps.shingles3(TextOps.tokens($"text")),
        s => TextOps.polyHashHof(s))).as("b"))
      .where(org.apache.spark.sql.functions.not($"a" === $"b"))
    assert(shDiff.isEmpty)
    // dot: native float loop vs zip_with/aggregate fold
    val emb = graft.model.Tables.embeddings(spark, sf).limit(50)
    val dotDiff = emb.select(
      VectorOps.dot($"embedding", $"embedding").as("a"),
      VectorOps.dotHof($"embedding", $"embedding").as("b"))
      .where($"a" =!= $"b")
    assert(dotDiff.isEmpty)
  }

  test("simHash30 stays within 30 bits and is deterministic") {
    val df = Seq("alpha beta gamma delta epsilon").toDF("t")
    val h = df.select(TextOps.simHash30(TextOps.shingleHashes($"t"))).as[Long].head()
    assert(h >= 0L && h < (1L << 30))
    val h2 = df.select(TextOps.simHash30(TextOps.shingleHashes($"t"))).as[Long].head()
    assert(h === h2)
  }
}
