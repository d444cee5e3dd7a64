package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Seeded randomized parity: the one-pass ShingleHashes3 combine
  * (h(a||b) = h(a)*31^len(b) + h(b) mod p) must equal hashing the
  * shingle strings, for arbitrary token shapes — not just the corpus'
  * single-space lowercase words. */
class RandomizedParitySpec extends SparkSpec {
  import spark.implicits._

  test("ShingleHashes3 equals per-shingle string hashing on 300 random docs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    def token() = (1 to (1 + rnd.nextInt(12)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(40) // includes <3-token docs (empty shingles)
      (i, (1 to n).map(_ => token()).mkString(" "))
    }.toDF("id", "t")
    val diff = docs.select(
        $"id",
        array_sort(TextOps.shingleHashes($"t")).as("fast"),
        array_sort(transform(TextOps.shingles3(TextOps.tokens($"t")),
          s => TextOps.polyHashHof(s))).as("ref"))
      .where(not($"fast" === $"ref"))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
  }

  test("polyHash native equals HOF fold on random strings incl. empties") {
    val rnd = new scala.util.Random(7)
    val strs = ("" +: (1 to 200).map(_ =>
      (0 to rnd.nextInt(50)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString))
      .zipWithIndex.map(_.swap)
    val df = strs.toDF("id", "t")
    val diff = df.select(TextOps.polyHash($"t").as("a"),
        TextOps.polyHashHof($"t").as("b"))
      .where($"a" =!= $"b")
    assert(diff.isEmpty)
  }
}
