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

  test("ShingleHashes3 parity holds for trailing and consecutive spaces") {
    // Spark split(t, " ") keeps empty tokens (limit -1); the native
    // expression must tokenize identically — these shapes are exactly
    // what the corpus never contains and a seeded generator missed
    val docs = Seq(
      "a b c ", "a b c  ", " a b c", "a  b c", "a b  c d",
      "  ", "a ", " ", "a  b", "x y z w ").zipWithIndex.map(_.swap)
      .toDF("id", "t")
    val diff = docs.select(
        $"id",
        array_sort(TextOps.shingleHashes($"t")).as("fast"),
        array_sort(transform(TextOps.shingles3(TextOps.tokens($"t")),
          s => TextOps.polyHashHof(s))).as("ref"))
      .where(not($"fast" === $"ref"))
    assert(diff.isEmpty, diff.limit(5).collect().mkString("\n"))
  }

  test("float_dot is null for ragged arrays, matching the HOF composition") {
    import graft.functions.VectorOps
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)), // equal length
      (Seq(1f, 2f), Seq(4f, 5f, 6f)),     // ragged
      (Seq.empty[Float], Seq(1f))          // empty vs non-empty
    ).toDF("a", "b")
    val r = df.select(
      VectorOps.dot($"a", $"b").as("native"),
      VectorOps.dotHof($"a", $"b").as("hof")).collect()
    assert(!r(0).isNullAt(0) && r(0).getDouble(0) === r(0).getDouble(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
    assert(r(2).isNullAt(0) && r(2).isNullAt(1))
  }
}
