package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** Pins c90's sketch: hand-checked bucket math, bound inversion,
  * merge-equals-global (the streaming/sharded fold), and nearest-rank
  * agreement with the exact quantile to within the bucket bound. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucket index and bounds: hand-checked HDR mapping") {
    // v<4 exact; v>=4: octave=bitlen, 2 significand bits
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 10L, 15L, 16L,
      19L, 20L, 63L, 64L, 1000000L, Long.MaxValue)
    val out = QuantileSketch.quantiles(
        QuantileSketch.sketch(vals.toDF("v"), "v"), Seq.empty)
      .select($"bucket", $"lo", $"hi", $"n")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = Seq(
      (0L, 0L, 0L, 1L), (1L, 1L, 1L, 1L), (2L, 2L, 2L, 1L),
      (3L, 3L, 3L, 1L),
      (4L, 4L, 4L, 1L), (5L, 5L, 5L, 1L), (7L, 7L, 7L, 1L),
      (8L, 8L, 9L, 2L),             // 8 and 9 share [8,9]
      (9L, 10L, 11L, 1L),
      (11L, 14L, 15L, 1L),
      (12L, 16L, 19L, 2L),          // 16 and 19 share [16,19]
      (13L, 20L, 23L, 1L),
      (19L, 56L, 63L, 1L),
      (20L, 64L, 79L, 1L),
      // 1e6: bitlen 20, 1e6 >> 17 = 7 -> bucket 4*18+3 = 75
      (75L, 917504L, 1048575L, 1L),
      // Long.MaxValue: bitlen 63, >> 60 = 7 -> bucket 4*61+3 = 247
      (247L, 8070450532247928832L, Long.MaxValue, 1L))
    assert(out === expected)
    // every value lies inside its bucket's [lo, hi]
    val bounds = out.map(t => t._1 -> (t._2, t._3)).toMap
    vals.foreach { v =>
      val b = out.find(t => v >= t._2 && v <= t._3)
      assert(b.isDefined, s"value $v falls in no bucket")
    }
    assert(bounds.values.forall { case (lo, hi) => lo <= hi })
  }

  test("merge of sharded sketches equals the global sketch " +
      "(streaming-foldable state)") {
    val docs = graft.model.Tables.documents(spark, sf)
    val sur = graft.operators.CorpusStats
      .unigramSurprisal(docs, "doc_id", "text")
      .select($"doc_id", $"mean_bits_ppm")
    val parts = (0 until 3).map(i =>
      QuantileSketch.sketch(
        sur.where(pmod($"doc_id", lit(3)) === i), "mean_bits_ppm"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"bucket", $"n").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(rows(QuantileSketch.merge(parts)) ===
      rows(QuantileSketch.sketch(sur, "mean_bits_ppm")))
  }

  test("ksDrift: zero for groups with identical multisets, matches " +
      "the exact bucket-granularity statistic on real data, and " +
      "near 1e6 for disjoint ranges") {
    // replicate the bucket map in plain Scala
    def bkt(v: Long): Long =
      if (v < 4L) v
      else {
        val o = 64 - java.lang.Long.numberOfLeadingZeros(v)
        4L * (o - 2) + ((v >> (o - 3)) - 4)
      }
    // identical multisets -> every group distribution == blend
    val same = Seq("a", "b").flatMap(k =>
      Seq(1L, 5L, 9L, 100L, 1000L).map(v => (k, v))).toDF("source", "v")
    val z = QuantileSketch.ksDrift(same, "source", "v")
      .select($"ks_ppm").as[Long].collect()
    assert(z.toSeq === Seq(0L, 0L))
    // disjoint ranges -> drift approaches the groups' blend shares
    val far = (Seq.fill(50)(3L).map(("lo", _)) ++
      Seq.fill(50)(1000000L).map(("hi", _))).toDF("source", "v")
    val f = QuantileSketch.ksDrift(far, "source", "v")
      .select($"source", $"ks_ppm").as[(String, Long)].collect().toMap
    assert(f("lo") === 500000L && f("hi") === 500000L)
    // real data: ksDrift == the statistic computed from exact values
    // at sketch-bucket granularity
    val docs = graft.model.Tables.documents(spark, sf)
      .select($"source",
        size(graft.functions.TextOps.tokens($"text")).cast("long")
          .as("v"))
    val rows = docs.as[(String, Long)].collect()
    val buckets = rows.map(_._2).map(bkt).distinct.sorted
    val tots = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nAll = rows.length.toLong
    def cum(vs: Seq[Long], b: Long): Long = vs.count(bkt(_) <= b).toLong
    val allVs = rows.map(_._2).toSeq
    val expected = tots.keys.map { k =>
      val vs = rows.filter(_._1 == k).map(_._2).toSeq
      k -> buckets.map(b => math.abs(
        cum(vs, b) * 1000000L / tots(k) -
          cum(allVs, b) * 1000000L / nAll)).max
    }.toMap
    val got = QuantileSketch.ksDrift(docs, "source", "v")
      .select($"source", $"ks_ppm").as[(String, Long)].collect().toMap
    assert(got === expected)
  }

  test("quantile marks: exactly one bucket per mark, and the exact " +
      "nearest-rank value lies inside the marked bucket") {
    val docs = graft.model.Tables.documents(spark, sf)
    val sur = graft.operators.CorpusStats
      .unigramSurprisal(docs, "doc_id", "text")
    val marks = Seq("p50" -> 500000L, "p90" -> 900000L,
      "p99" -> 990000L)
    val q = QuantileSketch.quantiles(
      QuantileSketch.sketch(sur, "mean_bits_ppm"), marks)
    val vals = sur.select($"mean_bits_ppm").as[Long].collect().sorted
    marks.foreach { case (name, ppm) =>
      val marked = q.where(col(name) === 1L)
        .select($"lo", $"hi").as[(Long, Long)].collect()
      assert(marked.length === 1, s"$name must mark exactly one bucket")
      val rank = ((ppm * vals.length + 999999L) / 1000000L).toInt
      val exact = vals(rank - 1)
      val (lo, hi) = marked.head
      assert(exact >= lo && exact <= hi,
        s"$name exact=$exact outside marked bucket [$lo,$hi]")
    }
  }
}
