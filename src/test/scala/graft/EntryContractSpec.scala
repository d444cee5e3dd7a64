package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.operators.Multimodal
import graft.model.Tables

/** Guards the driver contract: every query resolves, oracle keys line
  * up with query keys, and no query leaks a raw timestamp column
  * (SURVEY.md §4 determinism rule). */
class EntryContractSpec extends SparkSpec {

  test("entry() produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o === q, s"every query carries an oracle; diff: ${q.diff(o)} ${o.diff(q)}")
    assert(q.size >= 45, "full SURVEY §2 inventory registered")
  }

  test("every query analyzes at sf0.001 and emits no raw timestamps") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema // forces analysis only
      val bad = schema.fields.filter(f =>
        f.dataType == TimestampType || f.dataType == TimestampNTZType)
      assert(bad.isEmpty, s"$name leaks timestamp cols: ${bad.map(_.name).toSeq}")
    }
  }

  test("pluggable codec: raw-gray8 histogram bins sum to the byte length") {
    import org.apache.spark.sql.functions.col
    val blobs = Multimodal.asBlobTable(Tables.documents(spark, sf), "doc_id", "text")
    val row = Multimodal.decode(blobs, Multimodal.RawGray8Codec)
      .where(col("doc_id") === 0).head()
    val binSum = Seq("bin0", "bin1", "bin2", "bin3")
      .map(row.getAs[Long](_)).sum
    val expectedLen = Tables.documents(spark, sf)
      .where(col("doc_id") === 0).head().getAs[String]("text").length.toLong
    assert(binSum === expectedLen)
    assert(row.getAs[Long]("mean_x100") > 0)
  }

  test("audio framing: hand-computed frame parity on a synthetic payload") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, struct}
    // 8 samples (16 bytes), frameSize=4, hop=2 → 3 full frames
    val bytes = Array[Byte](
      0, 0, 0, 127, 0, 0, 0, 127, 0, 0, 0, 127, 0, 0, 0, 127)
    val blobs = Seq((0L, bytes)).toDF("doc_id", "blob")
      .withColumn("meta", struct(lit(1).as("width"), lit(1).as("height"),
        lit(1).as("channels")))
    val out = Multimodal.audioFrames(blobs, frameSize = 4, hop = 2)
      .orderBy(col("frame_idx")).collect()
    assert(out.length === 3)
    // samples alternate -16384 and 127*256-16384 = 16128 → every
    // adjacent pair crosses zero: 3 crossings per 4-sample frame
    assert(out.forall(_.getAs[Long]("zero_crossings") === 3L))
    val expSumSq = 2L * 16384 * 16384 + 2L * 16128 * 16128
    assert(out.forall(_.getAs[Long]("sum_sq") === expSumSq))
  }

  test("multimodal blob table carries binary payload + typed metadata") {
    val blobs = Multimodal.asBlobTable(Tables.documents(spark, sf), "doc_id", "text")
    assert(blobs.schema("blob").dataType.typeName === "binary")
    assert(blobs.schema("meta").dataType.typeName === "struct")
    val row = Multimodal.decodeStub(blobs).where(org.apache.spark.sql.functions.col("doc_id") === 0).head()
    // checksum is mod 256; byte_len equals the ascii text length
    assert(row.getAs[Long]("checksum") >= 0 && row.getAs[Long]("checksum") < 256)
    val expectedLen = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") === 0)
      .head().getAs[String]("text").length.toLong
    assert(row.getAs[Long]("byte_len") === expectedLen)
  }
}
