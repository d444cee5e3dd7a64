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
