package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.sources.CorpusIO

/** Physical shard export parity: the JSONL files carry exactly the
  * layout c48's manifest describes — same routing, same within-shard
  * order (checksum-verified), lossless text round-trip.
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards round-trips the corpus with the manifest's order") {
    val docs = graft.model.Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "corpus-io")
      .toString
    CorpusIO.writeShards(docs, "doc_id", "text", shards = 16, dir)
    val back = CorpusIO.readShards(spark, dir)
    // lossless round-trip: same (id, text) set
    assert(back.count() === docs.count())
    assert(back.select($"doc_id", $"text").exceptAll(
      docs.select($"doc_id", $"text")).isEmpty)
    // placement: every row sits in the shard its carried hash names
    assert(back.where(pmod($"h", lit(16L)) =!= $"shard").isEmpty)
    // file order IS the manifest order: recompute the order-sensitive
    // checksum from the read-back per-shard positions
    val got = back
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        (sum(expr(s"cast(_pos + 1 as decimal(38,0)) * " +
          s"(h % ${Packing.HashFold}) % ${Packing.ShardMod}"))
          % lit(Packing.ShardMod)).cast("long").as("order_checksum"))
      .orderBy($"shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("order_checksum")))
    val manifest = Packing.shardManifest(docs, "doc_id", "text", 16)
      .orderBy($"shard").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("order_checksum")))
    assert(got.toSeq === manifest.toSeq)
  }
}
