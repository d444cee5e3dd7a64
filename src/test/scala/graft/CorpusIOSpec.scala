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

  test("readShards _pos survives files split across read partitions") {
    // the silent-reorder trap: Spark packs file splits into read
    // partitions by descending split size, so once a shard file spans
    // several splits, partition-index order no longer matches file
    // order. Force pathological splitting (4 KB) and require the
    // reconstructed per-shard positions to be IDENTICAL to the
    // unsplit read's.
    val docs = graft.model.Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "corpus-io-split")
      .toString
    CorpusIO.writeShards(docs, "doc_id", "text", shards = 4, dir)
    val whole = CorpusIO.readShards(spark, dir)
      .select($"shard", $"doc_id", $"_pos").collect()
      .map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString))
      .toSet
    val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val savedOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      // precondition: the tiny split size really does shred the files
      // across many read partitions (otherwise the test proves
      // nothing) — checked on the raw scan, before readShards' window
      // exchange re-partitions the frame
      assert(spark.read.json(dir).rdd.getNumPartitions > 4)
      val split = CorpusIO.readShards(spark, dir)
      val got = split.select($"shard", $"doc_id", $"_pos").collect()
        .map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString))
        .toSet
      assert(got === whole)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
      spark.conf.set("spark.sql.files.openCostInBytes", savedOpen)
    }
  }
}
