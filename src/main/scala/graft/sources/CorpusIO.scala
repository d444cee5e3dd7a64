package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Packing

/** Physical corpus export/import — the file side of c48's logical
  * shard layout: the routed, within-shard-ordered corpus actually
  * written as one JSONL directory per shard, and read back with the
  * layout intact. The write realizes exactly the plan shardManifest
  * describes: `repartitionByRange`-free, ONE hash repartition on the
  * shard key + `sortWithinPartitions(h, id)` — so each shard's file
  * carries its documents in the manifest's (hash, id) order and the
  * order_checksum computed from the files equals the manifest's
  * (CorpusIOSpec pins it). JSONL, not parquet, for the export seam:
  * the interchange format other trainers ingest; parquet remains the
  * analytical format everywhere else.
  *
  * Scale: one shuffle total (the same exchange the manifest uses);
  * `shards` sized to the corpus gives thousands of hash-balanced
  * files at 100 TB; a single file per shard here is local-mode
  * convenience — the within-shard ORDER, not the file count, is the
  * contract (a loader concatenates a shard's files in name order).
  */
object CorpusIO {

  /** Write `docs` as `dir/shard=<s>/part-*.json` with the c48 layout;
    * columns written: id, text, h (the routing hash — kept so a
    * reader can verify placement without re-tokenizing). */
  def writeShards(docs: DataFrame, id: String, text: String,
                  shards: Int, dir: String): Unit =
    Packing.shardAssign(docs, id, text, shards)
      .select(col(id), col(text), col("h"), col("shard"))
      .repartition(shards, col("shard"))
      // shard leads the sort key: the partitioned writer REQUIRES rows
      // grouped by the partition column and would otherwise insert its
      // own (unstable) sort by shard, scrambling the (h, id) order
      .sortWithinPartitions(col("shard"), col("h"), col(id))
      .write.mode("overwrite")
      .partitionBy("shard")
      .json(dir)

  /** Read a [[writeShards]] directory back. The shard partition
    * column comes back from the directory names; `_pos` is the
    * 0-based position of the row WITHIN its shard file stream (files
    * concatenated in name order — the loader contract above).
    *
    * The reconstruction is split-proof: rows order by
    * `(file, file_block_start, monotonically_increasing_id)`.
    * `file_block_start` is the byte offset of the row's file split,
    * so splits of one file sort in file order no matter how Spark
    * packs splits into read partitions (it packs by descending split
    * SIZE, so the id's partition-index high bits alone would permute
    * rows once a file exceeds `spark.sql.files.maxPartitionBytes` —
    * the silent-reorder trap this column closes); within one split
    * the id is monotonically increasing in row order, and a text
    * split never duplicates or drops a line (the reader re-anchors to
    * line boundaries). */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_file"), col("_blockStart"), col("_fileOffset"))
    spark.read.json(dir)
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_blockStart", col("_metadata.file_block_start"))
      .withColumn("_fileOffset", monotonically_increasing_id())
      .withColumn("_pos", row_number().over(w).cast("long") - 1L)
      .drop("_file", "_blockStart", "_fileOffset")
  }
}
