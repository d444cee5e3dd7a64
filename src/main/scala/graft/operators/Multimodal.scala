package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with a partition-wise feature-extraction stub.
  *
  * The Spark-side shape is real — binary column, metadata struct,
  * mapPartitions batching, schema of the extracted features — but the
  * decode step is a STUB: this container has no image/audio codecs,
  * so `decodeStub` computes deterministic fake features (byte length
  * + rolling checksum) where a real pipeline would JNI into a codec.
  * Swap `decodeStub`'s body for the real decoder; nothing else
  * changes.
  */
object Multimodal {

  /** Wrap documents as a blob table: payload bytes + typed metadata
    * (as an image-ish width/height/channels struct derived from the
    * doc — deterministic stand-ins for real media headers). */
  def asBlobTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      encode(col(text), "UTF-8").as("blob"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") * 7 % 480 + 1).cast("int").as("height"),
        lit(3).as("channels")).as("meta"))

  /** Partition-wise "decode": iterate each partition's rows once,
    * emitting fixed-width features per blob. Runs as one task per
    * partition — the batch shape a real codec (or model) needs. */
  def decodeStub(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id"), col("blob"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, w, h) =>
          // STUB: real decoder goes here (image decode / resample /
          // frame-sample). Deterministic fake: length + byte checksum.
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          (id, bytes.length.toLong, sum % 256, w.toLong * h)
        }
      }
      .toDF("doc_id", "byte_len", "checksum", "pixels")
  }
}
