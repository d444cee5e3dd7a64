package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.streaming.Streams

/** Streaming from a real file source: readStream over a parquet
  * directory (the production shape — files land, stream picks them
  * up), through the same windowCounts transformation, parity with
  * batch. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("parquet file-source stream produces batch-identical window counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // land the events as files (normalized ts so the stream schema is
    // a plain timestamp — file streams read with an explicit schema)
    val events = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    events.write.mode("overwrite").parquet(s"$dir/in")

    val staticDf = spark.read.parquet(s"$dir/in")
    val streamDf = spark.readStream.schema(staticDf.schema)
      .parquet(s"$dir/in")
    val q = Streams.windowCounts(streamDf)
      .writeStream.format("memory").queryName("filewin")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("filewin")
      .orderBy($"hour_bucket", $"event_type").collect().toSeq
    val batch = Streams.windowCounts(events)
      .orderBy($"hour_bucket", $"event_type").collect().toSeq
    assert(streamed === batch)
  }
}
