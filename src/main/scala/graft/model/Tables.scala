package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-typed loaders for the driver-generated parquet tables
  * (TPC-H-ish star schema + documents/embeddings/events).
  *
  * All readers go through `spark.read.parquet` so Catalyst sees a
  * plain file scan: filters and column pruning push down to parquet
  * (verified via explain: PushedFilters / ReadSchema). At cluster
  * scale the same call reads a partitioned directory tree unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** The driver has regenerated the testdata with drifting physical
    * timestamp encodings across rounds: INT64 TIMESTAMP(NANOS) (read as
    * LongType under legacy nanosAsLong), then tz-aware micros (read as
    * TimestampType), currently naive micros (read as TimestampNTZType
    * unless spark.sql.parquet.inferTimestampNTZ.enabled=false). All
    * sessions here pin timeZone=UTC, so NTZ->LTZ casting preserves the
    * stored micros exactly; normalize every timestamp-ish column to
    * plain TimestampType so query code sees one stable type regardless
    * of which session config the caller built (the driver's smoke
    * session is not under our control). */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType =>
          d.withColumn(f.name, d.col(f.name).cast(TimestampType))
        case _ => d
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark reads it
    * as a long when spark.sql.legacy.parquet.nanosAsLong=true (set in
    * Verify/Bench sessions). Normalize to a microsecond timestamp so
    * downstream code always sees a real timestamp column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
