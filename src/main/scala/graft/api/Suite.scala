package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (optionally) the
  * equivalent ANSI SQL the driver replays in DuckDB as an oracle.
  * `oracle == None` → the driver records a weaker rows-only check
  * (used for ops whose semantics aren't SQL-expressible, e.g. the
  * multimodal stub pipeline).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait Suite {
  def queries: Seq[Q]
}
