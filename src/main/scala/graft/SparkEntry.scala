package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.Q

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each suite contributes Q(name, sparkFn, oracleSql) entries.
  */
object SparkEntry {
  private def suites: Seq[graft.api.Suite] = Seq(
    graft.operators.RelationalSuite,
    graft.operators.GraphSuite,
    graft.operators.PipelineSuite,
    graft.operators.StreamingSuite)

  private lazy val all: Seq[Q] = suites.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.RelationalSuite.a4.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql.stripMargin.trim }.toMap
}
