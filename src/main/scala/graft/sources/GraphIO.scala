package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.MemoryGraph

/** Graph import/export, mirroring mie's export surface
  * (/root/reference/pkg/tools/export.go: JSON and Datalog formats;
  * cmd/mie/import.go). Spark-first: JSON lines partitioned by node
  * type — splittable, schema-carrying, round-trippable; the Datalog
  * rendering is a derived text column for interop with the
  * reference's `:put` scripts.
  */
object GraphIO {

  /** Write the graph as JSONL (nodes + edges dirs). Partitioned by
    * ntype/etype so a selective re-import prunes directories. */
  def exportJson(g: MemoryGraph, dir: String): Unit = {
    g.nodes.write.mode("overwrite").partitionBy("ntype").json(s"$dir/nodes")
    g.edges.write.mode("overwrite").partitionBy("etype").json(s"$dir/edges")
  }

  /** Read a JSONL export back into a MemoryGraph. */
  def importJson(spark: SparkSession, dir: String): MemoryGraph = {
    val nodes = spark.read.json(s"$dir/nodes")
      .select(col("id"), col("ntype"), col("content"), col("attr"),
        col("score").cast("double"))
    val edges = spark.read.json(s"$dir/edges")
      .select(col("etype"), col("src"), col("dst"), col("prop"))
    new MemoryGraph(nodes, edges)
  }

  private def q(c: org.apache.spark.sql.Column) =
    concat(lit("'"), regexp_replace(c, "'", "\\\\'"), lit("'"))

  /** Render nodes AND edges as Datalog :put rows — one text line per
    * row, tagged with its relation name. The reference's Datalog
    * export (export.go exportDatalog) renders only the five NODE
    * tables (truncated at 100KB); rendering the edge relations too is
    * an extension here, and it changes the output shape for a
    * node-only consumer: a `rel` column is added and edge rows are
    * appended. Filter `rel` to the node types for a reference-shaped
    * dump. */
  def toDatalog(g: MemoryGraph): DataFrame = {
    val nodeRows = g.nodes.select(col("ntype").as("rel"), concat(
      lit("?[id, content, attr, score] <- [["),
      q(col("id")), lit(", "), q(col("content")), lit(", "),
      q(col("attr")), lit(", "), col("score").cast("string"),
      lit("]] :put graft_"), col("ntype"),
      lit(" { id => content, attr, score }")).as("datalog"))
    val edgeRows = g.edges.select(col("etype").as("rel"), concat(
      lit("?[src, dst, prop] <- [["),
      q(col("src")), lit(", "), q(col("dst")), lit(", "),
      q(col("prop")),
      lit("]] :put graft_"), col("etype"),
      lit(" { src, dst => prop }")).as("datalog"))
    nodeRows.unionAll(edgeRows)
  }

  /** [[toDatalog]] with the reference's byte cap applied PER RELATION
    * (export.go:110 truncates the whole dump at 100 KB and appends a
    * `// ... (output truncated)` trailer; per-relation is the
    * distributed-friendly reading — each relation truncates
    * independently, so the cap needs one window per relation, not a
    * global sort). Rows are kept in the relation's lexicographic
    * line order while the cumulative rendered length (line + newline)
    * stays within `maxBytes`; a truncated relation gains one marker
    * row carrying its full byte count, mirroring the reference's
    * trailer text. */
  def toDatalogCapped(g: MemoryGraph,
                      maxBytes: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = toDatalog(g)
    val w = Window.partitionBy(col("rel")).orderBy(col("datalog"))
    val withCum = all.withColumn("cum",
      sum(length(col("datalog")).cast("long") + 1L).over(w))
    val kept = withCum.where(col("cum") <= maxBytes)
      .select(col("rel"), col("datalog"))
    val markers = withCum.groupBy(col("rel"))
      .agg(max(col("cum")).as("total"))
      .where(col("total") > maxBytes)
      .select(col("rel"),
        concat(lit("// ... (output truncated, export is "),
          col("total").cast("string"), lit(" bytes)")).as("datalog"))
    kept.unionAll(markers)
  }
}
