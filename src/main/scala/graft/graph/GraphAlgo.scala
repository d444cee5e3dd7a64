package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic distributed graph algorithms over (src, dst) edge frames —
  * type-agnostic in the node id (string node ids, long doc ids, ...).
  */
object GraphAlgo {

  /** Undirected connected components: min-label propagation with
    * pointer jumping (label <- label(label) each round), so
    * convergence is O(log diameter) materialized rounds. Component id
    * = the smallest member under the id type's ordering. Returns
    * (node, component) for every node incident to an edge. */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 20): DataFrame = {
    val dir = edgesIn.toDF("src", "dst")
    val idType = dir.schema("src").dataType
    val und = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var lab = und.select(col("src").as("node"))
      .unionAll(und.select(col("dst").as("node")))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      // previous label rides along as `old` so convergence needs no
      // extra join after the jump
      val viaNbr = und.join(lab, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"),
          lit(null).cast(idType).as("old"))
      val merged = lab
        .select(col("node"), col("label"), col("label").as("old"))
        .unionAll(viaNbr)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      // pointer jump applied twice: label <- label(label(label(label))),
      // quartering chain depth per round (log4 rounds instead of log2)
      def jump(df: DataFrame): DataFrame = df.alias("a")
        .join(df.select(col("node").as("n2"), col("label").as("l2")),
          col("a.label") === col("n2"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("l2"), col("a.label")).as("label"),
          col("a.old").as("old"))
      val next = jump(jump(merged)).localCheckpoint(true)
      changed = next.where(col("label") =!= col("old")).count()
      lab = next.select(col("node"), col("label"))
      iter += 1
    }
    lab.select(col("node"), col("label").as("component"))
  }
}
