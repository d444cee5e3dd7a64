package graft

import org.apache.spark.sql.functions._
import graft.graph.MemoryGraph
import graft.sources.GraphIO

/** Writer surface (store / invalidate / updateAttr / validNodes) and
  * JSONL round-trip. */
class WriterIOSpec extends SparkSpec {
  import spark.implicits._

  private def g = MemoryGraph.fromTables(spark, sf)

  test("store appends a typed node visible to lookup") {
    val g2 = g.store("fact:999999", "fact", "a brand new fact", "en", 1.0)
    assert(g2.node("fact:999999").count() === 1)
    assert(g.node("fact:999999").isEmpty, "original snapshot unchanged")
  }

  test("invalidate removes the old fact from the valid view only") {
    val g2 = g
      .store("fact:999998", "fact", "corrected fact", "en", 1.0)
      .invalidate("fact:0", "fact:999998", "superseded by correction")
    val valid = g2.validNodes("fact")
    assert(valid.where($"id" === "fact:0").isEmpty)
    assert(valid.where($"id" === "fact:999998").count() === 1)
    // the node itself still exists (history preserved), only validity changed
    assert(g2.node("fact:0").count() === 1)
    // and the invalidation chain is walkable
    assert(g2.walk("fact:999998", "invalidates", 5).count() === 1)
  }

  test("updateAttr rewrites exactly one node's attr") {
    val g2 = g.updateAttr("dec:0", "reversed")
    assert(g2.node("dec:0").select($"attr").as[String].head() === "reversed")
    assert(g2.nodes.where($"attr" === "reversed").count() === 1)
  }

  test("JSONL export/import round-trips the graph") {
    val dir = java.nio.file.Files.createTempDirectory("graphio").toString
    GraphIO.exportJson(g, dir)
    val back = GraphIO.importJson(spark, dir)
    assert(back.nodes.count() === g.nodes.count())
    assert(back.edges.count() === g.edges.count())
    // spot-check content equality through a node lookup
    assert(back.node("ent:c:42").select($"content").as[String].head() ===
      g.node("ent:c:42").select($"content").as[String].head())
    // full set equality on nodes
    assert(back.nodes.exceptAll(g.nodes).isEmpty)
  }

  test("datalog rendering produces one :put line per node") {
    val dl = GraphIO.toDatalog(g)
    assert(dl.count() === g.nodes.count())
    val line = dl.where($"datalog".contains("'ent:c:42'"))
      .select($"datalog").as[String].head()
    assert(line.startsWith("?[id, content, attr, score] <- [["))
    assert(line.contains(":put graft_entity"))
  }
}
