package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Barriers.BarrierOps

import graft.model.Tables

/** Spark-native re-expression of mie's memory graph
  * (/root/reference/docs/architecture.md "Data model";
  * /root/reference/pkg/memory/schema.go): typed nodes and edges are
  * DataFrames, every traversal is a join, and multi-hop walks are
  * iterative joins — so the whole surface scales horizontally instead
  * of walking pointers row-at-a-time like the reference's CozoDB
  * backend.
  *
  * Normalized node schema: (id, ntype, content, attr, score)
  *   - fact     → content=text,        attr=category
  *   - decision → content=title,       attr=status
  *   - entity   → content=name,        attr=kind
  *   - event    → content=title,       attr=event_date
  *   - topic    → content=name,        attr='segment'
  * Edge schema: (etype, src, dst, prop) — prop carries
  * decision_entity.role / invalidates.reason
  * (schema.go:102-140 edge tables).
  *
  * At cluster scale `nodes`/`edges` would be bucketed by id/src so
  * traversal joins co-locate; point lookups prune on the id-prefix
  * partition (ntype) first.
  */
final class MemoryGraph(val nodes: DataFrame, val edges: DataFrame) {

  /** GetNodeByID with prefix dispatch
    * (reader.go:309 GetNodeByID): the ntype filter prunes before the
    * id equality, mirroring the reference's prefix→table dispatch. */
  def node(id: String): DataFrame = {
    val nt = id.split(":", 2)(0) match {
      case "fact" => "fact"; case "dec" => "decision"; case "ent" => "entity"
      case "evt" => "event"; case "topic" => "topic"; case _ => ""
    }
    nodes.where(col("ntype") === nt && col("id") === id)
  }

  /** ListNodes: filter + sort + paginate + total_count
    * (reader.go:187 ListNodes / countNodes). Scale shape: the page is
    * fetched with orderBy+limit (TakeOrderedAndProject — a per-
    * partition bounded heap + driver merge, never a global sort or a
    * single-partition window over the full table); only the
    * (offset+limit)-row slice is ranked. total_count is the
    * reference's second scan, joined in as a broadcast scalar. */
  def list(ntype: String, attrEq: Option[String], sortBy: Column,
           limit: Int, offset: Int, validOnly: Boolean = false): DataFrame = {
    val filtered = attrEq.foldLeft(nodes.where(col("ntype") === ntype))(
      (df, a) => df.where(col("attr") === a))
    val base = if (validOnly) notInvalidated(filtered) else filtered
    val total = broadcast(base.agg(count(lit(1)).as("total_count")))
    val page = base.orderBy(sortBy, col("id")).limit(offset + limit)
    // rank only the k-row page; ntype is constant under the filter, so
    // partitioning by it is semantically global but avoids the
    // empty-partition-spec window path (a literal would be folded away
    // by EliminateWindowPartitions)
    val w = Window.partitionBy(col("ntype")).orderBy(sortBy, col("id"))
    page
      .withColumn("pos", row_number().over(w))
      .where(col("pos") > offset)
      .crossJoin(total)
      .select(col("pos"), col("id"), col("content"), col("attr"),
        col("score"), col("total_count"))
  }

  /** ExactSearch: substring match with a per-type limit
    * (reader.go:122 ExactSearch). */
  def exactSearch(q: String, ntypes: Seq[String], perType: Int): DataFrame = {
    val w = Window.partitionBy(col("ntype")).orderBy(col("id"))
    nodes
      .where(col("ntype").isin(ntypes: _*))
      .where(instr(col("content"), q) > 0)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= perType)
      .select(col("ntype"), col("rk"), col("id"), col("content"), col("attr"))
  }

  /** SemanticSearch across node types (reader.go:38-119): the
    * reference queries one HNSW table per node type and merges the
    * ranked heads into a single globally re-ranked result. Here each
    * type's content is embedded with the deterministic mock provider
    * (embedding.go:113 — swap in a real provider column at will),
    * ranked per type (the row_number window is rewritten to the
    * bounded-heap TopKPerKey by the optimizer rule), and the per-type
    * heads are merged and re-ranked globally by similarity.
    *
    * Two physical modes (the exactness/scale trade the reference
    * makes with its HNSW index, made explicit like
    * `spark.graft.approx.simjoin`):
    *   - default: EXACT — one scan of the pruned ntype partitions, no
    *     shuffle beyond the per-type top-k. Linear per query; the
    *     oracle path.
    *   - `spark.graft.approx.semantic=true`: IVF probe over the
    *     once-per-graph [[semanticIndex]] — the query ranks the k
    *     centroids, probes the `spark.graft.semantic.nprobe`
    *     (default 4) nearest inverted lists, and scans only those
    *     candidates: sublinear per query like the reference's indexed
    *     per-type search, recall < 1 by construction (measured in
    *     ApproxSemanticSpec). */
  def semanticSearch(queryText: String, ntypes: Seq[String], perType: Int,
                     k: Int, dim: Int = 16): DataFrame = {
    import graft.functions.{TextOps, VectorOps}
    def emb(c: Column) = transform(
      VectorOps.mockEmbedding(TextOps.polyHash(c), dim), _.cast("float"))
    val conf = nodes.sparkSession.conf
    val approx = conf.getOption("spark.graft.approx.semantic").contains("true")
    val qEmb = emb(lit(queryText))
    val scored =
      if (!approx)
        nodes.where(col("ntype").isin(ntypes: _*))
          .withColumn("emb", emb(col("content")))
          .withColumn("sim", VectorOps.cosine6(col("emb"), qEmb))
      else {
        val nprobe = conf.getOption("spark.graft.semantic.nprobe")
          .map(_.toInt).getOrElse(4)
        val (cents, assigned) = semanticIndex(dim)
        // rank the (tiny, broadcast) centroid table against the query,
        // keep the nprobe nearest inverted lists
        val probes = broadcast(cents
          .withColumn("qs", VectorOps.cosine6Pre(col("cv"), qEmb,
            col("cn"), VectorOps.norm(qEmb)))
          .orderBy(col("qs").desc, col("cid"))
          .limit(nprobe)
          .select(col("cid")))
        assigned.join(probes, "cid")
          .where(col("ntype").isin(ntypes: _*))
          .withColumn("sim", VectorOps.cosine6Pre(col("emb"), qEmb,
            col("nrm"), VectorOps.norm(qEmb)))
      }
    val w = Window.partitionBy(col("ntype"))
      .orderBy(col("sim").desc, col("id"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= perType)
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
      .select(col("ntype"), col("id"), col("sim"))
  }

  /** IVF index over every node's content embedding — the Spark
    * analogue of the reference's per-type HNSW index tables
    * (schema.go's HNSW indexes; reader.go:38-119 queries them instead
    * of scanning). Built ONCE per MemoryGraph instance (and
    * [[MemoryGraph.persisted]] instances are cached per (session,
    * dir), so per session in practice): k-means centroids over the
    * embeddings plus the per-node nearest-centroid assignment (the
    * inverted lists), both materialized behind barriers. At cluster
    * scale the assignment would persist next to the graph layout,
    * partitioned by cid — queries then prune to nprobe list
    * partitions exactly like the etype-partitioned edge scans. */
  @transient private lazy val semanticIndexes =
    scala.collection.concurrent.TrieMap.empty[Int, (DataFrame, DataFrame)]

  private def semanticIndex(dim: Int): (DataFrame, DataFrame) =
    semanticIndexes.getOrElseUpdate(dim, {
      import graft.functions.{TextOps, VectorOps}
      import graft.util.Barriers.BarrierOps
      // memoized across queries → PINNED: the harness' query-boundary
      // sweep must not free blocks later probes will re-scan
      val emb = graft.util.Barriers.pin(
        nodes.select(col("id"), col("ntype"),
        transform(VectorOps.mockEmbedding(TextOps.polyHash(col("content")),
          dim), _.cast("float")).as("emb")).barrier(true))
      val cents = graft.util.Barriers.pin(graft.operators.Ann
        .kmeansFit(emb, "id", "emb", k = 16, iters = 2)
        .select(col("id").as("cid"), col("emb").as("cv"),
          VectorOps.norm(col("emb")).as("cn")).barrier(true))
      // one corpus pass against the broadcast centroids = the
      // inverted lists; norms stored so probes pay only the dot
      val w = Window.partitionBy(col("id"))
        .orderBy(col("cs").desc, col("cid"))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("nrm", VectorOps.norm(col("emb")))
        .withColumn("cs", VectorOps.cosine6Pre(col("emb"), col("cv"),
          col("nrm"), col("cn")))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("id"), col("ntype"), col("emb"), col("nrm"), col("cid"))
        .barrier(true)
      (cents, graft.util.Barriers.pin(assigned))
    })

  /** Batch ingestion (batcher.go:19-188 / bulk_store.go): append a
    * whole DataFrame of nodes and/or edges in ONE union each — the
    * plan grows by one branch per BATCH, not per row, and at cluster
    * scale the batch is an appended partition compacted on write-out.
    * Columns are aligned by name to the graph schema. */
  def storeAll(newNodes: DataFrame, newEdges: DataFrame): MemoryGraph = {
    val n = if (newNodes == null) nodes else nodes.unionAll(
      newNodes.select(col("id"), col("ntype"), col("content"), col("attr"),
        col("score").cast("double")))
    val e = if (newEdges == null) edges else edges.unionAll(
      newEdges.select(col("etype"), col("src"), col("dst"), col("prop")))
    new MemoryGraph(n, e)
  }

  /** FindEntityByName (reader.go:385): case-insensitive exact name
    * match, first by id. */
  def findByName(ntype: String, name: String): DataFrame =
    nodes.where(col("ntype") === ntype &&
        lower(col("content")) === name.toLowerCase)
      .orderBy(col("id")).limit(1)

  /** FindFactByContent / FindDecisionByTitle (reader.go:412,438):
    * substring point lookups over one node type. The reference's
    * `:limit 1` is made deterministic as the min-id match; the ntype
    * equality prunes to ONE partition of the persisted layout before
    * any content is read, and the limit plans as
    * TakeOrderedAndProject — a point read, not a ranked scan. */
  def findFactByContent(q: String): DataFrame = firstMatch("fact", q)

  def findDecisionByTitle(q: String): DataFrame = firstMatch("decision", q)

  private def firstMatch(nt: String, q: String): DataFrame =
    nodes.where(col("ntype") === nt && instr(col("content"), q) > 0)
      .orderBy(col("id")).limit(1)

  /** 1-hop traversal src→dst over one edge type, returning dst nodes
    * (reader.go:464-614 GetRelatedEntities / GetFactsAboutEntity /
    * GetDecisionEntities / GetEntityDecisions — all are this join with
    * src/dst swapped as needed). */
  def outNeighbors(fromId: String, etype: String): DataFrame =
    edges.where(col("etype") === etype && col("src") === fromId)
      .join(nodes, col("dst") === col("id"))
      .select(col("id"), col("ntype"), col("content"), col("attr"),
        col("score"), col("prop"))

  def inNeighbors(toId: String, etype: String): DataFrame =
    edges.where(col("etype") === etype && col("dst") === toId)
      .join(nodes, col("src") === col("id"))
      .select(col("id"), col("ntype"), col("content"), col("attr"),
        col("score"), col("prop"))

  /** Multi-hop walk along one edge type from a start node
    * (reader.go:548 GetInvalidationChain generalized to arbitrary
    * depth). Pointer-doubling: level k composes stride-2^k edges with
    * themselves, so a depth-n chain needs O(log n) materialized rounds
    * instead of n sequential joins — the difference between 9 and 133
    * Spark jobs on the sf0.1 chains. Emits every traversed edge with
    * its (shortest) step number, matching the recursive-CTE oracle on
    * the (single-path) invalidates chains. */
  /** Multi-hop walk from `startId` over `etype` edges via pointer
    * doubling (stride self-composition), O(log maxHops) rounds.
    *
    * `edgeFilter` restricts the edge relation BEFORE doubling — the
    * doubling composes strides for every node in the relation, so a
    * caller that knows its chains live inside a property slice (the
    * invalidation chain of an event never leaves its event_type,
    * exactly as mie's revision chain never leaves its fact lineage)
    * should pass that slice: stride joins then touch one chain
    * family, not the whole edge type. Restricting to the *reached*
    * set instead would be wrong — doubling needs strides from nodes
    * ahead of the frontier. */
  def walk(startId: String, etype: String, maxHops: Int,
           edgeFilter: Option[Column] = None,
           nodeSlice: Option[DataFrame] = None): DataFrame = {
    val spark = nodes.sparkSession
    // `nodeSlice` (single `node` column) semi-joins the stride
    // relation down BEFORE doubling — the sound slice is any superset
    // of the start's weakly-connected component (a walk can never
    // leave it), e.g. [[MemoryGraph.componentView]] filtered to the
    // start's component. Only src needs the semi-join: both endpoints
    // of a component's edge are in the component.
    val sliced = edgeFilter
      .foldLeft(edges.where(col("etype") === etype))(_ where _)
    val e1 = nodeSlice.foldLeft(sliced)((df, ns) =>
        df.join(ns.select(col("node").as("__slice_node")),
          col("src") === col("__slice_node"), "left_semi"))
      .select(col("src"), col("dst"), col("prop")).barrier(true)
    var dist = spark.range(1)
      .select(lit(startId).as("node"), lit(0L).as("d"))
    var stride = e1.select(col("src").as("s"), col("dst").as("t"),
      lit(1L).as("len"))
    var span = 1L
    var grown = true
    var reached = 1L
    while (span < maxHops && grown) {
      val nd = dist.join(stride, col("node") === col("s"))
        .select(col("t").as("node"), (col("d") + col("len")).as("d"))
      dist = dist.unionAll(nd).groupBy(col("node"))
        .agg(min(col("d")).as("d")).barrier(true)
      val now = dist.count()
      grown = now > reached
      reached = now
      span *= 2
      if (span < maxHops && grown) {
        stride = stride.alias("x")
          .join(stride.alias("y"), col("x.t") === col("y.s"))
          .select(col("x.s").as("s"), col("y.t").as("t"),
            (col("x.len") + col("y.len")).as("len"))
          .barrier(true)
      }
    }
    e1.join(dist.where(col("d") < maxHops), col("src") === col("node"))
      .select((col("d") + 1L).cast("int").as("step"), col("src"),
        col("dst"), col("prop"))
      .where(col("step") <= maxHops)
  }

  /** Connected components over one edge type (undirected) — see
    * [[GraphAlgo.connectedComponents]] for the algorithm. Returns
    * (node, component) for every node incident to an edge of the
    * type; component id = smallest member node id. */
  def connectedComponents(etype: String, maxIter: Int = 20): DataFrame =
    GraphAlgo.connectedComponents(
      edges.where(col("etype") === etype).select(col("src"), col("dst")),
      maxIter)

  /** GetStats (reader.go:617): one row per node/edge-type metric. */
  def stats(): DataFrame = {
    val n = nodes.groupBy(col("ntype")).agg(count(lit(1)).as("n"))
      .select(concat(lit("nodes_"), col("ntype")).as("metric"), col("n"))
    val e = edges.groupBy(col("etype")).agg(count(lit(1)).as("n"))
      .select(concat(lit("edges_"), col("etype")).as("metric"), col("n"))
    n.unionAll(e).orderBy(col("metric"))
  }

  /** ExportGraph (reader.go:707): the full typed dump, stably ordered. */
  def export(): DataFrame =
    nodes.orderBy(col("ntype"), col("id"))

  /** Filtered export (export.go's per-type export options): only the
    * requested node types — on the persisted layout this prunes to
    * the matching ntype partitions instead of scanning everything. */
  def export(ntypes: Seq[String]): DataFrame =
    nodes.where(col("ntype").isin(ntypes: _*))
      .orderBy(col("ntype"), col("id"))

  // --- writer surface (pure transformations) ------------------------
  // mie's writer (writer.go:35 StoreFact … :230 InvalidateFact, :264
  // AddRelationship, :365 UpdateStatus) mutates CozoDB in place; the
  // Spark-native shape is snapshot semantics: every write returns a new
  // MemoryGraph over an amended plan. At scale the amendments are
  // appended partitions, compacted on write-out.

  private def one(row: (String, String, String, String, Double)): DataFrame =
    nodes.sparkSession.range(1).select(
      lit(row._1).as("id"), lit(row._2).as("ntype"), lit(row._3).as("content"),
      lit(row._4).as("attr"), lit(row._5).as("score"))

  /** StoreX (writer.go:35-229): append a typed node. */
  def store(id: String, ntype: String, content: String, attr: String,
            score: Double): MemoryGraph =
    new MemoryGraph(nodes.unionAll(one((id, ntype, content, attr, score))), edges)

  /** AddRelationship (writer.go:264): append an edge. */
  def addEdge(etype: String, src: String, dst: String, prop: String): MemoryGraph =
    new MemoryGraph(nodes, edges.unionAll(
      nodes.sparkSession.range(1).select(lit(etype).as("etype"),
        lit(src).as("src"), lit(dst).as("dst"), lit(prop).as("prop"))))

  /** InvalidateFact (writer.go:230): the new fact invalidates the old
    * one. Validity is derived, not stored: a fact is invalid iff an
    * `invalidates` edge points at it (see [[validNodes]]) — no
    * in-place `valid` flip needed. */
  def invalidate(oldId: String, newId: String, reason: String): MemoryGraph =
    addEdge("invalidates", newId, oldId, reason)

  /** UpdateStatus/UpdateDescription (writer.go:313,365): rewrite one
    * node's attr (status/kind/category slot). */
  def updateAttr(id: String, newAttr: String): MemoryGraph =
    new MemoryGraph(
      nodes.withColumn("attr",
        when(col("id") === id, lit(newAttr)).otherwise(col("attr"))),
      edges)

  /** Anti join against the invalidated set — the `valid = true`
    * condition the reference folds into every listing query
    * (reader.go:240-259). Broadcast-able edge side, no node shuffle. */
  private def notInvalidated(df: DataFrame): DataFrame = {
    val invalidated = edges.where(col("etype") === "invalidates")
      .select(col("dst"))
    df.join(invalidated, col("id") === col("dst"), "left_anti")
  }

  /** Nodes of a type with no incoming `invalidates` edge — the
    * `valid = true` view (anti join, no shuffle of the edge side
    * needed when broadcast). */
  def validNodes(ntype: String): DataFrame =
    notInvalidated(nodes.where(col("ntype") === ntype))

  /** The `mie://context/recent` preflight resource
    * (cmd/mie/mcp.go:988 buildRecentContext): latest VALID facts
    * (limit 5), latest decisions (3) and latest entities (5), each
    * section ranked newest-first — the reference sorts on created_at;
    * here creation order is the id's numeric suffix (ids are minted
    * sequentially in this mapping), ties to the smaller id. Three
    * ntype-pruned orderBy+limit heads (TakeOrderedAndProject each —
    * bounded heaps, never a global sort) unioned into one frame; the
    * markdown rendering around it is presentation, not query surface. */
  def recentContext(nFacts: Int = 5, nDecisions: Int = 3,
                    nEntities: Int = 5): DataFrame = {
    def section(ntype: String, k: Int, validOnly: Boolean): DataFrame = {
      val base0 = nodes.where(col("ntype") === ntype)
      val base = if (validOnly) notInvalidated(base0) else base0
      val num = regexp_extract(col("id"), "([0-9]+)$", 1).cast("long")
      // rank only the k-row head; partitioning by the constant ntype
      // keeps the window off the empty-partition-spec path (the
      // `list` trick above)
      val w = Window.partitionBy(col("ntype"))
        .orderBy(num.desc, col("id"))
      base.orderBy(num.desc, col("id")).limit(k)
        .withColumn("pos", row_number().over(w))
        .select(lit(ntype).as("section"), col("pos"), col("id"),
          col("content"), col("attr"), col("score"))
    }
    section("fact", nFacts, validOnly = true)
      .unionAll(section("decision", nDecisions, validOnly = false))
      .unionAll(section("entity", nEntities, validOnly = false))
  }
}

object MemoryGraph {

  /** Bump when [[fromTables]]' node/edge derivation changes — the
    * on-disk graph cache is keyed by this, so stale layouts from an
    * older code version can never be read back. */
  private val CacheVersion = "v2"

  /** The parquet tables [[fromTables]] derives the graph from. */
  private val SourceTables = Seq("customer", "supplier", "part", "orders",
    "lineitem", "documents", "events")

  /** Content fingerprint of the graph's source inputs: the absolute
    * dir plus every source parquet file's relative path, size and
    * mtime. Keying the on-disk cache by this (not just the dir name)
    * means regenerated source data invalidates the cache instead of
    * silently serving a stale graph, and distinct dirs can never
    * collide however their names mangle. */
  private def fingerprint(dir: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val parts = SourceTables.flatMap { t =>
      val p = Paths.get(dir, s"$t.parquet")
      if (!Files.exists(p)) Seq(s"$t:absent")
      else {
        val walk = Files.walk(p)
        try walk.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => s"${p.relativize(f)}:${Files.size(f)}:${
            Files.getLastModifiedTime(f).toMillis}")
          .toList.sorted
        finally walk.close()
      }
    }
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update((Paths.get(dir).toAbsolutePath.normalize.toString + "\n" +
      parts.mkString("\n")).getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  // weak keys: a stopped, dereferenced session's entries vanish with
  // it — identity hashes could be reused by a new session and hand
  // back DataFrames bound to the dead one
  private val persistedGraphs = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, MemoryGraph]]()

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toList.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** The graph materialized ONCE per (session, sf dir) as parquet
    * partitioned by ntype/etype, then read back as pruned scans. This
    * is the reference's storage layout re-expressed for Spark
    * (reader.go:309's per-type tables with id indexes): a point lookup
    * or single-etype traversal touches one partition directory instead
    * of re-unioning 9 table scans per query. At cluster scale this is
    * the bucketed/partitioned table the graph would live in anyway.
    *
    * Cross-process safe: the layout is written to a temp dir and
    * atomically renamed into place, so concurrent JVMs (sbt test +
    * Bench) either win the rename or read the winner's complete
    * cache — never a half-written one. */
  def persisted(s: SparkSession, dir: String): MemoryGraph = {
    val perSession = persistedGraphs.synchronized {
      var m = persistedGraphs.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, MemoryGraph]
        persistedGraphs.put(s, m)
      }
      m
    }
    perSession.getOrElseUpdate(dir, {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val basePath = Paths.get(
        sys.props("user.dir"), "target", "graph-cache", CacheVersion,
        dir.replaceAll("[^A-Za-z0-9.]", "_") + "-" + fingerprint(dir))
      val base = basePath.toString
      def ready(sub: String) =
        Files.exists(Paths.get(base, sub, "_SUCCESS"))
      if (!ready("nodes") || !ready("edges")) {
        val tmp = base + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8)
        val g = fromTables(s, dir)
        g.nodes.write.mode("overwrite").partitionBy("ntype")
          .parquet(s"$tmp/nodes")
        g.edges.write.mode("overwrite").partitionBy("etype")
          .parquet(s"$tmp/edges")
        try Files.move(Paths.get(tmp), basePath, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException =>
          // lost the creation race: the winner's rename was atomic, so
          // the existing cache is complete — drop ours and read theirs
          deleteRecursively(Paths.get(tmp))
        }
      }
      new MemoryGraph(
        s.read.parquet(s"$base/nodes")
          .select(col("id"), col("ntype"), col("content"), col("attr"),
            col("score")),
        s.read.parquet(s"$base/edges")
          .select(col("etype"), col("src"), col("dst"), col("prop")))
    })
  }

  /** Undirected simple-graph edge view (a < b, loops dropped,
    * parallel/reverse edges collapsed) of the persisted graph —
    * persisted alongside the graph layout the way the dedup corpus
    * keeps its band index: a graph store maintains this view as an
    * index, so the whole-graph analytics family (triangle count,
    * k-core, node similarity) reads it instead of re-deriving the
    * distinct per query. Keyed on the same source fingerprint as the
    * graph cache — a regenerated corpus never serves a stale view. */
  def undirectedView(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graft.util.DiskCache.cached(s, "graph-und", CacheVersion,
      Seq(dir), "und", Seq("und")) { tmp =>
      graft.graph.GraphAlgo.undirectedSimple(persisted(s, dir).edges)
        .write.mode("overwrite").parquet(s"$tmp/und")
    } { base => s.read.parquet(s"$base/und") }

  /** Per-etype connected-component map (node, component) of the
    * persisted graph, persisted alongside the graph layout the way
    * the undirected view is (DiskCache, corpus-fingerprint keyed):
    * [[MemoryGraph.walk]] prunes its stride relation to the start's
    * component through it — a multi-hop traversal can never leave its
    * weakly-connected component, so the stride self-composition runs
    * over one component's edges instead of the whole edge type (the
    * last super-linear term in the graph family; SURVEY §6 backlog). */
  def componentView(s: SparkSession, dir: String,
                    etype: String): org.apache.spark.sql.DataFrame =
    graft.util.DiskCache.cached(s, "graph-cc", CacheVersion,
      Seq(dir), s"cc-$etype", Seq("cc")) { tmp =>
      graft.graph.GraphAlgo.connectedComponents(
        persisted(s, dir).edges.where(col("etype") === etype)
          .select(col("src"), col("dst")))
        .write.mode("overwrite").parquet(s"$tmp/cc")
    } { base => s.read.parquet(s"$base/cc") }

  /** Bind the memory graph to the driver-generated tables:
    * fact≈documents, decision≈orders, entity≈customer∪supplier∪part,
    * event≈events, topic≈distinct mktsegment; edges from the FKs plus
    * two deterministic modular links (fact_entity, event_decision) and
    * the lag-derived `invalidates` chain (successive events of the
    * same (user, type) — newest invalidates previous, like mie's fact
    * revisions, schema.go:104 mie_invalidates). */
  def fromTables(s: SparkSession, dir: String): MemoryGraph = {
    def str(c: Column) = c.cast("string")
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val part = Tables.part(s, dir)
    val ord = Tables.orders(s, dir)
    val doc = Tables.documents(s, dir)
    val ev = Tables.events(s, dir)

    val nodes =
      doc.select(concat(lit("fact:"), str(col("doc_id"))).as("id"),
          lit("fact").as("ntype"), col("text").as("content"),
          col("lang").as("attr"), col("n_chars").cast("double").as("score"))
      .unionAll(ord.select(concat(lit("dec:"), str(col("o_orderkey"))).as("id"),
          lit("decision").as("ntype"), col("o_orderpriority").as("content"),
          col("o_orderstatus").as("attr"), col("o_totalprice").as("score")))
      .unionAll(cust.select(concat(lit("ent:c:"), str(col("c_custkey"))).as("id"),
          lit("entity").as("ntype"), col("c_name").as("content"),
          lit("customer").as("attr"), col("c_acctbal").as("score")))
      .unionAll(supp.select(concat(lit("ent:s:"), str(col("s_suppkey"))).as("id"),
          lit("entity").as("ntype"), col("s_name").as("content"),
          lit("supplier").as("attr"), col("s_acctbal").as("score")))
      .unionAll(part.select(concat(lit("ent:p:"), str(col("p_partkey"))).as("id"),
          lit("entity").as("ntype"), col("p_name").as("content"),
          lit("part").as("attr"), col("p_retailprice").as("score")))
      .unionAll(ev.select(concat(lit("evt:"), str(col("event_id"))).as("id"),
          lit("event").as("ntype"), col("event_type").as("content"),
          date_format(col("ts"), "yyyy-MM-dd").as("attr"),
          col("value").as("score")))
      .unionAll(cust.select(col("c_mktsegment")).distinct()
        .select(concat(lit("topic:"), col("c_mktsegment")).as("id"),
          lit("topic").as("ntype"), col("c_mktsegment").as("content"),
          lit("segment").as("attr"), lit(0.0).as("score")))

    val nCust = broadcast(cust.agg(count(lit(1)).as("n_cust")))
    val nOrd = broadcast(ord.agg(count(lit(1)).as("n_ord")))
    val lagW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))

    val edges =
      ord.select(lit("decision_entity").as("etype"),
          concat(lit("dec:"), str(col("o_orderkey"))).as("src"),
          concat(lit("ent:c:"), str(col("o_custkey"))).as("dst"),
          lit("customer").as("prop"))
      .unionAll(Tables.lineitem(s, dir)
        .select(lit("decision_entity").as("etype"),
          concat(lit("dec:"), str(col("l_orderkey"))).as("src"),
          concat(lit("ent:p:"), str(col("l_partkey"))).as("dst"),
          lit("part").as("prop")))
      .unionAll(cust.select(lit("entity_topic").as("etype"),
          concat(lit("ent:c:"), str(col("c_custkey"))).as("src"),
          concat(lit("topic:"), col("c_mktsegment")).as("dst"),
          lit("").as("prop")))
      .unionAll(doc.crossJoin(nCust)
        .select(lit("fact_entity").as("etype"),
          concat(lit("fact:"), str(col("doc_id"))).as("src"),
          concat(lit("ent:c:"), str(col("doc_id") % col("n_cust"))).as("dst"),
          lit("").as("prop")))
      .unionAll(ev.crossJoin(nOrd)
        .select(lit("event_decision").as("etype"),
          concat(lit("evt:"), str(col("event_id"))).as("src"),
          concat(lit("dec:"), str(col("event_id") % col("n_ord"))).as("dst"),
          lit("").as("prop")))
      .unionAll(ev
        .withColumn("prev_id", lag(col("event_id"), 1).over(lagW))
        .where(col("prev_id").isNotNull)
        .select(lit("invalidates").as("etype"),
          concat(lit("evt:"), str(col("event_id"))).as("src"),
          concat(lit("evt:"), str(col("prev_id"))).as("dst"),
          col("event_type").as("prop")))

    new MemoryGraph(nodes, edges)
  }

  /** Oracle-side mirrors of the node/edge construction, for embedding
    * in GraphSuite oracle SQL (DuckDB dialect). Kept adjacent to
    * fromTables so the two stay in lockstep. */
  object Sql {
    val nodes: String = """
      SELECT 'fact:' || CAST(doc_id AS VARCHAR) AS id, 'fact' AS ntype,
             text AS content, lang AS attr, CAST(n_chars AS DOUBLE) AS score
      FROM documents
      UNION ALL
      SELECT 'dec:' || CAST(o_orderkey AS VARCHAR), 'decision',
             o_orderpriority, o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT 'ent:c:' || CAST(c_custkey AS VARCHAR), 'entity',
             c_name, 'customer', c_acctbal FROM customer
      UNION ALL
      SELECT 'ent:s:' || CAST(s_suppkey AS VARCHAR), 'entity',
             s_name, 'supplier', s_acctbal FROM supplier
      UNION ALL
      SELECT 'ent:p:' || CAST(p_partkey AS VARCHAR), 'entity',
             p_name, 'part', p_retailprice FROM part
      UNION ALL
      SELECT 'evt:' || CAST(event_id AS VARCHAR), 'event',
             event_type, strftime(ts, '%Y-%m-%d'), value FROM events
      UNION ALL
      SELECT DISTINCT 'topic:' || c_mktsegment, 'topic',
             c_mktsegment, 'segment', 0.0 FROM customer"""

    val edges: String = """
      SELECT 'decision_entity' AS etype,
             'dec:' || CAST(o_orderkey AS VARCHAR) AS src,
             'ent:c:' || CAST(o_custkey AS VARCHAR) AS dst,
             'customer' AS prop
      FROM orders
      UNION ALL
      SELECT 'decision_entity', 'dec:' || CAST(l_orderkey AS VARCHAR),
             'ent:p:' || CAST(l_partkey AS VARCHAR), 'part' FROM lineitem
      UNION ALL
      SELECT 'entity_topic', 'ent:c:' || CAST(c_custkey AS VARCHAR),
             'topic:' || c_mktsegment, '' FROM customer
      UNION ALL
      SELECT 'fact_entity', 'fact:' || CAST(doc_id AS VARCHAR),
             'ent:c:' || CAST(doc_id % (SELECT COUNT(*) FROM customer) AS VARCHAR),
             '' FROM documents
      UNION ALL
      SELECT 'event_decision', 'evt:' || CAST(event_id AS VARCHAR),
             'dec:' || CAST(event_id % (SELECT COUNT(*) FROM orders) AS VARCHAR),
             '' FROM events
      UNION ALL
      SELECT 'invalidates', 'evt:' || CAST(event_id AS VARCHAR),
             'evt:' || CAST(prev_id AS VARCHAR), event_type
      FROM (SELECT event_id, event_type,
              LAG(event_id) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS prev_id
            FROM events) t
      WHERE prev_id IS NOT NULL"""
  }
}
