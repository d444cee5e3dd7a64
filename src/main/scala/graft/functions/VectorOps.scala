package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd Spark builtins (`zip_with`/`aggregate`) — no UDFs, so the
  * whole computation stays inside whole-stage codegen.
  *
  * Determinism contract (SURVEY.md §4): every reduction is a strict
  * sequential double fold with 0.0 init, which is bit-identical to
  * DuckDB's `list_reduce` over the same element order. Elements are
  * cast float→double (exact) before any arithmetic.
  *
  * Re-expresses the semantics of mie's HNSW cosine search
  * (/root/reference/pkg/memory/schema.go:150 HNSW `distance: Cosine`,
  * /root/reference/pkg/memory/reader.go:38 SemanticSearch) as
  * scan-level expressions; the ANN index analogue is the LSH bucketing
  * in [[graft.operators.AnnSuite]].
  */
object VectorOps {

  /** Cast array<float> → array<double> (exact, element-wise). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold sum of an array<double> — matches DuckDB
    * list_reduce((x,y)->x+y) bit-for-bit. */
  def foldSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Builtin-composition dot (reference semantics; kept for doc +
    * non-float arrays). */
  def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  /** Codegen'd native expression — bit-identical to [[dotHof]] on
    * array<float>, ~40x faster (primitive loop in WholeStageCodegen). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expr.FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for cross-engine comparison. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Cosine from precomputed per-row norms — identical arithmetic to
    * [[cosine6]] (dot / (|a|*|b|)), but norms are computed once per
    * row instead of once per pair: the O(n²) joins only pay the dot. */
  def cosine6Pre(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Deterministic mock embedding of a text column, re-expressing
    * mie's hash-seeded mock provider
    * (/root/reference/pkg/memory/embedding.go:113
    * MockEmbeddingProvider.generateDeterministic): dimension i of the
    * vector is a pseudo-random value in [-1, 1) derived from the
    * text's poly-hash. `h` must be a *materialized* hash column
    * (poly_hash(text)) so it isn't recomputed per dimension. All
    * arithmetic is exact 64-bit (products < 1e15), so the oracle
    * mirror is bit-identical. */
  def mockEmbedding(h: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i => {
      val a = (i.cast("long") * lit(2654435761L) + lit(12345L)) % lit(1000003L)
      (((h * a) % lit(1000003L)).cast("double") / lit(1000003.0)) * 2.0 - 1.0
    })

  def mockEmbeddingSql(h: String, dim: Int): String =
    s"""list_transform(range(0, $dim), i ->
        (CAST(($h * ((i * 2654435761 + 12345) % 1000003)) % 1000003 AS DOUBLE)
         / 1000003.0) * 2.0 - 1.0)"""

  /** DuckDB fragment for the identical sequential-fold dot product. */
  def dotSql(x: String, y: String): String =
    s"""list_reduce(list_transform(range(1, len($x)+1),
        i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (p,q) -> p+q)"""

  def normSql(x: String): String = s"sqrt(${dotSql(x, x)})"

  /** DuckDB oracle fragment computing the identical sequential-fold
    * cosine between list columns `a` and `b` (64-dim float lists). */
  def cosineSql(a: String, b: String): String =
    s"""(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"""

  def cosine6Sql(a: String, b: String): String =
    s"round(${cosineSql(a, b)}, 6)"
}
