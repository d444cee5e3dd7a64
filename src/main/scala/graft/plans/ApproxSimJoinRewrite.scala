package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.Column

import graft.functions.expr.FloatDotProduct

/** OPT-IN optimizer rule (`spark.graft.approx.simjoin=true`, the same
  * flag Dedup.similarityJoin dispatches on): a cosine-threshold
  * self-join written in the naive all-pairs phrasing —
  *
  * {{{ a.join(b, cond)  where cond contains  cosine6(va, vb) >= tau }}}
  *
  * — is transparently restructured into the multi-probe sign-pattern
  * LSH candidate join + exact verify (the same physical shape as
  * Dedup.similarityJoin's approx branch): each side explodes its
  * per-band sign patterns, the probe side also claims every 1-bit
  * neighbor, candidates equi-join on (band, pattern), and the FULL
  * original join condition re-filters the candidates. The nested-loop
  * O(n²) pair scan becomes a bounded equi-join; surviving rows carry
  * exact similarities. The rewrite can only MISS pairs (recall < 1 —
  * why it is opt-in and never a default; measured in
  * ApproxSimJoinSpec), never fabricate them. One further documented
  * semantics change: the multi-probe dedup groups on the candidate
  * OUTPUT columns, so input-row multiplicity is NOT preserved —
  * duplicate rows in a base relation collapse to one output pair
  * where the exact join would emit one pair per duplicate
  * combination. Similarity joins key on ids in practice (every
  * in-repo caller joins distinct-id vector tables), so value-equal
  * input rows are already degenerate under this rewrite's contract.
  *
  * Fires only when: the join is Inner with a `>= Literal(tau > 0)`
  * conjunct whose expression contains a cross-side FloatDotProduct
  * (cosine6/cosine6Pre both reduce to this — the norms are same-side
  * dots), the two sides share no output names (the rewrite rebuilds
  * the pair join by name), and the join is not already a rewritten
  * band join (the `__graft_lsh` guard). Band geometry comes from
  * `spark.graft.simjoin.bits` / `spark.graft.simjoin.bandBits`
  * (16 / 4 — see the recall/pruning trade in Dedup.similarityJoin's
  * scaladoc).
  */
object ApproxSimJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BandIdxL = "__graft_lsh_bi_l"
  private val BandValL = "__graft_lsh_bv_l"
  private val BandIdxR = "__graft_lsh_bi_r"
  private val BandValR = "__graft_lsh_bv_r"
  private val BandValX = "__graft_lsh_bv_x"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.approx.simjoin", "false") != "true")
      plan
    else plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _)
          if !j.output.exists(_.name.startsWith("__graft_lsh")) &&
            l.output.map(_.name).toSet
              .intersect(r.output.map(_.name).toSet).isEmpty =>
        findVecs(l, r, cond)
          .map { case (va, vb) => build(l, r, va, vb, cond) }
          .getOrElse(j)
    }

  /** The cross-side dot inside a `cos >= tau` conjunct identifies the
    * two vector columns; same-side dots (the norms) don't match. */
  private def findVecs(l: LogicalPlan, r: LogicalPlan,
                       cond: Expression): Option[(Attribute, Attribute)] = {
    def crossDot(e: Expression): Option[(Attribute, Attribute)] =
      e.collectFirst {
        case FloatDotProduct(x: Attribute, y: Attribute)
            if l.outputSet.contains(x) && r.outputSet.contains(y) => (x, y)
        case FloatDotProduct(x: Attribute, y: Attribute)
            if l.outputSet.contains(y) && r.outputSet.contains(x) => (y, x)
      }
    splitConjunctivePredicates(cond).view.flatMap {
      case GreaterThanOrEqual(e, Literal(tau: Double, DoubleType))
          if tau > 0 => crossDot(e)
      case LessThanOrEqual(Literal(tau: Double, DoubleType), e)
          if tau > 0 => crossDot(e)
      case _ => None
    }.headOption
  }

  /** Rebuild the pair join as banded-LSH candidates + the original
    * condition, preserving the join's exact output attributes (the
    * parent plan references them by exprId). */
  private def build(l: LogicalPlan, r: LogicalPlan,
                    va: Attribute, vb: Attribute,
                    cond: Expression): LogicalPlan = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bits = conf.getConfString("spark.graft.simjoin.bits", "16").toInt
    val bandBits = conf.getConfString("spark.graft.simjoin.bandBits", "4").toInt
    val bands = bits / bandBits
    def bandVal(v: Column, b: Column): Column = aggregate(
      transform(sequence(lit(1), lit(bandBits)), j =>
        when(element_at(v, b * bandBits + j) >= 0f,
          pow(lit(2.0), j - 1).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    def bandArray(v: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)), b => bandVal(v, b))

    val lBanded = ColumnBridge.ofRows(spark, l).select(col("*"),
      posexplode(bandArray(ColumnBridge.column(va)))
        .as(Seq(BandIdxL, BandValL)))
    // the probe side also claims each band's 1-bit-flip neighbors: a
    // pair is a candidate iff some band differs by <= 1 sign bit
    val rProbed = ColumnBridge.ofRows(spark, r).select(col("*"),
        posexplode(bandArray(ColumnBridge.column(vb)))
          .as(Seq(BandIdxR, BandValX)))
      .withColumn(BandValR, explode(concat(
        array(col(BandValX)),
        transform(sequence(lit(0), lit(bandBits - 1)), j =>
          col(BandValX).bitwiseXOR(pow(lit(2.0), j).cast("long"))))))
      .drop(BandValX)

    val cand = lBanded.join(rProbed,
        col(BandIdxL) === col(BandIdxR) && col(BandValL) === col(BandValR))
      .drop(BandIdxL, BandValL, BandIdxR, BandValR)
    // dedup multi-probe hits as an explicit Aggregate: the batch that
    // lowers Deduplicate (ReplaceDeduplicateWithAggregate) has already
    // run by the time this rule fires
    val candPlan = ColumnBridge.logicalPlan(cand)
    val dedup = Aggregate(candPlan.output, candPlan.output, candPlan)
    val out = ColumnBridge.ofRows(spark, dedup)
      .where(ColumnBridge.column(cond))
      .select((l.output ++ r.output).map(ColumnBridge.column): _*)
    ColumnBridge.logicalPlan(out)
  }
}
