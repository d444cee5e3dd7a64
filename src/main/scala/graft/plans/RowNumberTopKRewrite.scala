package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `row_number().over(partitionBy k orderBy o) <= n`
  * filters collapse into [[TopKPerKeyPlan]] — per-key bounded heap
  * instead of a full per-partition sort. The rewrite is EXACT (same
  * rows, same rank values, same attribute ids), so it applies
  * silently; it fires only when the Window computes exactly one
  * row_number and the filter bounds it by a literal.
  *
  * Spark's own InferWindowGroupLimit trims rows entering the window
  * sort but still sorts each group; this removes the sort entirely.
  * Injected via GraftExtensions (no extensions -> stock window path).
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Max k we are willing to hold per key in the heap. */
  private val MaxK = 10000

  private def rankBound(cond: Expression, rk: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rk) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rk) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rk) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rk) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rk) => Some(1)
      case _ => None
    }

  private def isLoneRowNumber(exprs: Seq[NamedExpression]): Boolean =
    exprs match {
      case Seq(Alias(WindowExpression(RowNumber(), _), _)) => true
      case _ => false
    }

  private def rewrite(cond: Expression, w: Window,
                      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    if (!isLoneRowNumber(w.windowExpressions) || w.orderSpec.isEmpty) return None
    val rkAttr = w.windowExpressions.head.toAttribute
    val conjuncts = splitConjunctivePredicates(cond)
    val (bounds, rest) = conjuncts.partition(c => rankBound(c, rkAttr).isDefined)
    if (bounds.isEmpty) return None
    val k = bounds.flatMap(rankBound(_, rkAttr)).min
    if (k <= 0 || k > MaxK) return None
    val topk = TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k,
      rkAttr.asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference],
      w.child)
    val filtered =
      if (rest.isEmpty) topk
      else Filter(rest.reduce(And), topk)
    Some(wrap(filtered))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, w: Window))
        if p.projectList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, w, topk => p.copy(child = topk)).getOrElse(f)
  }
}
