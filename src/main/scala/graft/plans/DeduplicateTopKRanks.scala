package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Self-join support for [[TopKPerKeyPlan]].
  *
  * Spark's DeduplicateRelations regenerates conflicting output ids
  * only for its own attribute-producing nodes (relations, generators,
  * ...); a self-join of two TopKPerKey subtrees therefore carries the
  * SAME rank exprId on both sides and fails analysis. This resolution
  * rule (injected by [[GraftExtensions]]) regenerates the rank
  * attribute on the right side of such a join — rewriting the right
  * subtree's ancestors through transformUpWithNewOutput, the same
  * mechanism DeduplicateRelations uses — so TopKPerKey outputs
  * self-join like any builtin. References to the rank in the join
  * condition resolve to the left side, matching Spark's own
  * self-join ambiguity convention. */
object DeduplicateTopKRanks extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, _, _) =>
      val leftIds = left.collect {
        case t: TopKPerKeyPlan => t.rankAttr.exprId
      }.toSet
      val conflicts = right.collect {
        case t: TopKPerKeyPlan if leftIds.contains(t.rankAttr.exprId) =>
          t.rankAttr.exprId
      }.toSet
      if (conflicts.isEmpty) j
      else {
        val newRight = right.transformUpWithNewOutput {
          case t: TopKPerKeyPlan if conflicts.contains(t.rankAttr.exprId) =>
            val na = t.rankAttr.newInstance()
            (t.copy(rankAttr = na), Seq(t.rankAttr -> na))
        }
        j.copy(right = newRight)
      }
  }
}
