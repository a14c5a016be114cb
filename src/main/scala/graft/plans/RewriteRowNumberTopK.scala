package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrites the ubiquitous
  * `filter(row_number().over(partitionBy… orderBy…) <= k)` dedup/top-k idiom
  * into the bounded-heap [[TopKPerGroupPlan]] operator — turning a full
  * per-partition sort into O(n log k) with O(groups·k) state. The reference's
  * W1/W2 dedups and every "latest row per key" load in the warehouse hit this
  * pattern.
  *
  * Opt-in via GraftExtensions / experimental.extraOptimizations (ties under a
  * non-total ordering are resolved arbitrarily by BOTH formulations, but not
  * necessarily identically — exactly like disk-order-dependent row_number
  * itself).
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  /** cond is `rn <= k`, `rn < k+1`, or `rn = 1` on the given attribute. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  private def isRowNumberWindow(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(), WindowSpecDefinition(_, _, _)), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _)) =>
      extractK(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && order.nonEmpty =>
          val topk = TopKPerGroupPlan(part, order, k, child)
          // preserve the original rn attribute id/type so downstream
          // references (projections, filters) still resolve
          Project(child.output :+
            Alias(Cast(topk.rankAttr, IntegerType), alias.name)(exprId = alias.exprId),
            topk)
        case _ => f
      }
  }
}
