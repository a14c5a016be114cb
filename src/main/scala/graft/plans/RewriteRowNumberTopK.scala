package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: rewrites the ubiquitous
  * `filter(row_number().over(partitionBy… orderBy…) <= k)` dedup/top-k idiom
  * into the bounded-heap [[TopKPerGroupPlan]] operator — turning a full
  * per-partition sort into O(n log k) with O(groups·k) state. The reference's
  * W1/W2 dedups and every "latest row per key" load in the warehouse hit this
  * pattern.
  *
  * An EMPTY partition spec (global `row_number` filter) also rewrites — and
  * is the biggest win: the window form drags every row into one partition,
  * while [[TopKPerGroupExec]]'s global path keeps k-row heaps per input
  * partition and merges ≤ k·numPartitions survivors in one final task.
  *
  * Opt-in via GraftExtensions / experimental.extraOptimizations (ties under a
  * non-total ordering are resolved arbitrarily by BOTH formulations, but not
  * necessarily identically — exactly like disk-order-dependent row_number
  * itself).
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  /** Integral literal as Int (row_number's range), if it fits. */
  private def litK(l: Literal): Option[Int] = l match {
    case Literal(k: Int, IntegerType) => Some(k)
    case Literal(k: Long, LongType) if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
    case Literal(k: Short, ShortType) => Some(k.toInt)
    case _ => None
  }

  /** Strip value-preserving integral upcasts the analyzer inserts for mixed
    * comparisons like `rn <= 10L` (→ `CAST(rn AS BIGINT) <= 10L`).
    */
  private def unwrapCast(e: Expression): Expression = e match {
    case c: Cast if c.child.dataType == IntegerType &&
      (c.dataType == LongType || c.dataType == IntegerType) => unwrapCast(c.child)
    case other => other
  }

  /** cond is `rn <= k`, `rn < k+1`, `rn = 1` or any reversed / long-literal /
    * cast-wrapped spelling of those, on the given attribute.
    */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = unwrapCast(e) match {
      case a: Attribute => a.semanticEquals(rn)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(a, l: Literal) if isRn(a) => litK(l)
      case GreaterThanOrEqual(l: Literal, a) if isRn(a) => litK(l)
      // filter(_ > Int.MinValue): `rn < Int.MinValue` would wrap `_ - 1` to
      // Int.MaxValue and turn an always-false filter into top-everything
      case LessThan(a, l: Literal) if isRn(a) => litK(l).filter(_ > Int.MinValue).map(_ - 1)
      case GreaterThan(l: Literal, a) if isRn(a) => litK(l).filter(_ > Int.MinValue).map(_ - 1)
      case EqualTo(a, l: Literal) if isRn(a) => litK(l).filter(_ == 1)
      case EqualTo(l: Literal, a) if isRn(a) => litK(l).filter(_ == 1)
      case _ => None
    }
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
