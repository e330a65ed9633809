package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the classic per-group top-k idiom
  *
  *   SELECT <cols-not-including-rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) AS rn
  *     FROM t) WHERE rn <= k
  *
  * into [[TopKPerKeyPlan]] — bounded heap per key instead of a full
  * sort of every partition group. Fires only when it is provably safe:
  * exactly one window expression (row_number), non-empty partition and
  * order specs, a `rn <= k` / `rn < k` / `rn = 1` predicate, and the
  * rank column dropped by the enclosing projection (the operator does
  * not materialize rank numbers).
  *
  * Registered via graft.GraftExtensions (injectOptimizerRule) — the
  * Rule tier of the custom-operator stack: users keep writing the
  * window idiom and transparently get the one-pass operator. */
object RankToTopKRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window))
        if rewriteInfo(cond, w).exists { case (rn, _) =>
          !projList.exists(_.exists(_.semanticEquals(rn))) &&
            projList.forall(_.references.subsetOf(w.child.outputSet))
        } =>
      val Some((_, k)) = rewriteInfo(cond, w)
      val Seq(Alias(we: WindowExpression, _)) = w.windowExpressions
      val spec = we.windowSpec
      p.copy(child = TopKPerKeyPlan(spec.partitionSpec, spec.orderSpec, k, w.child))
  }

  /** If this Filter-over-Window is the top-k idiom, return the rank
    * attribute and k. */
  private def rewriteInfo(cond: Expression, w: Window): Option[(Attribute, Int)] = {
    val rankAttr = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _)), _))
          if part.nonEmpty && order.nonEmpty =>
        Some(a.toAttribute)
      case _ => None
    }
    rankAttr.flatMap { rn =>
      cond match {
        case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
            if a.semanticEquals(rn) && k >= 1 => Some((rn, k))
        case LessThan(a: Attribute, Literal(k: Int, _))
            if a.semanticEquals(rn) && k >= 2 => Some((rn, k - 1))
        case EqualTo(a: Attribute, Literal(1, _))
            if a.semanticEquals(rn) => Some((rn, 1))
        case _ => None
      }
    }
  }
}
