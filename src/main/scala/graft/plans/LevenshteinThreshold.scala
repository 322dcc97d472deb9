package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded `levenshtein(a, b) ≤ k` predicates
  * into the banded 3-arg form, whose DP early-exits once the distance
  * provably exceeds k — O(k·min(len)) instead of O(len²) per pair, the
  * same asymptotic cut DuckDB's join predicate gets natively (and the
  * r9-verdict fix hand-applied in [[graft.relational.FuzzyJoin]]; this
  * rule applies it to any user query, SQL or DataFrame, automatically).
  *
  * The 3-arg form returns −1 when the distance exceeds the threshold, so
  * the comparison must flip: `lev(a,b) ≤ k  ⟺  lev(a,b,k) ≥ 0` — true
  * for dist ≤ k (the real distance is returned, ≥ 0), false for
  * dist > k (−1), null for null (both sides null-intolerant). A pure
  * expression equivalence, so the rewrite is safe in any context
  * (negations, projections, join conditions), not just filters.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(l, r, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => bounded(l, r, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => bounded(l, r, k - 1)
    }
}
