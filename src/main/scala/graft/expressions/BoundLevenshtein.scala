package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `levenshtein(a, b) <= k` → `levenshtein(a, b, k)
  * >= 0` (and the `<` / literal-on-the-left variants).
  *
  * The unbounded edit distance fills the full O(|a|·|b|) DP before
  * the comparison throws the value away; the 3-arg bounded form
  * abandons the DP the moment the running minimum exceeds `k` and
  * returns −1 — O(k·min(|a|,|b|)) for misses, which is the common
  * case in a fuzzy-join verify (FuzzyJoin spells this by hand; the
  * rule gives the same plan to anyone writing the natural
  * predicate).
  *
  * Exactness: bounded-lev returns the true distance iff it is ≤ k,
  * else −1, so `lev(a,b) <= k  ⟺  lev(a,b,k) >= 0` for any k ≥ 0;
  * nulls propagate identically (null comparison → null in both
  * spellings). Only unbounded calls with a FOLDABLE non-negative
  * int literal bound rewrite; everything else is left alone.
  *
  * Register with `spark.sql.extensions=graft.expressions
  * .GraftExtensions` (injectOptimizerRule) or
  * `GraftFunctions.register(spark)` (experimental
  * extraOptimizations).
  */
object BoundLevenshtein extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(new Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None),
        Literal(k: Int, IntegerType)) if k >= 0 =>
        bounded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
        Levenshtein(l, r, None)) if k >= 0 =>
        bounded(l, r, k)
      case LessThan(Levenshtein(l, r, None),
        Literal(k: Int, IntegerType)) if k >= 1 =>
        bounded(l, r, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType),
        Levenshtein(l, r, None)) if k >= 1 =>
        bounded(l, r, k - 1)
    }
}
