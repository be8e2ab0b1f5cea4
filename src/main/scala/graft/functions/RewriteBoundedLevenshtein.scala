package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a BOUNDED edit-distance comparison
  *
  * {{{ levenshtein(a, b) <= k }}}
  *
  * (and its `<` / flipped-literal variants) into the THRESHOLD form
  * Spark ships but users rarely reach for:
  *
  * {{{ levenshtein(a, b, k) >= 0 }}}
  *
  * The two-argument expression always runs the full O(|a|·|b|) dynamic
  * program; the threshold form runs the banded O(k·min(|a|,|b|))
  * algorithm and bails out immediately on a length difference > k —
  * returning −1 whenever the true distance exceeds k, so `≥ 0` is
  * exactly the original predicate. On a merge/purge verify stage
  * (q_dedup_edit's shape: millions of candidate pairs, k ≪ length)
  * the bound is the difference between k·n and n² per pair.
  *
  * Equivalence notes (the rewrite must be indistinguishable):
  *  - result: distance ≤ k ⟺ threshold-distance ≥ 0, by the threshold
  *    contract (exact distance when ≤ k, −1 otherwise);
  *  - nulls: both forms are null iff an input is null, and
  *    `null ≥ 0` is null exactly as `null ≤ k` is;
  *  - `lev < k` rewrites via threshold k−1 (ints; k ≤ 0 is left
  *    untouched — the predicate is constant-false and not worth a
  *    special case here);
  *  - only foldable non-negative INTEGER literals rewrite — a column
  *    bound would change the threshold per row, which the threshold
  *    form cannot express.
  *
  * Installed exactly like [[RewriteDotProducts]]: per-session via
  * `spark.experimental.extraOptimizations`
  * ([[VectorFunctions.register]]) or globally via `GraftExtensions`.
  */
object RewriteBoundedLevenshtein extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  private object IntBound {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(k: Int, IntegerType) => Some(k)
      case _                            => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), IntBound(k)) if k >= 0 =>
      bounded(a, b, k)
    case GreaterThanOrEqual(IntBound(k), Levenshtein(a, b, None)) if k >= 0 =>
      bounded(a, b, k)
    case LessThan(Levenshtein(a, b, None), IntBound(k)) if k >= 1 =>
      bounded(a, b, k - 1)
    case GreaterThan(IntBound(k), Levenshtein(a, b, None)) if k >= 1 =>
      bounded(a, b, k - 1)
  }
}
