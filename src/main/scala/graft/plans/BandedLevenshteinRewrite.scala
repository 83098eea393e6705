package graft.plans

import graft.functions.Vectors.BandedLevenshtein
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: thresholded edit-distance predicates drop to the
  * banded kernel.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(n*m) DP and then throws
  * most of it away — the predicate only needs to know whether the
  * distance stays within k. [[BandedLevenshtein]] computes cells within
  * k of the diagonal only (O(n*k)) and clamps everything farther to k+1,
  * so for any literal threshold
  *
  *   banded(a, b, k) <= k   <=>   levenshtein(a, b) <= k      (exactly)
  *   banded(a, b, k-1) < k  <=>   levenshtein(a, b) < k       (exactly)
  *
  * — the rewrite is semantics-preserving row for row, nulls included
  * (both are null-intolerant binary expressions). This is the rewrite a
  * caller of the reference's BLAST path gets implicitly from its word
  * heuristics; here it is a Catalyst rule, so the naive spelling in ANY
  * query (SQL or DataFrame, filter or join condition) gets the banded
  * plan without the caller knowing the kernel exists.
  *
  * Guarded to literal integer thresholds in [0, MaxBand]; ranking uses
  * (no comparison, or comparisons against columns) are left untouched.
  */
object BandedLevenshteinRewrite extends Rule[LogicalPlan] {

  /** Band cap: beyond this the banded kernel's advantage fades and the
    * k+1 clamp's working arrays stop being "small" — leave the built-in.
    */
  val MaxBand = 1024

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    BandedLevenshtein(a, b, k)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), l @ Literal(k: Int, IntegerType))
          if k >= 0 && k <= MaxBand =>
        LessThanOrEqual(banded(a, b, k), l)
      case LessThan(Levenshtein(a, b, None), l @ Literal(k: Int, IntegerType))
          if k >= 1 && k <= MaxBand =>
        LessThan(banded(a, b, k - 1), l)
      case GreaterThanOrEqual(l @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 && k <= MaxBand =>
        GreaterThanOrEqual(l, banded(a, b, k))
      case GreaterThan(l @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 && k <= MaxBand =>
        GreaterThan(l, banded(a, b, k - 1))
    }
}
