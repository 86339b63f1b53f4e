package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayIntersect, ArrayUnion, Cast, EqualTo, Expression, If, IsNull, Literal, Or, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rule: rewrite the textbook Jaccard expression
  * `size(array_intersect(a, b)) / size(array_union(a, b))` into the fused
  * [[JaccardSimilarity]] kernel — one hash-set pass per side, no
  * intermediate intersect/union arrays, stays in whole-stage codegen.
  *
  * This is the engine's `Rule[LogicalPlan]` surface (SURVEY §4 preference
  * order: compose > Expression > Rule/Strategy): analysts writing the
  * naive form in `spark.sql` get the kernel automatically; the Scala API
  * ([[graft.functions.Text.jaccardFused]]) reaches it directly. Injected
  * by [[GraftExtensions]] at session build or via
  * `spark.experimental.extraOptimizations` by
  * [[graft.core.Sessions.tune]] on existing sessions.
  *
  * Semantics are preserved exactly: array_intersect/array_union are
  * DISTINCT (set) operators, the kernel treats inputs as sets; both yield
  * null on null input; and the both-empty case — where the naive form is
  * 0/0 → null but the kernel returns 0.0 — is guarded with an `If` on the
  * raw array sizes (O(1), no intersect/union computed). The rule fires
  * ONLY when equivalence is provable:
  *  - `array<bigint>` with containsNull = FALSE on both inputs (the
  *    kernel reads elements primitively; a null element would read as 0);
  *  - ANSI mode off (ANSI 0/0 raises DIVIDE_BY_ZERO — the rewrite must
  *    not turn an error into a value);
  *  - both sides reference the SAME two arrays (either order: Jaccard is
  *    symmetric).
  * Null-INPUT semantics depend on `spark.sql.legacy.sizeOfNull` (default
  * true): legacy `size(null) = −1` makes the naive form (−1)/(−1) = 1.0
  * for a null input, non-legacy gives null/null → null — the rewrite
  * emits the matching guard for whichever mode is active.
  */
object FuseJaccard extends Rule[LogicalPlan] {

  /** Strip casts inserted by type coercion around the integer sizes. */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, _, _, _) => stripCast(inner)
    case other => other
  }

  private def isNonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  private def samePair(a1: Expression, b1: Expression,
      a2: Expression, b2: Expression): Boolean =
    (a1.semanticEquals(a2) && b1.semanticEquals(b2)) ||
      (a1.semanticEquals(b2) && b1.semanticEquals(a2))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.ansiEnabled) return plan
    val legacySize =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.LEGACY_SIZE_OF_NULL)
    plan.transformAllExpressions {
      case d @ org.apache.spark.sql.catalyst.expressions.Divide(num, den, _) =>
        (stripCast(num), stripCast(den)) match {
          case (Size(ArrayIntersect(a1, b1), _), Size(ArrayUnion(a2, b2), _))
              if isNonNullLongArray(a1) && isNonNullLongArray(b1) &&
                samePair(a1, b1, a2, b2) =>
            // both-empty: naive 0/0 → null, kernel 0.0 — guard on O(1) sizes
            val bothEmpty = If(
              And(EqualTo(Size(a1, legacySizeOfNull = false), Literal(0)),
                EqualTo(Size(b1, legacySizeOfNull = false), Literal(0))),
              Literal(null, DoubleType),
              JaccardSimilarity(a1, b1))
            if (legacySize)
              // legacy size(null) = −1 ⇒ naive gives (−1)/(−1) = 1.0 when
              // EITHER input is null (intersect/union propagate the null)
              If(Or(IsNull(a1), IsNull(b1)), Literal(1.0d), bothEmpty)
            else bothEmpty // null/null → null; the kernel null-propagates
          case _ => d
        }
    }
  }
}
