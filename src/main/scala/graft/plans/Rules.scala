package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayIntersect, ArrayUnion, Cast, EqualTo, Expression, If, Literal, Size}
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
  * raw array sizes (O(1), no intersect/union computed). Fires only on
  * `array<bigint>` inputs — the kernel's type — and only when both sides
  * reference the SAME two arrays (either order: Jaccard is symmetric).
  */
object FuseJaccard extends Rule[LogicalPlan] {

  /** Strip casts inserted by type coercion around the integer sizes. */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, _, _, _) => stripCast(inner)
    case other => other
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def samePair(a1: Expression, b1: Expression,
      a2: Expression, b2: Expression): Boolean =
    (a1.semanticEquals(a2) && b1.semanticEquals(b2)) ||
      (a1.semanticEquals(b2) && b1.semanticEquals(a2))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ org.apache.spark.sql.catalyst.expressions.Divide(num, den, _) =>
        (stripCast(num), stripCast(den)) match {
          case (Size(ArrayIntersect(a1, b1), _), Size(ArrayUnion(a2, b2), _))
              if isLongArray(a1) && isLongArray(b1) && samePair(a1, b1, a2, b2) =>
            If(
              And(EqualTo(Size(a1, legacySizeOfNull = false), Literal(0)),
                EqualTo(Size(b1, legacySizeOfNull = false), Literal(0))),
              Literal(null, DoubleType),
              JaccardSimilarity(a1, b1))
          case _ => d
        }
    }
}
