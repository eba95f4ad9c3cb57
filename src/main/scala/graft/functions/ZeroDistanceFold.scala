package graft.functions

import org.apache.spark.sql.catalyst.expressions.{If, IsNaN, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule — the custom-`Rule[LogicalPlan]` tier of SURVEY §7.4:
  * `great_circle_km(a, b, a, b)` over deterministic inputs is identically
  * zero (the expression's own same-point guard, FraudDistMetric.java:69-78),
  * so fold it to a null-preserving literal at plan time. Arises naturally
  * when a lag()-based distance meets an unmoved entity or a self-join
  * compares an entity to itself — the fold removes four trig calls per row
  * from codegen'd loops.
  *
  * Null and NaN semantics are preserved exactly: a null coordinate still
  * yields null, and a NaN coordinate still yields NaN (the unfolded
  * expression's same-point guard compares with ==, so NaN falls through
  * to the trig path and propagates), matching the unfolded expression
  * value-for-value.
  */
object ZeroDistanceFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreatCircleDistance(la1, lo1, la2, lo2)
        if la1.deterministic && lo1.deterministic &&
          la1.semanticEquals(la2) && lo1.semanticEquals(lo2) =>
      If(Or(IsNull(la1), IsNull(lo1)), Literal(null, DoubleType),
        If(Or(IsNaN(la1), IsNaN(lo1)), Literal(Double.NaN), Literal(0.0)))
  }
}
