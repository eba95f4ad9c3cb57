package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the law-of-cosines great-circle distance
  * (FraudDistMetric.java:69-78) — the custom-Expression tier of SURVEY §7.4:
  * same semantics as the column composition in [[GeoFunctions.greatCircleKm]]
  * but a single codegen'd call instead of a 12-node expression tree, so the
  * hot streaming path evaluates one static method per row inside
  * whole-stage codegen.
  */
case class GreatCircleDistance(
    lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
  extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType
  override def prettyName: String = "great_circle_km"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoFunctions.greatCircleKmScalar(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoFunctions.greatCircleKmScalar($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object GreatCircleDistance {
  val identifier: FunctionIdentifier = FunctionIdentifier("great_circle_km")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GreatCircleDistance].getName, "great_circle_km")
  // inputs coerced to double here (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4, so coercion happens in the builder instead)
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c, d) =>
      def d2(e: Expression) =
        if (e.dataType == DoubleType) e else Cast(e, DoubleType)
      GreatCircleDistance(d2(a), d2(b), d2(c), d2(d))
    case other => throw new IllegalArgumentException(
      s"great_circle_km expects 4 arguments, got ${other.size}")
  }
}

/** Session extensions registering the engine's native functions; install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or the
  * `spark.sql.extensions=graft.functions.GraftExtensions` conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((GreatCircleDistance.identifier, GreatCircleDistance.info,
      GreatCircleDistance.builder))
    e.injectFunction((MinHashSketch.identifier, MinHashSketch.info,
      MinHashSketch.builder))
    e.injectFunction((SimHash16.identifier, SimHash16.info, SimHash16.builder))
    e.injectFunction((MinHashSig.identifier, MinHashSig.info, MinHashSig.builder))
    e.injectFunction((KmvSketch.identifier, KmvSketch.info, KmvSketch.builder))
    e.injectFunction((KmvSketch.fullIdentifier, KmvSketch.fullInfo,
      KmvSketch.fullBuilder))
    e.injectFunction((BoundedSetAgg.identifier, BoundedSetAgg.info,
      BoundedSetAgg.builder))
    e.injectFunction((SortedIntersectAtLeast.identifier,
      SortedIntersectAtLeast.info, SortedIntersectAtLeast.builder))
    e.injectFunction((TopMinPairs.identifier, TopMinPairs.info,
      TopMinPairs.builder))
    e.injectFunction((PackedDot16.identifier, PackedDot16.info,
      PackedDot16.builder))
    e.injectFunction((JaroWinklerMicros.identifier, JaroWinklerMicros.info,
      JaroWinklerMicros.builder))
    e.injectFunction((DtwBand.identifier, DtwBand.info, DtwBand.builder))
    e.injectOptimizerRule(_ => ZeroDistanceFold)
    // whole-operator tier: broadcast interval-index join replacing the
    // BNLJ plan for banded-dimension range joins (graft.plans)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
