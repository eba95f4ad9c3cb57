package graft

import graft.functions.{GeoFunctions, GreatCircleDistance}
import org.apache.spark.sql.functions._

/** The native great_circle_km Expression: registration, SQL surface, codegen
  * path, and equivalence with the column composition.
  */
class GeoExprSpec extends SparkSuite {

  private def registered = {
    spark.sessionState.functionRegistry.registerFunction(
      GreatCircleDistance.identifier, GreatCircleDistance.info, GreatCircleDistance.builder)
    spark
  }

  test("SQL-registered expression matches the column composition and goldens") {
    val s = registered
    import s.implicits._
    val df = Seq(
      (41.3706, -73.922, 41.2911, -73.6678), // zips 10524 ↔ 10526
      (41.3706, -73.922, 40.7506, -73.9971), // 10524 ↔ 10001
      (12.34, 56.78, 12.34, 56.78), // identical point
    ).toDF("la1", "lo1", "la2", "lo2")
    val got = df.select(
      expr("great_circle_km(la1, lo1, la2, lo2)").as("native"),
      GeoFunctions.greatCircleKm($"la1", $"lo1", $"la2", $"lo2").as("composed"),
    ).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
    assert(math.abs(got(0).getDouble(0) - 22.992291345625407) < 1e-9)
    assert(got(2).getDouble(0) == 0.0)
  }

  test("ZeroDistanceFold rewrites same-point distance to a literal at plan time") {
    val s = registered
    import s.implicits._
    s.sessionState.experimentalMethods.extraOptimizations =
      s.sessionState.experimentalMethods.extraOptimizations :+ graft.functions.ZeroDistanceFold
    try {
      val df = Seq((Some(1.5), Some(2.5)), (None, Some(2.5)))
        .toDF("la", "lo")
        .selectExpr("great_circle_km(la, lo, la, lo) AS d")
      // folded: the optimized plan carries no distance expression at all
      val optimized = df.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[GreatCircleDistance])))
      val got = df.collect()
      assert(got(0).getDouble(0) == 0.0)
      assert(got(1).isNullAt(0)) // null coordinate still propagates
      // NaN coordinate still propagates as NaN (the unfolded expression's
      // == same-point guard never fires on NaN, so trig returns NaN)
      val nan = Seq((Double.NaN, 2.5)).toDF("la", "lo")
        .selectExpr("great_circle_km(la, lo, la, lo) AS d")
      assert(!nan.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[GreatCircleDistance])))
      assert(nan.collect().head.getDouble(0).isNaN)
      val unfoldedNan = Seq((Double.NaN, 2.5)).toDF("la", "lo")
        .select(GeoFunctions.greatCircleKm($"la", $"lo", $"la", $"lo").as("d"))
      assert(unfoldedNan.collect().head.getDouble(0).isNaN)
      // distinct points stay unfolded (non-constant inputs, different exprs)
      val moving = s.range(3)
        .selectExpr("great_circle_km(CAST(id AS DOUBLE), 0.0D, CAST(id + 1 AS DOUBLE), 0.0D) AS d")
      assert(moving.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[GreatCircleDistance])))
    } finally {
      s.sessionState.experimentalMethods.extraOptimizations =
        s.sessionState.experimentalMethods.extraOptimizations
          .filterNot(_ == graft.functions.ZeroDistanceFold)
    }
  }

  test("null inputs yield null; codegen path executes over a real scan") {
    val s = registered
    import s.implicits._
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
      .selectExpr("great_circle_km(a, b, a, a) AS d")
    assert(df.collect().head.isNullAt(0))
    // run through a parquet scan + filter so whole-stage codegen compiles it
    val e = Tables(spark, sf("sf0.001"), "events").limit(100)
      .selectExpr("great_circle_km(CAST(user_id AS DOUBLE), 0.0D, 0.0D, 0.0D) AS d")
    assert(e.filter("d >= 0").count() == 100)
  }
}
