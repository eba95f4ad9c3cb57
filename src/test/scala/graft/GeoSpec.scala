package graft

import graft.functions.GeoFunctions
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** F5 distance goldens. Fixture coordinates are verbatim rows of the
  * reference's zip dimension (GeoGraudData.csv:1-2 and the 10001 row);
  * golden values hand-computed with the law-of-cosines formula of
  * FraudDistMetric.java:69-78.
  */
class GeoSpec extends SparkSuite {

  private val garrison = (41.3706, -73.922) // zip 10524
  private val goldensBridge = (41.2911, -73.6678) // zip 10526
  private val nyc = (40.7506, -73.9971) // zip 10001

  test("law-of-cosines distance matches hand-computed goldens") {
    val d1 = GeoFunctions.greatCircleKmScalar(garrison._1, garrison._2, goldensBridge._1, goldensBridge._2)
    assert(math.abs(d1 - 22.992291345625407) < 1e-9)
    val d2 = GeoFunctions.greatCircleKmScalar(garrison._1, garrison._2, nyc._1, nyc._2)
    assert(math.abs(d2 - 69.22779160336455) < 1e-9)
  }

  test("column expression agrees with the scalar twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((garrison._1, garrison._2, goldensBridge._1, goldensBridge._2))
      .toDF("la1", "lo1", "la2", "lo2")
    val got = df.select(
      GeoFunctions.greatCircleKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("d")
    ).head().getDouble(0)
    assert(math.abs(got - 22.992291345625407) < 1e-9)
  }

  test("d(a,a)=0 exactly; symmetry; bounded by half circumference (property)") {
    val coords = for {
      la <- Gen.choose(-89.0, 89.0)
      lo <- Gen.choose(-179.0, 179.0)
    } yield (la, lo)
    val prop = Prop.forAll(coords, coords) { (a, b) =>
      val ab = GeoFunctions.greatCircleKmScalar(a._1, a._2, b._1, b._2)
      val ba = GeoFunctions.greatCircleKmScalar(b._1, b._2, a._1, a._2)
      math.abs(ab - ba) < 1e-9 &&
        ab >= 0.0 && ab <= math.Pi * GeoFunctions.EarthRadiusKm + 1e-6 &&
        GeoFunctions.greatCircleKmScalar(a._1, a._2, a._1, a._2) == 0.0
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
