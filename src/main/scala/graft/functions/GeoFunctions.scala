package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo math shared by the batch and streaming paths. */
object GeoFunctions {

  final val EarthRadiusKm = 6371.0

  /** Great-circle distance (spherical law of cosines, R = 6371 km)
    * replicating FraudDistMetric.java:69-78 (the comment there claims
    * Haversine; the implemented formula is law-of-cosines — SURVEY §2.8 F5
    * pins the actual formula). Clamped into acos's domain; the
    * exact-equality short-circuit keeps d(a,a) = 0 stable (acos is
    * ill-conditioned near 1 where last-ulp noise amplifies to ~1e-4 km).
    *
    * Column composition, not a UDF: stays inside whole-stage codegen.
    *
    * NaN coordinates propagate as NaN, same as the scalar twin. Two Spark
    * SQL semantics would silently turn NaN into distance 0 here: `===`
    * evaluates NaN = NaN as true (so the same-point guard would fire), and
    * `least` orders NaN above every double (so the clamp would pick 1.0 and
    * acos(1.0) = 0). Both are excluded explicitly, keeping this form, the
    * scalar twin, the native [[GreatCircleDistance]] expression, and the
    * [[ZeroDistanceFold]] plan-time fold value-identical on every input.
    */
  def greatCircleKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val arg = sin(radians(lat1)) * sin(radians(lat2)) +
      cos(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon1 - lon2))
    val clamped = when(isnan(arg), arg)
      .otherwise(least(lit(1.0), greatest(lit(-1.0), arg)))
    when(lat1 === lat2 && lon1 === lon2 && !isnan(lat1) && !isnan(lon1), lit(0.0))
      .otherwise(acos(clamped) * lit(EarthRadiusKm))
  }

  /** Scalar twin of [[greatCircleKm]] for driver/executor-side use inside the
    * streaming state function (FraudDistMetric.java:69-78 semantics,
    * including Math.toRadians).
    */
  def greatCircleKmScalar(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val arg = math.sin(math.toRadians(lat1)) * math.sin(math.toRadians(lat2)) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.cos(math.toRadians(lon1 - lon2))
    math.acos(math.min(1.0, math.max(-1.0, arg))) * EarthRadiusKm
  }
}
