package graft.geo

import graft.sources.Sources
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zip-code geo dimension (GeoGraudData.csv; FraudDistMetric.java:26-57).
  *
  * The reference builds a per-JVM singleton HashMap lazily on first use
  * (FraudDistMetric.java:31-36) — an anti-pattern at scale (every executor
  * re-reads the CSV). Here the dimension is read once, collected on the
  * driver (17k rows ≈ 1 MB), and shipped as a Broadcast variable; or joined
  * as a broadcast dimension DataFrame when the relational form fits better.
  */
object Geo {

  /** Zip → (lat, lon). Keys are strings: the reference probes the map with
    * postcode.toString (FinFraudGuard.java:75), which silently drops leading
    * zeros of INT-typed postcodes — preserved behavior (SURVEY §1.2).
    */
  def zipMap(spark: SparkSession, path: String): Map[String, (Double, Double)] =
    Sources.readZipCsv(spark, path)
      .select("zip", "lat", "lon")
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  def broadcastZipMap(spark: SparkSession, path: String): Broadcast[Map[String, (Double, Double)]] =
    spark.sparkContext.broadcast(zipMap(spark, path))

  /** The dimension as a DataFrame for broadcast-join use (J5 variant). */
  def zipDim(spark: SparkSession, path: String): DataFrame =
    Sources.readZipCsv(spark, path)
}
