package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with its Spark implementation and (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Queries without an oracle get
  * the driver's weaker rows-only check.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Tables {
  /** Load one of the driver-provided parquet tables from a scale-factor dir.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long and convert to a microsecond timestamp with
    * integer arithmetic (`div`, not `/` — a double round-trip of an ~1.7e18
    * nanos value loses precision above 2^53).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // nanos-long only for the original driver fixtures; derived/scaled
      // copies already carry a proper timestamp column
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
