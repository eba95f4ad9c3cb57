package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with its Spark implementation and (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Queries without an oracle get
  * the driver's weaker rows-only check.
  *
  * `oracleGen` is the verify-time variant for oracles whose SQL-expressible
  * half depends on fixture-derived constants (q_bpe_tokens: the trained
  * merge table embeds as literals into a recursive CTE). Verify evaluates it
  * with the same (spark, sfDir) the query ran against and writes the result
  * into oracle_sql.json alongside the static oracles — the DuckDB side then
  * recomputes the deterministic half independently. Exactly one of
  * `oracle` / `oracleGen` should be set.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[(SparkSession, String) => String] = None,
)

object Tables {
  /** Load one of the driver-provided parquet tables from a scale-factor dir,
    * normalized so every query sees one timestamp flavor regardless of how a
    * given round's fixtures were written:
    *
    *   - TIMESTAMP(NANOS) (which Spark's parquet reader rejects) is read as
    *     long and converted to a microsecond timestamp with integer
    *     arithmetic (`div`, not `/` — a double round-trip of an ~1.7e18
    *     nanos value loses precision above 2^53);
    *   - TIMESTAMP_NTZ (isAdjustedToUTC=false, what pyarrow writes for a
    *     tz-naive `timestamp[us]`) is cast to session-tz TIMESTAMP. The
    *     session zone is pinned UTC everywhere, so the wall-clock values
    *     are unchanged — but the NTZ type itself would reject the
    *     epoch-seconds casts (`cast(ts AS double)`) the queries and the
    *     DuckDB oracle both rely on.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (name == "events") spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = raw.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    val fixed = ntz.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
    if (name == "events" && raw.schema("ts").dataType == LongType)
      fixed.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else fixed
  }
}
