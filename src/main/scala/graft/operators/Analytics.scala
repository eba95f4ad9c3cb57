package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Analytics operators beyond the reference's literal surface (SURVEY §2.4
  * notes the engine gets these "free from Spark"): exact interpolated
  * quantiles, rollup/grouping sets, distinct aggregation. Demonstrated so
  * the completeness claim is tested, not assumed.
  */
object Analytics {

  val queries: Seq[GraftQuery] = Seq(

    // Exact interpolated quantiles per group (percentile == quantile_cont's
    // rank = p·(n−1) definition in both engines).
    GraftQuery(
      "q_quantiles",
      (s, dir) => {
        Tables(s, dir, "events")
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            (floor(expr("percentile(value, 0.5)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("median"),
            (floor(expr("percentile(value, 0.95)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("p95"),
          )
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  floor(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS median,
             |  floor(quantile_cont(value, 0.95) * 1e6 + 0.5) / 1e6 AS p95
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // ROLLUP: subtotal + grand-total rows with NULL group markers.
    GraftQuery(
      "q_rollup",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(col("l_quantity").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_qty"),
          )
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
    ),

    // Distinct aggregation (count distinct over two columns + plain count).
    GraftQuery(
      "q_distinct_agg",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_lines"),
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(*) AS n_lines
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),
  )
}
