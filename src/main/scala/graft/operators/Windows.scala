package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Event-time windowing beyond the reference's row-frame windows: tumbling
  * and session windows — the Structured Streaming aggregation shapes, here
  * exercised in batch mode where DuckDB can oracle them. The same
  * `window()`/`session_window()` expressions drop into `readStream` with a
  * watermark unchanged (K1's upgrade path).
  */
object Windows {

  val queries: Seq[GraftQuery] = Seq(

    // Tumbling 1-hour event-time windows per event type.
    GraftQuery(
      "q_window_tumbling",
      (s, dir) => {
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_value"),
          )
          .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("hour_start", "event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),

    // Session windows: 30-minute inactivity gap per user. Spark's
    // session_window splits when the next event starts >= gap after the
    // previous ([start, start+gap) windows don't overlap at exactly gap);
    // the oracle reproduces that with the lag/cumsum island pattern.
    GraftQuery(
      "q_window_session",
      (s, dir) => {
        Tables(s, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType).as("sum_value"),
          )
          .select(col("user_id"),
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            col("n"), col("sum_value"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0 OR lag(ts) OVER w IS NULL
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |),
             |sessions AS (
             |  SELECT user_id, ts, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM seq
             |)
             |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
             |FROM sessions GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
    ),

    // SQL-surface parity: the reference's batch layer is HiveQL runbooks —
    // the fused UCL pipeline (P2+W1+A1) expressed through spark.sql over a
    // temp view, proving the textual-SQL entry point works end to end.
    GraftQuery(
      "q_sql_surface",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events_v")
        s.sql(
          """SELECT user_id,
            |  floor((s / n_used + 3 * sqrt(greatest(0.0D, s2 / n_used - (s / n_used) * (s / n_used)))) * 1e4 + 0.5) / 1e4 AS ucl,
            |  n_used
            |FROM (
            |  SELECT user_id,
            |    CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s,
            |    CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2,
            |    count(*) AS n_used
            |  FROM (
            |    SELECT user_id, value,
            |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            |    FROM events_v
            |  ) WHERE rn <= 10
            |  GROUP BY user_id
            |)
            |ORDER BY user_id""".stripMargin)
      },
      Some("""SELECT user_id,
             |  floor((s / n_used + 3 * sqrt(greatest(0.0, s2 / n_used - (s / n_used) * (s / n_used)))) * 1e4 + 0.5) / 1e4 AS ucl,
             |  n_used
             |FROM (
             |  SELECT user_id,
             |    CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s,
             |    CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2,
             |    count(*) AS n_used
             |  FROM (
             |    SELECT user_id, value,
             |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |    FROM events
             |  ) WHERE rn <= 10
             |  GROUP BY user_id
             |)
             |ORDER BY user_id""".stripMargin),
    ),

    // Rolling distinct count — distinct event types a user touched in
    // their last 5 events. Spark has no DISTINCT window aggregate, so the
    // idiomatic form is size(collect_set() OVER rows-frame); the frame is
    // bounded (5 rows), so per-row state is O(frame), not O(partition) —
    // the shape that survives 100 TB. One exchange on user_id shared by
    // the sort. Velocity screens ("new merchant burst") are this operator.
    GraftQuery(
      "q_rolling_distinct",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
          .rowsBetween(-4, Window.currentRow)
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("secs"), col("event_type"))
          .withColumn("n_types_5", size(collect_set("event_type").over(w)).cast("long"))
          .select("event_id", "user_id", "n_types_5")
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs, event_type
             |  FROM events)
             |SELECT event_id, user_id,
             |  count(DISTINCT event_type) OVER (
             |    PARTITION BY user_id ORDER BY secs, event_id
             |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_types_5
             |FROM e ORDER BY event_id""".stripMargin),
    ),
  )
}
