package graft.operators

import graft.GraftQuery
import graft.ml.FraudScorer
import org.apache.spark.sql.functions._

/** The MLlib layer's deterministic scoring surface (BASELINE.json north
  * star: "DataFrame ops + MLlib for fraud detection").
  *
  * The trainable path (graft.ml.FraudScorer.train — VectorAssembler +
  * DecisionTreeClassifier) stays spec-pinned (MLSpec): tree training is not
  * SQL-expressible. What IS oracle-checkable is the deployed shape — a
  * frozen model scoring every transaction as a pure column expression — so
  * `q_ml_score` runs the fixed-weight logistic over the same three features
  * the tree trains on (score, amount/UCL, speed; nulls → the abstention
  * sentinels of FraudScorer.featurize) and DuckDB replays it exactly.
  *
  * Scale notes: the feature frame is `Relational.fraudEnriched` (one window
  * pass, broadcast dims); scoring adds zero shuffles — it's a codegen'd
  * projection, the plan every per-record model-serving pipeline should
  * lower to at 100 TB.
  */
object Ml {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_ml_score",
      (s, dir) => {
        val scoreF = coalesce(col("score"), lit(1000.0))
        val aou = coalesce(when(col("ucl") =!= 0, col("value") / col("ucl")), lit(0.0))
        val speedF = coalesce(col("speed_kms"), lit(0.0))
        val m = FraudScorer.logisticMargin(scoreF, aou, speedF)
        Relational.fraudEnriched(s, dir)
          .select(
            col("event_id"), col("user_id"),
            FraudScorer.logisticProb(m).as("ml_score"),
            when(m > 0, lit("FRAUD")).otherwise(lit("GENUINE")).as("ml_label"),
          )
          .orderBy("event_id")
      },
      Some(s"""WITH located AS (${Relational.coordsSql}),
              |seq AS (
              |  SELECT event_id, user_id, value, lat, lon,
              |    lag(lat) OVER w AS prev_lat, lag(lon) OVER w AS prev_lon,
              |    epoch(ts) - lag(epoch(ts)) OVER w AS dt_s
              |  FROM located
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              |),
              |speeds AS (
              |  SELECT *, CASE WHEN dt_s > 0
              |    THEN ${Relational.greatCircleSql("prev_lat", "prev_lon", "lat", "lon")} / dt_s
              |    END AS speed_kms
              |  FROM seq
              |),
              |ucl AS (${Relational.uclSql}),
              |feat AS (
              |  SELECT s.event_id, s.user_id,
              |    floor((-2.0 + -0.004 * coalesce(c.c_acctbal, 1000.0)
              |      + 1.5 * coalesce(CASE WHEN u.ucl <> 0 THEN s.value / u.ucl END, 0.0)
              |      + 4.0 * coalesce(s.speed_kms, 0.0)) * 1e6 + 0.5) / 1e6 AS m
              |  FROM speeds s
              |  LEFT JOIN ucl u ON s.user_id = u.user_id
              |  LEFT JOIN customer c ON s.user_id = c.c_custkey
              |)
              |SELECT event_id, user_id,
              |  floor(1.0 / (1.0 + exp(-m)) * 1e4 + 0.5) / 1e4 AS ml_score,
              |  CASE WHEN m > 0 THEN 'FRAUD' ELSE 'GENUINE' END AS ml_label
              |FROM feat ORDER BY event_id""".stripMargin),
    ),
  )
}
