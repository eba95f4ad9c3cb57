package graft

import graft.operators.{Analytics, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-6 batch-3 operators (BM25, Gopher
  * rules, OLS trend fit, CUSUM changepoint) beyond the DuckDB hash gate:
  * telescoping identities, flag cross-checks against independently
  * recomputed metrics, and membership properties on sf0.001.
  */
class TrendTextSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def q(qs: Seq[GraftQuery], name: String): DataFrame =
    qs.find(_.name == name).get.fn(spark, dir)

  test("q_cusum: covers all events, telescopes to 0, exactly one peak per key") {
    val df = q(Analytics.queries, "q_cusum").cache()
    val events = Tables(spark, dir, "events")
    assert(df.count() == events.count())
    // one peak flag per key
    val peaks = df.filter(col("is_peak")).groupBy("event_type").count().collect()
    assert(peaks.nonEmpty && peaks.forall(_.getLong(1) == 1L))
    // cusum_n = S_n − n·(T/n) telescopes to 0 up to one double rounding
    val last = df.withColumn("mx", max("i").over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .filter(col("i") === col("mx")).select("cusum").collect()
    last.foreach(r => assert(math.abs(r.getDouble(0)) < 1e-5))
    df.unpersist()
  }

  test("q_linreg: n conserves events, r2 in [0,1], slope matches cov/var replay") {
    val rows = q(Analytics.queries, "q_linreg").collect()
    val events = Tables(spark, dir, "events")
    assert(rows.map(_.getLong(4)).sum == events.count())
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-4 && r.getDouble(3) <= 1.0 + 1e-4, s"r2 ${r.getDouble(3)}")
    }
    // independent covar_pop/var_pop replay of the slope
    val replay = events
      .withColumn("x", datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("double"))
      .groupBy("event_type")
      .agg((covar_pop(col("value"), col("x")) / var_pop(col("x"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - replay(r.getString(0))) < 1e-3,
        s"${r.getString(0)}: ${r.getDouble(1)} vs ${replay(r.getString(0))}")
    }
  }

  test("q_bm25: exactly the docs containing a query term, all scores positive") {
    val terms = Seq("spark", "join", "window")
    val df = q(TextAnalysis.queries, "q_bm25").cache()
    val expected = Tables(spark, dir, "documents")
      .filter(terms.map(t => array_contains(split(col("text"), " "), t)).reduce(_ || _))
    assert(df.count() == expected.count())
    assert(df.join(expected, Seq("doc_id"), "left_anti").count() == 0)
    assert(df.filter(col("bm25") <= 0.0).count() == 0)
    df.unpersist()
  }

  test("q_gopher_rules: covers all docs, keep flag consistent with reported metrics") {
    val df = q(TextAnalysis.queries, "q_gopher_rules").cache()
    val docs = Tables(spark, dir, "documents")
    assert(df.count() == docs.count())
    // replay the flag from the ROUNDED metrics: rounding moves each ratio
    // by <1e-6, so disagreement is only possible within 1e-6 of a bound —
    // exclude that sliver and the replay must match exactly
    val margin = 1e-5
    val strict = df.filter(
      abs(col("mean_wlen") - 3.0) > margin && abs(col("mean_wlen") - 10.0) > margin &&
        abs(col("alpha_frac") - 0.8) > margin && abs(col("symbol_ratio") - 0.1) > margin)
    val mismatch = strict.filter(
      col("keep") =!= (col("n_words").between(50L, 100000L) &&
        col("mean_wlen").between(3.0, 10.0) && col("n_stop") >= 2L &&
        col("alpha_frac") >= 0.8 && col("symbol_ratio") <= 0.1))
    assert(mismatch.count() == 0)
    // at least one doc on each side of the filter on this corpus
    assert(df.filter(col("keep")).count() > 0 || df.filter(!col("keep")).count() > 0)
    df.unpersist()
  }
}
