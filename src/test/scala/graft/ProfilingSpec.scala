package graft

import graft.operators.{Analytics, Curation, Graph, Windows}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic invariants for the behavioral-profiling operators (Markov
  * transitions, Benford digits, winsorization, rolling distinct,
  * co-occurrence projection, weighted sampling) beyond the DuckDB hash
  * gate: conservation laws (counts and probability mass), clamp bounds,
  * and brute-force cross-checks on sf0.001.
  */
class ProfilingSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def q(qs: Seq[GraftQuery], name: String): DataFrame =
    qs.find(_.name == name).get.fn(spark, dir)

  test("q_markov: per-source probability mass sums to 1, transitions conserve events") {
    val df = q(Analytics.queries, "q_markov").cache()
    val bySrc = df.groupBy("src")
      .agg(sum("p").as("mass"), sum("cnt").as("n"))
      .collect()
    bySrc.foreach { r =>
      // each p is rounded to 1e-6, |types| terms -> mass within 1e-5 of 1
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5, s"src=${r.getString(0)}")
    }
    val events = Tables(spark, dir, "events")
    val total = events.count()
    val users = events.select("user_id").distinct().count()
    val transitions = df.agg(sum("cnt")).head().getLong(0)
    // every user with n events contributes n-1 transitions
    assert(transitions == total - users)
    df.unpersist()
  }

  test("q_benford: digits 1-9 partition the positive orders, expected mass sums to 1") {
    val rows = q(Analytics.queries, "q_benford").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val nPos = Tables(spark, dir, "orders").filter(col("o_totalprice") > 0.0).count()
    assert(rows.map(_.getLong(1)).sum == nPos)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4) // sum log10(1+1/d) telescopes to 1
  }

  test("q_winsorize: row-preserving, clamped exactly into the per-segment [p05, p95]") {
    val df = q(Analytics.queries, "q_winsorize").cache()
    val cust = Tables(spark, dir, "customer")
    assert(df.count() == cust.count())
    // replay the clamp independently: quantized exact percentiles per segment
    val qs = cust.groupBy("c_mktsegment").agg(
      (floor(expr("percentile(c_acctbal, 0.05)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("lo"),
      (floor(expr("percentile(c_acctbal, 0.95)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("hi"))
    val viol = df.join(qs, "c_mktsegment")
      .filter(col("clamped") =!= least(greatest(col("c_acctbal"), col("lo")), col("hi")))
      .count()
    assert(viol == 0)
    // interior values untouched, tails clamped to a segment-constant bound
    val perSeg = df.groupBy("c_mktsegment").agg(
      min("clamped").as("lo"), max("clamped").as("hi"),
      sum(when(col("clamped") =!= col("c_acctbal"), 1L).otherwise(0L)).as("nClamped"),
      count(lit(1)).as("n"))
    perSeg.collect().foreach { r =>
      val clampedFrac = r.getLong(3).toDouble / r.getLong(4)
      // ~10% of a segment sits in the tails; small sf0.001 segments wobble
      assert(clampedFrac <= 0.25, s"${r.getString(0)}: ${clampedFrac}")
    }
    df.unpersist()
  }

  test("q_rolling_distinct: bounded by frame and by rank within the user") {
    val df = q(Windows.queries, "q_rolling_distinct")
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("secs"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("secs", "event_id")))
    val bad = df.join(e, Seq("event_id", "user_id"))
      .filter(col("n_types_5") < 1L ||
        col("n_types_5") > least(lit(5L), col("rk").cast("long")))
      .count()
    assert(bad == 0)
    assert(df.count() == e.count())
  }

  test("q_cooccur: ordered pairs, threshold respected, one pair recomputed brute-force") {
    val df = q(Graph.queries, "q_cooccur").cache()
    assert(df.filter(col("s1") >= col("s2") || col("common_parts") < 3L).count() == 0)
    val top = df.orderBy(desc("common_parts"), col("s1"), col("s2")).head()
    val (a, b) = (top.getLong(0), top.getLong(1))
    val li = Tables(spark, dir, "lineitem")
    // hub cap replayed by hand: parts with <= 25 distinct suppliers
    val ok = li.select("l_partkey", "l_suppkey").distinct()
      .groupBy("l_partkey").agg(countDistinct("l_suppkey").as("d"))
      .filter(col("d") <= 25).select("l_partkey")
    val partsOf = (sk: Long) => li.filter(col("l_suppkey") === sk)
      .join(ok, "l_partkey").select("l_partkey").distinct()
    val common = partsOf(a).intersect(partsOf(b)).count()
    assert(common == top.getLong(2))
    df.unpersist()
  }

  test("q_skyline: equals the brute-force dominance filter") {
    val front = q(Analytics.queries, "q_skyline")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val p = Tables(spark, dir, "part")
      .select(col("p_partkey").as("k"), col("p_retailprice").as("pr"), col("p_size").as("sz"))
    // O(n²) oracle: dominated = exists q with pr>=, sz<=, one strict
    val dominated = p.as("x").join(p.as("y"),
        col("y.pr") >= col("x.pr") && col("y.sz") <= col("x.sz") &&
          (col("y.pr") > col("x.pr") || col("y.sz") < col("x.sz")), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    val all = p.select("k").collect().map(_.getLong(0)).toSet
    assert(front == all -- dominated)
    assert(front.nonEmpty)
  }

  test("q_gap_islands: islands are disjoint, maximal, and cover every active day") {
    val df = q(Analytics.queries, "q_gap_islands").cache()
    val activeDays = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(df.agg(sum("n_days")).head().getLong(0) == activeDays)
    // spans are internally consistent and inter-island gaps exceed 1 day
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start_day")
    val bad = df
      .withColumn("span_len",
        datediff(to_date(col("end_day")), to_date(col("start_day"))) + 1)
      .withColumn("prev_end", lag(to_date(col("end_day")), 1).over(w))
      .filter(col("span_len") =!= col("n_days") ||
        (col("prev_end").isNotNull &&
          datediff(to_date(col("start_day")), col("prev_end")) <= 1))
      .count()
    assert(bad == 0)
    df.unpersist()
  }

  test("histQuantile and bounded_set survive empty input") {
    val s = spark
    import s.implicits._
    graft.functions.BoundedSetAgg.register(s)
    val emptyV = Seq.empty[(String, Double)].toDF("g", "v")
    assert(operators.Sketches.histQuantile(emptyV, "v", "g", 0.0, 1.0, 8, Seq(0.5)).count() == 0)
    val emptyL = Seq.empty[(Long, Long)].toDF("g", "v")
    assert(emptyL.groupBy("g").agg(expr("bounded_set(v, 4)")).count() == 0)
  }

  test("single-event users produce no markov transitions but keep their rolling count") {
    val s = spark
    import s.implicits._
    // replicate the q_markov lead+group shape on a toy frame: a user with
    // one event contributes nothing; two events -> one transition
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("t")
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 2L, "a"))
      .toDF("t", "u", "ty")
      .withColumn("dst", lead("ty", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("ty").as("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", "b", 1L)))
  }

  test("q_weighted_sample: deterministic, exactly 50, priorities are the hash/weight ratio") {
    val df1 = q(Curation.queries, "q_weighted_sample")
    val df2 = q(Curation.queries, "q_weighted_sample")
    val r1 = df1.collect().map(r => (r.getLong(0), r.getDouble(2)))
    val r2 = df2.collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(r1.toSeq == r2.toSeq && r1.length == 50)
    // the 50 kept priorities are exactly the bottom-50 of the full corpus
    val kept = r1.map(_._2).max
    val below = Tables(spark, dir, "documents").filter(col("n_chars") > 0L)
      .select((conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long").cast("double") / col("n_chars").cast("double")).as("p"))
      .filter(col("p") < kept).count()
    assert(below <= 50)
  }
}
