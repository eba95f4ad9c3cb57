package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Analytics operators beyond the reference's literal surface (SURVEY §2.4
  * notes the engine gets these "free from Spark"): exact interpolated
  * quantiles, rollup/grouping sets, distinct aggregation. Demonstrated so
  * the completeness claim is tested, not assumed.
  */
object Analytics {

  /** Kaplan–Meier product-limit curve from per-subject observations:
    * `subjects` carries (t: duration, obs: 1 = event observed, 0 =
    * right-censored at t). Returns the step curve at death times only —
    * (t, n_risk, deaths, survival) with S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)
    * under the deaths-before-censorings-at-t risk-set convention.
    * Factor lns are micro-quantized per step (the shared ln discipline);
    * a saturated step (d = n) zeroes the curve via the running
    * min(n − d) flag rather than ln(0). The cumulative windows run over
    * DISTINCT durations (bounded by the time grid, not subjects), so the
    * only subject-scaled work is the groupBy("t") partial aggregate.
    */
  def kaplanMeier(subjects: DataFrame): DataFrame = {
    val byT = subjects.groupBy("t")
      .agg(count(lit(1)).as("total"), sum("obs").as("deaths"))
    val wAsc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("gone_before",
        sum("total").over(wAsc) - col("total"))
      .crossJoin(broadcast(subjects.agg(count(lit(1)).as("nu"))))
      .withColumn("n_risk", col("nu") - col("gone_before"))
      .filter(col("deaths") > 0)
      .withColumn("lf",
        when(col("deaths") < col("n_risk"),
          floor(log(lit(1.0) - col("deaths").cast("double") / col("n_risk").cast("double"))
            * lit(1e6) + lit(0.5)).cast(LongType)).otherwise(lit(0L)))
      .withColumn("cum_lf", sum("lf").over(wAsc))
      .withColumn("alive_min",
        min(col("n_risk") - col("deaths")).over(wAsc))
      .select(col("t"), col("n_risk"), col("deaths"),
        when(col("alive_min") === 0, lit(0.0))
          .otherwise(floor(exp(col("cum_lf").cast("double") / lit(1e6))
            * lit(1e6) + lit(0.5)) / lit(1e6)).as("survival"))
  }

  /** Single change-point detection by binary segmentation: over a series
    * of (t, p) points, pick the split minimizing SSE_left + SSE_right
    * (the first step of the classic binary-segmentation recursion, and
    * the variance twin of [[Ml.bestStump]]'s Gini split). Both prefix
    * moments come from ONE cumulative window over the series — candidates
    * are every interior boundary, so the scan is O(|series|), which is
    * grid-bounded (hours), not row-bounded.
    *
    * Determinism: p must be an exact integer series (quantize upstream);
    * prefix Σp and Σp² are exact BIGINTs, each candidate's cost
    * SSE = (S2_L − S_L²/n_L) + (S2_R − S_R²/n_R) is one double
    * expression over exact-int operands, micro-quantized; argmin
    * tie-break (cost, t). Output: one row (t, cost, mean_l, mean_r) —
    * t is the first point of the RIGHT segment, means floored to micros.
    */
  def changePoint(series: DataFrame, tCol: String, pCol: String): DataFrame = {
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val d = (c: Column) => c.cast("double")
    val pre = series.select(col(tCol).as("t"), col(pCol).cast(LongType).as("p"))
      .withColumn("nl", count(lit(1)).over(wCum))
      .withColumn("sl", sum("p").over(wCum))
      .withColumn("s2l", sum(col("p") * col("p")).over(wCum))
      .withColumn("nt", count(lit(1)).over(wAll))
      .withColumn("st", sum("p").over(wAll))
      .withColumn("s2t", sum(col("p") * col("p")).over(wAll))
      // split AFTER this row; drop the last (empty right segment)
      .filter(col("nl") < col("nt"))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("s2r", col("s2t") - col("s2l"))
    val cost =
      (d(col("s2l")) - d(col("sl")) * d(col("sl")) / d(col("nl"))) +
      (d(col("s2r")) - d(col("sr")) * d(col("sr")) / d(col("nr")))
    val nextT = lead("t", 1).over(Window.orderBy("t"))
    pre
      .withColumn("split_t", nextT)
      .select(col("split_t").as("t"),
        (floor(cost * lit(1e6) + lit(0.5)) / lit(1e6)).as("cost"),
        (floor(d(col("sl")) / d(col("nl")) * lit(1e6)).cast(LongType)
          .cast("double") / lit(1e6)).as("mean_l"),
        (floor(d(col("sr")) / d(col("nr")) * lit(1e6)).cast(LongType)
          .cast("double") / lit(1e6)).as("mean_r"))
      .orderBy("cost", "t")
      .limit(1)
  }

  /** Frozen 2-state HMM for [[viterbi]]: integer-micro log-probabilities
    * (ln·10⁶, negative longs), so the whole DP is exact (max, +) integer
    * arithmetic — no float anywhere, bit-identical across engines and
    * partitionings by construction. State 0 = normal browsing, state 1 =
    * risky (error-prone) episode.
    */
  object HmmModel {
    val pi: Array[Long] = Array(-300000L, -1400000L)
    // t(s)(s') — sticky states, expensive 0→1 entry
    val t: Array[Array[Long]] = Array(
      Array(-200000L, -1700000L),
      Array(-900000L, -600000L))
    val emit: Map[String, Array[Long]] = Map(
      "view" -> Array(-1000000L, -2000000L),
      "click" -> Array(-1200000L, -2000000L),
      "purchase" -> Array(-2000000L, -1500000L),
      "signup" -> Array(-2500000L, -2500000L),
      "error" -> Array(-3500000L, -800000L))
    val emitDefault: Array[Long] = Array(-3000000L, -3000000L)
  }

  /** Viterbi MAP decoding of each user's event-type sequence under the
    * frozen [[HmmModel]] — the sequence-labeling primitive (session
    * phase segmentation, risky-episode detection) as a per-key DP.
    *
    * Scale shape: one shuffle keys users, then each sequence decodes in
    * ONE task with O(len) state (forward scores + backpointers) — the
    * legitimate `flatMapGroups` case: a per-key scan with a
    * non-commutative recurrence no fixed set of window passes expresses.
    * The contract is the usual sessionization bound (one user's events
    * fit a task); ordering inside the group is (ts, event_id), imposed
    * in-task so the decode is partition- and arrival-order-invariant.
    * Ties break to state 0 everywhere (argmax uses ≥). Output:
    * (user_id, rn, state) for every event position.
    */
  def viterbi(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast(LongType), unix_micros(col("ts")),
        col("event_id").cast(LongType), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val seq = it.toArray.sortBy(r => (r._2, r._3))
        val n = seq.length
        val v0 = new Array[Long](n)
        val v1 = new Array[Long](n)
        val bp0 = new Array[Int](n)
        val bp1 = new Array[Int](n)
        var i = 0
        while (i < n) {
          val e = HmmModel.emit.getOrElse(seq(i)._4, HmmModel.emitDefault)
          if (i == 0) {
            v0(0) = HmmModel.pi(0) + e(0)
            v1(0) = HmmModel.pi(1) + e(1)
          } else {
            val a00 = v0(i - 1) + HmmModel.t(0)(0)
            val a10 = v1(i - 1) + HmmModel.t(1)(0)
            val a01 = v0(i - 1) + HmmModel.t(0)(1)
            val a11 = v1(i - 1) + HmmModel.t(1)(1)
            bp0(i) = if (a00 >= a10) 0 else 1
            bp1(i) = if (a01 >= a11) 0 else 1
            v0(i) = math.max(a00, a10) + e(0)
            v1(i) = math.max(a01, a11) + e(1)
          }
          i += 1
        }
        val path = new Array[Int](n)
        path(n - 1) = if (v0(n - 1) >= v1(n - 1)) 0 else 1
        i = n - 1
        while (i > 0) {
          path(i - 1) = if (path(i) == 0) bp0(i) else bp1(i)
          i -= 1
        }
        (0 until n).iterator.map(j => (uid, (j + 1).toLong, path(j).toLong))
      }
      .toDF("user_id", "rn", "state")
  }

  val queries: Seq[GraftQuery] = Seq(

    // Kaplan–Meier survival curve (product-limit estimator), the classic
    // time-to-failure analysis with right-censoring: per user, duration =
    // hours from the first event to the FIRST 'error' event (the failure);
    // users who never error are right-censored at study end (max ts over
    // the table). S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over death times,
    // emitted at death times only (the standard step curve), with the
    // deaths-before-censorings-at-t risk-set convention.
    //
    // Scale shape: the distributed work is ONE per-user min/max
    // aggregate (partial-combined); the curve itself lives on distinct
    // durations — bounded by study length in hours, not by users — so
    // the single-partition cumulative window is over ≤ |study hours|
    // rows no matter how many users flow in. Float discipline: the
    // factor lns are quantized to micros per step (q_kl_source rule),
    // summed exactly, one exp at the end; a saturated risk set
    // (d_t = n_t) zeroes the curve from that step on via the running
    // min(n−d) flag, never through ln(0).
    GraftQuery(
      "q_survival",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
        val endT = ev.agg(max("us").as("endus"))
        val users = ev.groupBy("user_id")
          .agg(min("us").as("f"),
            min(when(col("event_type") === "error", col("us"))).as("e"))
          .crossJoin(broadcast(endT))
          .select(
            when(col("e").isNotNull, col("e") - col("f"))
              .otherwise(col("endus") - col("f")).cast(LongType).as("durus"),
            col("e").isNotNull.cast("int").as("obs"))
          .select((col("durus") / lit(3600000000L)).cast(LongType).as("t"),
            col("obs"))
        kaplanMeier(users).orderBy("t")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
             |endt AS (SELECT max(us) AS endus FROM ev),
             |users AS (
             |  SELECT
             |    CASE WHEN e IS NOT NULL THEN e - f ELSE endus - f END
             |      // 3600000000 AS t,
             |    CASE WHEN e IS NOT NULL THEN 1 ELSE 0 END AS obs
             |  FROM (SELECT user_id, min(us) AS f,
             |          min(CASE WHEN event_type = 'error' THEN us END) AS e
             |        FROM ev GROUP BY 1),
             |    endt),
             |byt AS (
             |  SELECT t, count(*) AS total, CAST(sum(obs) AS BIGINT) AS deaths
             |  FROM users GROUP BY 1),
             |cu AS (
             |  SELECT t, total, deaths,
             |    CAST(sum(total) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - total AS BIGINT)
             |      AS gone_before,
             |    (SELECT count(*) FROM users) AS nu
             |  FROM byt),
             |dth AS (
             |  SELECT t, deaths, nu - gone_before AS n_risk,
             |    CASE WHEN deaths < nu - gone_before
             |      THEN CAST(floor(ln(1.0 - CAST(deaths AS DOUBLE)
             |        / CAST(nu - gone_before AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
             |      ELSE 0 END AS lf
             |  FROM cu WHERE deaths > 0),
             |fin AS (
             |  SELECT t, n_risk, deaths,
             |    CAST(sum(lf) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_lf,
             |    min(n_risk - deaths) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS alive_min
             |  FROM dth)
             |SELECT t, n_risk, deaths,
             |  CASE WHEN alive_min = 0 THEN 0.0
             |    ELSE floor(exp(CAST(cum_lf AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6
             |  END AS survival
             |FROM fin ORDER BY t""".stripMargin),
    ),

    // Change-point over the hourly revenue series: events quantized to
    // integer cents, summed per hour (exact BIGINTs), then the
    // binary-segmentation split minimizing total within-segment SSE
    // (see changePoint). One row out: the detected boundary hour.
    GraftQuery(
      "q_changepoint",
      (s, dir) => changePoint(
        Tables(s, dir, "events")
          .select(date_trunc("hour", col("ts")).as("h"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("c"))
          .groupBy("h").agg(sum("c").as("p")),
        "h", "p"),
      Some("""WITH hr AS (
             |  SELECT date_trunc('hour', ts) AS t,
             |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS p
             |  FROM events GROUP BY 1),
             |pre AS (
             |  SELECT t, p,
             |    CAST(count(*) OVER wc AS BIGINT) AS nl,
             |    CAST(sum(p) OVER wc AS BIGINT) AS sl,
             |    CAST(sum(p * p) OVER wc AS BIGINT) AS s2l,
             |    CAST(count(*) OVER wa AS BIGINT) AS nt,
             |    CAST(sum(p) OVER wa AS BIGINT) AS st,
             |    CAST(sum(p * p) OVER wa AS BIGINT) AS s2t,
             |    lead(t, 1) OVER (ORDER BY t) AS split_t
             |  FROM hr
             |  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wa AS ()),
             |cand AS (
             |  SELECT split_t AS t, nl, sl, s2l, nt - nl AS nr, st - sl AS sr,
             |    s2t - s2l AS s2r
             |  FROM pre WHERE nl < nt)
             |SELECT t,
             |  floor(((CAST(s2l AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
             |    + (CAST(s2r AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)))
             |    * 1e6 + 0.5) / 1e6 AS cost,
             |  CAST(CAST(floor(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS mean_l,
             |  CAST(CAST(floor(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS mean_r
             |FROM cand ORDER BY cost, t LIMIT 1""".stripMargin),
    ),

    // Viterbi MAP state path of each user's event sequence under the
    // frozen 2-state integer-micro HMM (see viterbi / HmmModel). The
    // oracle replays the DP as TWO recursive CTEs — forward scores with
    // backpointers, then the backward path walk — with every constant
    // emitted from the same HmmModel literals the engine decodes with.
    GraftQuery(
      "q_viterbi",
      (s, dir) => viterbi(Tables(s, dir, "events")).orderBy("user_id", "rn"),
      Some {
        val em = (HmmModel.emit.toSeq.sortBy(_._1).flatMap { case (o, e) =>
          Seq(s"(0, '$o', ${e(0)})", s"(1, '$o', ${e(1)})")
        }).mkString(",\n    ")
        val Array(pi0, pi1) = HmmModel.pi
        val (t00, t01) = (HmmModel.t(0)(0), HmmModel.t(0)(1))
        val (t10, t11) = (HmmModel.t(1)(0), HmmModel.t(1)(1))
        s"""WITH RECURSIVE ev AS (
           |  SELECT user_id,
           |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
           |    event_type AS o,
           |    count(*) OVER (PARTITION BY user_id) AS len
           |  FROM events),
           |em(s, o, e) AS (SELECT * FROM (VALUES
           |    $em) AS t(s, o, e)),
           |fwd(user_id, rn, len, v0, v1, bp0, bp1) AS (
           |  SELECT e.user_id, e.rn, e.len,
           |    $pi0 + e0.e, $pi1 + e1.e, 0, 0
           |  FROM ev e
           |  JOIN em e0 ON e0.s = 0 AND e0.o = e.o
           |  JOIN em e1 ON e1.s = 1 AND e1.o = e.o
           |  WHERE e.rn = 1
           |  UNION ALL
           |  SELECT e.user_id, e.rn, e.len,
           |    greatest(f.v0 + $t00, f.v1 + $t10) + e0.e,
           |    greatest(f.v0 + $t01, f.v1 + $t11) + e1.e,
           |    CASE WHEN f.v0 + $t00 >= f.v1 + $t10 THEN 0 ELSE 1 END,
           |    CASE WHEN f.v0 + $t01 >= f.v1 + $t11 THEN 0 ELSE 1 END
           |  FROM fwd f
           |  JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
           |  JOIN em e0 ON e0.s = 0 AND e0.o = e.o
           |  JOIN em e1 ON e1.s = 1 AND e1.o = e.o),
           |back(user_id, rn, state) AS (
           |  SELECT user_id, rn,
           |    CASE WHEN v0 >= v1 THEN 0 ELSE 1 END
           |  FROM fwd WHERE rn = len
           |  UNION ALL
           |  SELECT b.user_id, b.rn - 1,
           |    CASE WHEN b.state = 0 THEN f.bp0 ELSE f.bp1 END
           |  FROM back b
           |  JOIN fwd f ON f.user_id = b.user_id AND f.rn = b.rn
           |  WHERE b.rn > 1)
           |SELECT user_id, rn, CAST(state AS BIGINT) AS state
           |FROM back ORDER BY user_id, rn""".stripMargin
      },
    ),

    // Banded dynamic time warping between adjacent users' daily-spend
    // series — the time-series similarity kernel (Sakoe–Chiba radius 3)
    // as a native codegen expression over integer cents (see
    // functions.DtwBand; pure (min, +) DP, no float). Pairing is the
    // rouge/bleu rank-adjacency convention; pairs whose lengths differ
    // by more than the radius are excluded in BOTH engines (the band
    // cannot connect the corners). The oracle replays the banded DP as
    // a recursive CTE advancing one matrix ROW per step, the 7 in-band
    // cells resolved by chained lateral column aliases.
    GraftQuery(
      "q_dtw",
      (s, dir) => {
        graft.functions.DtwBand.register(s)
        val daily = Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast(LongType).as("d"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("c"))
          .groupBy("user_id", "d").agg(sum("c").as("p"))
        val ser = daily.groupBy("user_id").agg(
          transform(array_sort(collect_list(struct(col("d"), col("p")))),
            x => x.getField("p")).as("arr"),
          count(lit(1)).as("n"))
        val rk = ser.withColumn("r",
          row_number().over(Window.orderBy("user_id")))
        rk.select(col("user_id").as("ua"), col("arr").as("a"),
            col("n").as("na"), col("r"))
          .join(rk.select(col("user_id").as("ub"), col("arr").as("b"),
            col("n").as("nb"), (col("r") - 1).as("r")), Seq("r"))
          .filter(abs(col("na") - col("nb")) <= 3)
          .select(col("ua"), col("ub"), col("na"), col("nb"),
            expr("dtw_band(a, b)").as("dtw"))
          .orderBy("ua")
      },
      Some {
        val INF = "1000000000000000"
        val W = 7 // band width: 2*radius + 1
        // pv(x) = D(i, x) read from the carried row list vs (valid for
        // lo0 <= x <= hi0, else INF; x = 0 is off-row for i >= 1)
        def pv(x: String) =
          s"(CASE WHEN $x >= lo0 AND $x <= hi0 THEN vs[($x - lo0 + 1)::INT] ELSE $INF END)"
        // chained aliases m_k (three-way min) and u_k (cap + cost add)
        val stepAliases = (1 to W).map { k =>
          val j = s"(lo1 + ${k - 1})"
          val prevU = if (k == 1) INF else s"u${k - 1}"
          s"""least(${pv(s"($j - 1)")}, ${pv(j)}, $prevU) AS m$k,
             |      CASE WHEN $j <= hi1 AND m$k < $INF
             |        THEN abs(a[(i + 1)::INT] - b[$j::INT]) + m$k
             |        ELSE $INF END AS u$k""".stripMargin
        }.mkString(",\n      ")
        val baseAliases = (1 to W).map { k =>
          if (k == 1)
            s"CASE WHEN 1 <= least(m, 4) THEN abs(a[1] - b[1]) ELSE $INF END AS u1"
          else
            s"""CASE WHEN $k <= least(m, 4) AND u${k - 1} < $INF
               |        THEN abs(a[1] - b[$k]) + u${k - 1} ELSE $INF END AS u$k""".stripMargin
        }.mkString(",\n      ")
        val us = (1 to W).map("u" + _).mkString(", ")
        s"""WITH RECURSIVE daily AS (
           |  SELECT user_id,
           |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
           |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS p
           |  FROM events GROUP BY 1, 2),
           |ser AS (
           |  SELECT user_id, list(p ORDER BY d) AS arr, count(*) AS n
           |  FROM daily GROUP BY 1),
           |rk AS (
           |  SELECT user_id, arr, n,
           |    row_number() OVER (ORDER BY user_id) AS r
           |  FROM ser),
           |pr AS (
           |  SELECT x.user_id AS ua, y.user_id AS ub, x.arr AS a, y.arr AS b,
           |    x.n AS n, y.n AS m
           |  FROM rk x JOIN rk y ON y.r = x.r + 1
           |  WHERE abs(x.n - y.n) <= 3),
           |rec(ua, ub, a, b, n, m, i, vs) AS (
           |  SELECT ua, ub, a, b, n, m, CAST(1 AS BIGINT),
           |    list_value($us)
           |  FROM (
           |    SELECT *,
           |      $baseAliases
           |    FROM pr)
           |  UNION ALL
           |  SELECT ua, ub, a, b, n, m, i + 1, list_value($us)
           |  FROM (
           |    SELECT *,
           |      greatest(1, i - 3) AS lo0, least(m, i + 3) AS hi0,
           |      greatest(1, i + 1 - 3) AS lo1, least(m, i + 1 + 3) AS hi1,
           |      $stepAliases
           |    FROM rec WHERE i < n)
           |)
           |SELECT ua, ub, n AS na, m AS nb,
           |  vs[(m - greatest(1, n - 3) + 1)::INT] AS dtw
           |FROM rec WHERE i = n ORDER BY ua""".stripMargin
      },
    ),

    // Holt's linear-trend double exponential smoothing (α = β = 1/2)
    // over each event type's daily cent totals — the forecasting step
    // up from q_ewma's level-only smoother. The recurrence runs in
    // FIXED-POINT integer cents with truncating division (l' =
    // (y + l + b) div 2; b' = (l' − l + b) div 2 — both engines truncate
    // toward zero), so the whole trajectory is engine- and partition-
    // exact with no float drift to adjudicate. Per-key scan in one task
    // (the viterbi flatMapGroups shape, grid-bounded at days × types);
    // the oracle replays it as a recursive CTE carrying (l, b). Output:
    // final state + 1-day and 7-day linear forecasts per event type.
    GraftQuery(
      "q_holt",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables(s, dir, "events")
          .select(col("event_type"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast(LongType).as("d"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("c"))
          .groupBy("event_type", "d").agg(sum("c").as("p"))
          .as[(String, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (et, it) =>
            val ys = it.toArray.sortBy(_._2).map(_._3)
            if (ys.length < 2) Iterator.empty
            else {
              var l = ys(0)
              var b = ys(1) - ys(0)
              var i = 1
              while (i < ys.length) {
                val l2 = (ys(i) + l + b) / 2
                b = (l2 - l + b) / 2
                l = l2
                i += 1
              }
              Iterator.single((et, ys.length.toLong, l, b, l + b, l + 7 * b))
            }
          }
          .toDF("event_type", "n_days", "level", "trend", "fc_1", "fc_7")
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT event_type,
             |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS p
             |  FROM events GROUP BY 1, 2),
             |seq AS (
             |  SELECT event_type, p,
             |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM daily),
             |hw(event_type, rn, n, l, b) AS (
             |  SELECT s1.event_type, CAST(2 AS BIGINT), s1.n,
             |    (s2.p + s1.p + (s2.p - s1.p)) // 2,
             |    (((s2.p + s1.p + (s2.p - s1.p)) // 2) - s1.p + (s2.p - s1.p)) // 2
             |  FROM seq s1 JOIN seq s2
             |    ON s2.event_type = s1.event_type AND s1.rn = 1 AND s2.rn = 2
             |  WHERE s1.n >= 2
             |  UNION ALL
             |  SELECT h.event_type, h.rn + 1, h.n,
             |    (s.p + h.l + h.b) // 2,
             |    (((s.p + h.l + h.b) // 2) - h.l + h.b) // 2
             |  FROM hw h JOIN seq s
             |    ON s.event_type = h.event_type AND s.rn = h.rn + 1)
             |SELECT event_type, n AS n_days, l AS level, b AS trend,
             |  l + b AS fc_1, l + 7 * b AS fc_7
             |FROM hw WHERE rn = n ORDER BY event_type""".stripMargin),
    ),

    // Wald's sequential probability ratio test (SPRT) — the SEQUENTIAL
    // twin of q_ab_test's fixed-horizon comparison: walk the
    // (ts, event_id)-ordered trial stream accumulating the binomial
    // log-likelihood ratio for H1: p = 0.25 vs H0: p = 0.15 (trial =
    // any event, success = purchase), and stop at the first crossing of
    // the ln((1−β)/α) = ±ln 19 bounds (α = β = 0.05). Per-trial LLR
    // increments are the two CONSTANTS ln(p1/p0) / ln((1−p1)/(1−p0))
    // quantized once to micros, so the cumulative walk is an exact
    // BIGINT window sum and "first crossing" is an integer comparison —
    // the whole test is a distributed prefix sum — a per-day cumulative
    // window plus a global offset window over the DAY aggregates (grid-
    // bounded), never one all-rows window — and "first crossing" is one
    // min() over crossing positions. Output: one row (n_trials,
    // n_at_decision, decision, llr_micros at the decision point; the
    // decision row falls back to the last trial when the walk never
    // exits the continue band).
    GraftQuery(
      "q_sprt",
      (s, dir) => {
        val up = math.floor(math.log(0.25 / 0.15) * 1e6 + 0.5).toLong
        val dn = math.floor(math.log(0.75 / 0.85) * 1e6 + 0.5).toLong
        val bound = math.floor(math.log(19.0) * 1e6 + 0.5).toLong
        val wDay = Window.partitionBy("day").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDays = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inDay = Tables(s, dir, "events")
          .select(col("ts"), col("event_id"),
            date_trunc("day", col("ts")).as("day"),
            when(col("event_type") === "purchase", lit(up)).otherwise(lit(dn))
              .as("inc"))
          .withColumn("llr_in", sum("inc").over(wDay))
          .withColumn("rn_in", count(lit(1)).over(wDay))
        val offsets = inDay.groupBy("day")
          .agg(sum("inc").as("dsum"), count(lit(1)).as("dcnt"))
          .withColumn("off_llr", sum("dsum").over(wDays) - col("dsum"))
          .withColumn("off_rn", sum("dcnt").over(wDays) - col("dcnt"))
          .select("day", "off_llr", "off_rn")
        val walk = inDay.join(broadcast(offsets), Seq("day"))
          .select((col("off_llr") + col("llr_in")).as("llr"),
            (col("off_rn") + col("rn_in")).as("rn"))
          .localCheckpoint(false)
        val firstCross = walk
          .filter(col("llr") >= bound || col("llr") <= -bound)
          .agg(min("rn").as("nd"))
        walk.crossJoin(broadcast(firstCross))
          .withColumn("nt", max("rn").over(Window.partitionBy()))
          .filter(col("rn") === coalesce(col("nd"), col("nt")))
          .select(col("nt").as("n_trials"), col("rn").as("n_at_decision"),
            when(col("llr") >= bound, "accept_h1")
              .when(col("llr") <= -bound, "accept_h0")
              .otherwise("continue").as("decision"),
            col("llr").as("llr_micros"))
      },
      Some {
        val up = math.floor(math.log(0.25 / 0.15) * 1e6 + 0.5).toLong
        val dn = math.floor(math.log(0.75 / 0.85) * 1e6 + 0.5).toLong
        val bound = math.floor(math.log(19.0) * 1e6 + 0.5).toLong
        s"""WITH walk AS (
           |  SELECT
           |    CAST(sum(CASE WHEN event_type = 'purchase' THEN $up ELSE $dn END)
           |      OVER w AS BIGINT) AS llr,
           |    CAST(count(*) OVER w AS BIGINT) AS rn
           |  FROM events
           |  WINDOW w AS (ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |cross_at AS (
           |  SELECT min(rn) AS nd FROM walk
           |  WHERE llr >= $bound OR llr <= -$bound),
           |tot AS (SELECT max(rn) AS nt FROM walk)
           |SELECT t.nt AS n_trials, w.rn AS n_at_decision,
           |  CASE WHEN w.llr >= $bound THEN 'accept_h1'
           |       WHEN w.llr <= -$bound THEN 'accept_h0'
           |       ELSE 'continue' END AS decision,
           |  w.llr AS llr_micros
           |FROM walk w, cross_at c, tot t
           |WHERE w.rn = coalesce(c.nd, t.nt)""".stripMargin
      },
    ),

    // SAX symbolization (Lin et al. 2003) of each user's daily-spend
    // series: integer-cent daily totals → per-user z-normalization →
    // 5-day PAA segment means → symbols from the standard Gaussian
    // breakpoints for alphabet 4 (−0.6745, 0, 0.6745). The symbol table
    // is what a 100 TB motif/anomaly pipeline indexes instead of raw
    // series: two user-keyed partial aggregates and a broadcast-joined
    // stats frame, output bounded by users × segments. All moments are
    // exact BIGINT cent sums; z is ONE double expression (the q_agg_ucl
    // sqrt pattern); a flat series (σ = 0) maps to 'c' (z = 0) by
    // convention.
    GraftQuery(
      "q_sax",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast(LongType).as("d"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast(LongType).as("c"))
          .groupBy("user_id", "d").agg(sum("c").as("p"))
        val stats = daily.groupBy("user_id").agg(
          count(lit(1)).as("nd"), sum("p").as("sp"),
          sum(col("p") * col("p")).as("sp2"))
        val segs = daily.withColumn("seg", (col("d") / lit(5L)).cast(LongType))
          .groupBy("user_id", "seg")
          .agg(count(lit(1)).as("n_days"), sum("p").as("ssum"))
        val d = (c: Column) => c.cast("double")
        val mu = d(col("sp")) / d(col("nd"))
        val sd = sqrt(greatest(lit(0.0),
          d(col("sp2")) / d(col("nd")) - (d(col("sp")) / d(col("nd"))) * (d(col("sp")) / d(col("nd")))))
        val z = when(sd > 0, (d(col("ssum")) / d(col("n_days")) - mu) / sd)
          .otherwise(lit(0.0))
        segs.join(stats, Seq("user_id"))
          .select(col("user_id"), col("seg"), col("n_days"),
            when(z < -0.6745, "a").when(z < 0.0, "b")
              .when(z < 0.6745, "c").otherwise("d").as("symbol"))
          .orderBy("user_id", "seg")
      },
      Some("""WITH daily AS (
             |  SELECT user_id,
             |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS p
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT user_id, count(*) AS nd,
             |    CAST(sum(p) AS BIGINT) AS sp, CAST(sum(p * p) AS BIGINT) AS sp2
             |  FROM daily GROUP BY 1),
             |segs AS (
             |  SELECT user_id, d // 5 AS seg, count(*) AS n_days,
             |    CAST(sum(p) AS BIGINT) AS ssum
             |  FROM daily GROUP BY 1, 2),
             |z AS (
             |  SELECT g.user_id, g.seg, g.n_days,
             |    CASE WHEN sqrt(greatest(0.0,
             |        CAST(s.sp2 AS DOUBLE) / CAST(s.nd AS DOUBLE)
             |        - (CAST(s.sp AS DOUBLE) / CAST(s.nd AS DOUBLE))
             |          * (CAST(s.sp AS DOUBLE) / CAST(s.nd AS DOUBLE)))) > 0
             |      THEN (CAST(g.ssum AS DOUBLE) / CAST(g.n_days AS DOUBLE)
             |        - CAST(s.sp AS DOUBLE) / CAST(s.nd AS DOUBLE))
             |        / sqrt(greatest(0.0,
             |          CAST(s.sp2 AS DOUBLE) / CAST(s.nd AS DOUBLE)
             |          - (CAST(s.sp AS DOUBLE) / CAST(s.nd AS DOUBLE))
             |            * (CAST(s.sp AS DOUBLE) / CAST(s.nd AS DOUBLE))))
             |      ELSE 0.0 END AS z
             |  FROM segs g JOIN stats s USING (user_id))
             |SELECT user_id, seg, n_days,
             |  CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
             |       WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol
             |FROM z ORDER BY user_id, seg""".stripMargin),
    ),

    // Per-group OLS trend fit: SQL-standard regr_slope/intercept/r2 of
    // value on days-since-epoch-origin — the drift detector every metrics
    // warehouse runs. One partial-aggregated groupBy (regr_* state is 6
    // doubles per group, map-side combinable); transcendental-free but
    // accumulation-order-sensitive, so outputs carry the same 1e-4
    // primitive-rounding guard as q_stats_corr.
    GraftQuery(
      "q_linreg",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("x",
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast(DoubleType))
        e.groupBy("event_type").agg(
            (floor(regr_slope(col("value"), col("x")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("slope"),
            (floor(regr_intercept(col("value"), col("x")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("intercept"),
            (floor(regr_r2(col("value"), col("x")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("r2"),
            regr_count(col("value"), col("x")).cast(LongType).as("n"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type, value,
             |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x
             |  FROM events
             |)
             |SELECT event_type,
             |  floor(regr_slope(value, x) * 1e4 + 0.5) / 1e4 AS slope,
             |  floor(regr_intercept(value, x) * 1e4 + 0.5) / 1e4 AS intercept,
             |  floor(regr_r2(value, x) * 1e4 + 0.5) / 1e4 AS r2,
             |  CAST(regr_count(value, x) AS BIGINT) AS n
             |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),

    // CUSUM changepoint series: per key, the running sum of deviations
    // from the key's mean (cusum_i = S_i − i·μ), whose |max| marks the
    // most likely level-shift point. One shuffle on the key; both windows
    // (running and whole-partition) share the same exchange. Float
    // discipline: S_i and the total accumulate in DECIMAL(38,6) — exact
    // and order-insensitive under any merge tree (a double running sum
    // would be partition-order-dependent) — with double math only in the
    // final per-row expression, identically parenthesized in the oracle.
    GraftQuery(
      "q_cusum",
      (s, dir) => {
        val byTs = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        val wRun = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        val d = Tables(s, dir, "events")
          .withColumn("s_i", sum(col("value").cast(DecimalType(38, 6))).over(wRun).cast(DoubleType))
          .withColumn("i", row_number().over(byTs).cast(LongType))
          .withColumn("t", sum(col("value").cast(DecimalType(38, 6))).over(wAll).cast(DoubleType))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("cusum", col("s_i") - col("i") * (col("t") / col("n")))
        d.select(col("event_type"), col("event_id"), col("i"),
            (floor(col("cusum") * lit(1e6) + lit(0.5)) / lit(1e6)).as("cusum"),
            (row_number().over(
              Window.partitionBy("event_type").orderBy(abs(col("cusum")).desc, col("event_id"))) === 1)
              .as("is_peak"))
          .orderBy("event_type", "i")
      },
      Some("""WITH b AS (
             |  SELECT event_type, event_id,
             |    CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
             |      PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s_i,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS i,
             |    CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) AS DOUBLE) AS t,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events
             |),
             |c AS (
             |  SELECT event_type, event_id, i, s_i - i * (t / n) AS cusum FROM b
             |)
             |SELECT event_type, event_id, i,
             |  floor(cusum * 1e6 + 0.5) / 1e6 AS cusum,
             |  row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, event_id) = 1 AS is_peak
             |FROM c ORDER BY event_type, i""".stripMargin),
    ),

    // The SAME cusum series through the scale path: q_cusum's
    // Window.partitionBy(event_type) puts each key's entire history in
    // ONE task (5 keys -> 5-way parallelism, unbounded task heap at
    // 100 TB). Here [[Scale.chunkedPrefixSums]] chunks by day — running
    // sums within (key, day), a tiny cross-chunk offset window, one
    // co-partitioned join — and the peak is an argmax AGGREGATE
    // (max(struct), map-side combinable) instead of a per-key ranking
    // window. The oracle is LITERALLY q_cusum's serial-window SQL:
    // decimal-exact accumulation makes the two-phase result
    // bit-identical, so the hash gate proves scalable ≡ serial.
    GraftQuery(
      "q_cusum_scaled",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val pre = Scale.chunkedPrefixSums(
          e, "event_type", Seq(col("ts"), col("event_id")), to_date(col("ts")),
          Seq("s_dec" -> col("value").cast(DecimalType(38, 6)), "i_l" -> lit(1L)))
        val tot = e.groupBy("event_type").agg(
          sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType).as("t"),
          count(lit(1)).as("n"))
        val c = pre.join(broadcast(tot), "event_type")
          .withColumn("s_i", col("s_dec").cast(DoubleType))
          .withColumn("i", col("i_l").cast(LongType))
          .withColumn("cusum", col("s_i") - col("i") * (col("t") / col("n")))
        // argmax by (|cusum| desc, event_id asc) without a ranking window:
        // max(struct) takes the largest |cusum|, ties resolve to the max
        // negated id = the smallest event_id — row_number's tiebreak.
        val peak = c.groupBy("event_type")
          .agg(max(struct(abs(col("cusum")).as("a"), (-col("event_id")).as("nid"))).as("pk"))
          .select(col("event_type"), (-col("pk.nid")).as("peak_id"))
        c.join(broadcast(peak), "event_type")
          .select(col("event_type"), col("event_id"), col("i"),
            (floor(col("cusum") * lit(1e6) + lit(0.5)) / lit(1e6)).as("cusum"),
            (col("event_id") === col("peak_id")).as("is_peak"))
          .orderBy("event_type", "i")
      },
      Some("""WITH b AS (
             |  SELECT event_type, event_id,
             |    CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (
             |      PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS s_i,
             |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT) AS i,
             |    CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) AS DOUBLE) AS t,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events
             |),
             |c AS (
             |  SELECT event_type, event_id, i, s_i - i * (t / n) AS cusum FROM b
             |)
             |SELECT event_type, event_id, i,
             |  floor(cusum * 1e6 + 0.5) / 1e6 AS cusum,
             |  row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, event_id) = 1 AS is_peak
             |FROM c ORDER BY event_type, i""".stripMargin),
    ),

    // Per-group z-score anomaly flags: moments via exact decimal sums (the
    // UCL recipe — order-insensitive, then identical double math on both
    // engines), broadcast back onto the stream, |z| > 3 flags outliers.
    // A zero stddev (constant group) yields z = 0, never a division blowup.
    GraftQuery(
      "q_anomaly",
      (s, dir) => {
        val e = Tables(s, dir, "events")
        val m = e.groupBy("event_type").agg(
          sum(col("value").cast(DecimalType(30, 10))).cast(DoubleType).as("sm"),
          sum((col("value") * col("value")).cast(DecimalType(30, 10))).cast(DoubleType).as("s2"),
          count(lit(1)).as("n"))
        val mean = col("sm") / col("n")
        val sd = sqrt(greatest(lit(0.0), col("s2") / col("n") - (col("sm") / col("n")) * (col("sm") / col("n"))))
        e.join(broadcast(m), "event_type")
          .select(col("event_id"), col("event_type"), col("value"),
            (floor(when(sd === 0.0, lit(0.0))
              .otherwise((col("value") - mean) / sd) * lit(1e4) + lit(0.5)) / lit(1e4)).as("z"),
            when(sd === 0.0, lit(false))
              .otherwise(abs((col("value") - mean) / sd) > 3.0).as("is_anomaly"))
          .orderBy("event_id")
      },
      Some("""WITH m AS (
             |  SELECT event_type,
             |    CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sm,
             |    CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2,
             |    count(*) AS n
             |  FROM events GROUP BY event_type
             |)
             |SELECT event_id, e.event_type, value,
             |  floor((CASE WHEN sqrt(greatest(0.0, s2 / n - (sm / n) * (sm / n))) = 0.0 THEN 0.0
             |    ELSE (value - sm / n) / sqrt(greatest(0.0, s2 / n - (sm / n) * (sm / n))) END)
             |    * 1e4 + 0.5) / 1e4 AS z,
             |  CASE WHEN sqrt(greatest(0.0, s2 / n - (sm / n) * (sm / n))) = 0.0 THEN FALSE
             |    ELSE abs((value - sm / n) / sqrt(greatest(0.0, s2 / n - (sm / n) * (sm / n)))) > 3.0 END AS is_anomaly
             |FROM events e JOIN m ON m.event_type = e.event_type
             |ORDER BY event_id""".stripMargin),
    ),

    // Inactivity-gap sessionization with explicit session ids: a session
    // breaks after >30 min of silence; ids are per-user ordinals so any
    // downstream stage can group on (user, session). Three window
    // functions, ONE partitioning — Spark plans a single exchange on
    // user_id and reuses its sort for all of them. (session_window —
    // q_window_tumbling's cousin — aggregates per session; this keeps
    // every event row, which is what feature pipelines join against.)
    // Seconds via truncated epoch on both engines (the established
    // unix_timestamp parity recipe).
    GraftQuery(
      "q_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts").cast("long").as("secs"))
          .withColumn("is_new",
            when(lag("secs", 1).over(w).isNull ||
              col("secs") - lag("secs", 1).over(w) > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum("is_new").over(wRun))
          .withColumn("evt_in_session",
            row_number().over(Window.partitionBy("user_id", "session_id")
              .orderBy("secs", "event_id")).cast("long"))
          .select("event_id", "user_id", "session_id", "evt_in_session")
          .orderBy("event_id")
      },
      Some("""WITH s AS (
             |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs
             |  FROM events
             |),
             |f AS (
             |  SELECT *, CASE WHEN lag(secs) OVER w IS NULL
             |    OR secs - lag(secs) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
             |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY secs, event_id)
             |),
             |g AS (
             |  SELECT event_id, user_id, secs,
             |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY secs, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM f
             |)
             |SELECT event_id, user_id, session_id,
             |  CAST(row_number() OVER (PARTITION BY user_id, session_id
             |    ORDER BY secs, event_id) AS BIGINT) AS evt_in_session
             |FROM g ORDER BY event_id""".stripMargin),
    ),

    // Cohort retention: users bucketed by first-seen day, activity counted
    // per (cohort, day offset). The cohort frame is small (one row per
    // user) — broadcast back onto the stream; the retention grid is a
    // partial-aggregated groupBy.
    GraftQuery(
      "q_retention",
      (s, dir) => {
        val d = Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val cohort = d.groupBy("user_id").agg(min("day").as("cohort_day"))
        d.join(broadcast(cohort), "user_id")
          .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH d AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
             |),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
             |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
             |  count(DISTINCT d.user_id) AS n_users
             |FROM d JOIN c ON c.user_id = d.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),

    // Fixed-width histogram (data profiling): one partial-aggregated
    // groupBy on the computed bin — never an ntile/global sort.
    GraftQuery(
      "q_histogram",
      (s, dir) => {
        Tables(s, dir, "orders")
          .groupBy(floor(col("o_totalprice") / lit(25000.0)).as("bin"))
          .agg(count(lit(1)).as("n"),
            min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
          .orderBy("bin")
      },
      Some("""SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
             |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

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

    // As-of join: each event matched to its customer's most recent order at
    // or before the event time — the canonical Spark formulation (one union,
    // one shuffle+sort per key, last-value-ignore-nulls carry-forward), which
    // scales as a single window pass instead of a per-row range probe. The
    // right side is pre-reduced to one row per (key, time) so tie-breaking
    // is deterministic in both engines; the oracle uses DuckDB's native
    // ASOF JOIN.
    GraftQuery(
      "q_asof_join",
      (s, dir) => {
        val e = Tables(s, dir, "events")
          .select(col("user_id"), col("ts").as("t"), col("event_id"),
            lit(null).cast("long").as("o_orderkey"), lit(1).as("is_event"))
        val o = Tables(s, dir, "orders")
          .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("t"))
          .agg(max("o_orderkey").as("o_orderkey"))
          .select(col("user_id"), col("t"), lit(null).cast("long").as("event_id"),
            col("o_orderkey"), lit(0).as("is_event"))
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("is_event"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionByName(o)
          .withColumn("matched_order", last("o_orderkey", ignoreNulls = true).over(w))
          .filter(col("is_event") === 1)
          .select(col("event_id"), col("user_id"), col("matched_order"))
          .orderBy("event_id")
      },
      Some("""WITH ou AS (
             |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
             |  FROM orders GROUP BY o_custkey, o_orderdate
             |)
             |SELECT e.event_id, e.user_id, ou.o_orderkey AS matched_order
             |FROM events e ASOF LEFT JOIN ou
             |  ON e.user_id = ou.o_custkey AND e.ts >= ou.o_orderdate
             |ORDER BY e.event_id""".stripMargin),
    ),

    // Array + nested-struct surface (the reference's data model is flat —
    // SURVEY §1.1 "no arrays/maps/nested types"; the engine supports them):
    // list ops over the embedding column and a struct build/extract
    // round-trip, flattened back to scalars for the compare.
    GraftQuery(
      "q_array_struct",
      (s, dir) => {
        Tables(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            array_max(col("embedding")).cast("double").as("vmax"),
            array_min(col("embedding")).cast("double").as("vmin"),
            element_at(col("embedding"), 1).cast("double").as("first"),
            struct(col("vec_id").as("id"), col("label")).getField("label").as("label_rt"),
          )
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INTEGER) AS dim,
             |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
             |  CAST(list_min(embedding) AS DOUBLE) AS vmin,
             |  CAST(embedding[1] AS DOUBLE) AS first,
             |  struct_pack(id := vec_id, label := label).label AS label_rt
             |FROM embeddings ORDER BY vec_id""".stripMargin),
    ),

    // The remaining ranking-window family the reference never used (SURVEY
    // §2.5 notes only row_number appears): rank/dense_rank over a tied
    // ordering, lag/lead/ntile over a fully-deterministic ordering.
    GraftQuery(
      "q_window_ranks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wTies = Window.partitionBy("user_id").orderBy("event_type")
        val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .select(
            col("event_id"), col("user_id"),
            rank().over(wTies).as("rnk"),
            dense_rank().over(wTies).as("drnk"),
            lag("value", 1).over(wSeq).as("prev_value"),
            lead("value", 1).over(wSeq).as("next_value"),
            ntile(4).over(wSeq).as("quartile"),
          )
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  rank() OVER wt AS rnk,
             |  dense_rank() OVER wt AS drnk,
             |  lag(value) OVER ws AS prev_value,
             |  lead(value) OVER ws AS next_value,
             |  ntile(4) OVER ws AS quartile
             |FROM events
             |WINDOW wt AS (PARTITION BY user_id ORDER BY event_type),
             |       ws AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin),
    ),

    // Date/time function breadth: parts, truncation, arithmetic, diffs.
    GraftQuery(
      "q_date_fns",
      (s, dir) => {
        Tables(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            dayofweek(col("o_orderdate")).as("dow"),
            quarter(col("o_orderdate")).as("q"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
            datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
            date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
          )
          .orderBy("o_orderkey")
      },
      // DuckDB: dayofweek is 0-based Sunday; Spark 1-based Sunday — +1 aligns
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INTEGER) AS y,
             |  CAST(month(o_orderdate) AS INTEGER) AS m,
             |  CAST(day(o_orderdate) AS INTEGER) AS d,
             |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
             |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
             |FROM orders ORDER BY o_orderkey""".stripMargin),
    ),

    // String function breadth: pad/trim/translate/position/case/reverse.
    GraftQuery(
      "q_string_more",
      (s, dir) => {
        Tables(s, dir, "customer")
          .select(
            col("c_custkey"),
            lpad(col("c_mktsegment"), 12, "*").as("padded"),
            trim(lit(" x "), lit(" ")).as("trimmed"),
            translate(col("c_name"), "#", "-").as("translated"),
            upper(col("c_mktsegment")).as("up"),
            lower(col("c_name")).as("lo"),
            reverse(col("c_mktsegment")).as("rev"),
            instr(col("c_name"), "0").cast("long").as("pos0"),
            substring(col("c_name"), 1, 8).as("head8"),
          )
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  lpad(c_mktsegment, 12, '*') AS padded,
             |  trim(' x ', ' ') AS trimmed,
             |  replace(c_name, '#', '-') AS translated,
             |  upper(c_mktsegment) AS up,
             |  lower(c_name) AS lo,
             |  reverse(c_mktsegment) AS rev,
             |  CAST(position('0' IN c_name) AS BIGINT) AS pos0,
             |  substr(c_name, 1, 8) AS head8
             |FROM customer ORDER BY c_custkey""".stripMargin),
    ),

    // Statistical aggregates: sample correlation and covariance per group
    // (same definitions both engines; transcendental values are boundary-safe
    // under primitive rounding).
    GraftQuery(
      "q_stats_corr",
      (s, dir) => {
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            (floor(corr(col("l_quantity"), col("l_extendedprice")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("corr_qty_price"),
            (floor(covar_samp(col("l_quantity"), col("l_discount")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("cov_qty_disc"),
            count(lit(1)).as("n"),
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  floor(corr(l_quantity, l_extendedprice) * 1e4 + 0.5) / 1e4 AS corr_qty_price,
             |  floor(covar_samp(l_quantity, l_discount) * 1e4 + 0.5) / 1e4 AS cov_qty_disc,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // Pivot: per-user value totals spread across event-type columns (the
    // oracle is the equivalent conditional aggregation — identical results).
    GraftQuery(
      "q_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(sum(col("value").cast(DecimalType(30, 6))).cast(DoubleType))
          .na.fill(0.0, types)
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  coalesce(CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE), 0.0) AS click,
             |  coalesce(CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE), 0.0) AS error,
             |  coalesce(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE), 0.0) AS purchase,
             |  coalesce(CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE), 0.0) AS signup,
             |  coalesce(CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(30,6)) END) AS DOUBLE), 0.0) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // Semi/anti joins (EXISTS / NOT EXISTS): customers with and without
    // open orders, as labeled counts.
    GraftQuery(
      "q_semi_anti",
      (s, dir) => {
        val s_ = s
        import s_.implicits._
        val cust = Tables(s, dir, "customer").select("c_custkey")
        val open = Tables(s, dir, "orders")
          .filter(col("o_orderstatus") === "O").select("o_custkey")
          .withColumnRenamed("o_custkey", "c_custkey")
        val semi = cust.join(open, Seq("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_open").as("kind"), $"n")
        val anti = cust.join(open, Seq("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_open").as("kind"), $"n")
        semi.union(anti).orderBy("kind")
      },
      Some("""SELECT 'with_open' AS kind, count(*) AS n FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             |UNION ALL
             |SELECT 'without_open', count(*) FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             |ORDER BY kind""".stripMargin),
    ),

    // Generator/UDTF surface (LATERAL VIEW explode): global word frequencies.
    GraftQuery(
      "q_explode_words",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w"))
      },
      Some("""SELECT w, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |GROUP BY w ORDER BY n DESC, w""".stripMargin),
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

    // Keyed interval-overlap join: per-user purchase sessions × day-padded
    // error windows. Both sides are big (event-derived) — the shape
    // broadcast banding (q_range_join) can't take.
    GraftQuery(
      "q_interval_join",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
        val p = Tables(s, dir, "events").filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts").cast("long").as("secs"))
          .withColumn("is_new",
            when(lag("secs", 1).over(w).isNull ||
              col("secs") - lag("secs", 1).over(w) > 1800, 1L).otherwise(0L))
          .withColumn("sid", sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val sess = p.groupBy("user_id", "sid")
          .agg(min("secs").as("ls"), max("secs").as("le"))
        val err = Tables(s, dir, "events").filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"),
            (col("ts").cast("long") - 86400L).as("rs"),
            (col("ts").cast("long") + 86400L).as("re"))
        intervalOverlapJoin(sess, err, "user_id", "ls", "le", "rs", "re", 86400L)
          .select("user_id", "sid", "event_id", "ls", "le", "rs", "re", "overlap_secs")
          .orderBy("user_id", "sid", "event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs
             |  FROM events WHERE event_type = 'purchase'
             |),
             |f AS (
             |  SELECT *, CASE WHEN lag(secs) OVER w IS NULL
             |    OR secs - lag(secs) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
             |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY secs, event_id)
             |),
             |g AS (
             |  SELECT user_id, secs, CAST(sum(is_new) OVER (PARTITION BY user_id
             |    ORDER BY secs, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |  FROM f
             |),
             |sess AS (SELECT user_id, sid, min(secs) AS ls, max(secs) AS le
             |         FROM g GROUP BY 1, 2),
             |err AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) - 86400 AS rs,
             |    CAST(floor(epoch(ts)) AS BIGINT) + 86400 AS re
             |  FROM events WHERE event_type = 'error'
             |)
             |SELECT s.user_id, s.sid, e.event_id, s.ls, s.le, e.rs, e.re,
             |  least(s.le, e.re) - greatest(s.ls, e.rs) AS overlap_secs
             |FROM sess s JOIN err e ON s.user_id = e.user_id
             |  AND s.ls <= e.re AND e.rs <= s.le
             |ORDER BY s.user_id, s.sid, e.event_id""".stripMargin),
    ),

    // Per-key exponentially-weighted moving average: alpha = 1/2 over the
    // current + 7 preceding purchases, weights renormalized to the rows
    // actually present. A rows-frame window — ONE exchange on user_id.
    // alpha = 1/2 keeps every weight a small power of two, so each product
    // is EXACT in IEEE double and both engines add the same 8 terms in the
    // same left-to-right order — bit-identical before the output rounding.
    // (An unbounded recursive EWMA is a running fold — that shape lives in
    // streaming state, q_stateful_classify; the bounded-window form is the
    // batch-friendly one: at 100 TB it stays a single window pass with no
    // per-key sequential dependency longer than the frame.)
    GraftQuery(
      "q_ewma",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
        val lags = (0 until 8).map { k =>
          val v = if (k == 0) col("value") else lag("value", k).over(w)
          (v, lit(math.pow(0.5, k)))
        }
        val num = lags.map { case (v, wt) => when(v.isNotNull, v * wt).otherwise(lit(0.0)) }.reduce(_ + _)
        val den = lags.map { case (v, wt) => when(v.isNotNull, wt).otherwise(lit(0.0)) }.reduce(_ + _)
        Tables(s, dir, "events").filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("secs"), col("value"))
          .withColumn("ewma", floor(num / den * lit(1e6) + lit(0.5)) / lit(1e6))
          .drop("secs")
          .orderBy("event_id")
      },
      Some {
        val num = (0 until 8).map { k =>
          val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"(CASE WHEN $v IS NOT NULL THEN $v * ${math.pow(0.5, k)} ELSE 0.0 END)"
        }.mkString(" + ")
        val den = (0 until 8).map { k =>
          val v = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"(CASE WHEN $v IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END)"
        }.mkString(" + ")
        s"""SELECT event_id, user_id, value,
           |  floor(($num) / ($den) * 1e6 + 0.5) / 1e6 AS ewma
           |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs, value
           |      FROM events WHERE event_type = 'purchase')
           |WINDOW w AS (PARTITION BY user_id ORDER BY secs, event_id)
           |ORDER BY event_id""".stripMargin
      },
    ),

    // Robust outlier flags via median/MAD — the heavy-tail-safe twin of
    // q_anomaly's z-score (one wild value drags a mean+stddev control band;
    // the median and MAD barely move). Two grouped EXACT percentile
    // aggregates (already pinned engine-equal by q_quantiles), each median
    // quantized before reuse so downstream arithmetic starts from identical
    // doubles; group stats are group-count-sized → broadcast back onto the
    // stream. Scale note: exact percentile sorts each group's values — at
    // 100 TB swap approx_percentile into the same shape (the operator
    // contract keeps the quantize-then-broadcast structure).
    GraftQuery(
      "q_mad_outlier",
      (s, dir) => {
        val e = Tables(s, dir, "events").select("event_id", "event_type", "value")
        val med = e.groupBy("event_type").agg(
          (floor(expr("percentile(value, 0.5)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("med"))
        val dev = e.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type").agg(
          (floor(expr("percentile(dev, 0.5)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("mad"))
        val rz = floor((col("value") - col("med")) * lit(0.6745) / col("mad") * lit(1e4) + lit(0.5)) / lit(1e4)
        dev.join(broadcast(mad), "event_type")
          .select(col("event_id"), col("event_type"), col("value"), col("med"), col("mad"),
            when(col("mad") === 0.0, lit(0.0)).otherwise(rz).as("robust_z"),
            when(col("mad") === 0.0, lit(false))
              .otherwise(abs(floor((col("value") - col("med")) * lit(0.6745) / col("mad") * lit(1e4) + lit(0.5)) / lit(1e4)) > 3.5)
              .as("is_outlier"))
          .orderBy("event_id")
      },
      Some("""WITH med AS (
             |  SELECT event_type,
             |    floor(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS med
             |  FROM events GROUP BY event_type
             |),
             |dev AS (
             |  SELECT e.event_id, e.event_type, e.value, m.med,
             |    abs(e.value - m.med) AS dev
             |  FROM events e JOIN med m ON m.event_type = e.event_type
             |),
             |mad AS (
             |  SELECT event_type,
             |    floor(quantile_cont(dev, 0.5) * 1e6 + 0.5) / 1e6 AS mad
             |  FROM dev GROUP BY event_type
             |)
             |SELECT d.event_id, d.event_type, d.value, d.med, a.mad,
             |  CASE WHEN a.mad = 0.0 THEN 0.0
             |    ELSE floor((d.value - d.med) * 0.6745 / a.mad * 1e4 + 0.5) / 1e4 END AS robust_z,
             |  CASE WHEN a.mad = 0.0 THEN FALSE
             |    ELSE abs(floor((d.value - d.med) * 0.6745 / a.mad * 1e4 + 0.5) / 1e4) > 3.5 END AS is_outlier
             |FROM dev d JOIN mad a ON a.event_type = d.event_type
             |ORDER BY d.event_id""".stripMargin),
    ),

    // First-order Markov transition matrix over per-user event sequences:
    // P(next_type | type) — the behavioral-model primitive behind both
    // fraud sequence scoring and synthetic-session generation. One
    // exchange on user_id for the lead(), one agg shuffle on (src, dst);
    // the per-src normalizer is a window over the tiny transition matrix
    // (|types|² rows), so no third data-sized shuffle. Scales: the matrix
    // is bounded by the type-vocabulary square regardless of corpus size.
    GraftQuery(
      "q_markov",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
        val tr = Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("ts").cast("long").as("secs"), col("event_type"))
          .withColumn("dst", lead("event_type", 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("cnt"))
        tr.select(col("src"), col("dst"), col("cnt"),
            (floor(col("cnt").cast(DoubleType) /
              sum("cnt").over(Window.partitionBy("src")).cast(DoubleType)
              * lit(1e6) + lit(0.5)) / lit(1e6)).as("p"))
          .orderBy("src", "dst")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs, event_type
             |  FROM events),
             |t AS (
             |  SELECT event_type AS src,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY secs, event_id) AS dst
             |  FROM e),
             |c AS (SELECT src, dst, count(*) AS cnt FROM t WHERE dst IS NOT NULL GROUP BY 1, 2)
             |SELECT src, dst, cnt,
             |  floor(CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY src) AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS p
             |FROM c ORDER BY src, dst""".stripMargin),
    ),

    // Benford first-significant-digit profile of order totals — the
    // classic book-cooking screen: log-uniform processes put digit d at
    // log10(1 + 1/d); fabricated amounts don't. Digit via
    // floor(x / 10^floor(log10 x)) — identical IEEE double ops on both
    // engines. A 9-row result from one agg shuffle; scales trivially.
    GraftQuery(
      "q_benford",
      (s, dir) => {
        val x = col("o_totalprice")
        // digits feeds both the output and its own normalizer — materialize
        // the 9-row aggregate once or the orders scan replays per leg
        val digits = Tables(s, dir, "orders")
          .filter(x > 0.0)
          .select(floor(x / pow(lit(10.0), floor(log10(x)))).cast(LongType).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false)
        val total = digits.groupBy().agg(sum("cnt").as("__t"))
        digits.crossJoin(broadcast(total))
          .withColumn("share",
            floor(col("cnt").cast(DoubleType) /
              col("__t").cast(DoubleType) * lit(1e6) + lit(0.5)) / lit(1e6))
          .drop("__t")
          .withColumn("expected",
            floor(log10(lit(1.0) + lit(1.0) / col("digit").cast(DoubleType)) * lit(1e6) + lit(0.5)) / lit(1e6))
          .select("digit", "cnt", "share", "expected")
          .orderBy("digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(floor(o_totalprice / pow(10.0, floor(log10(o_totalprice)))) AS BIGINT) AS digit
             |  FROM orders WHERE o_totalprice > 0.0),
             |c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY 1)
             |SELECT digit, cnt,
             |  floor(CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER () AS DOUBLE) * 1e6 + 0.5) / 1e6 AS share,
             |  floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS expected
             |FROM c ORDER BY digit""".stripMargin),
    ),

    // Per-segment winsorization: clamp account balances to the exact
    // interpolated [p05, p95] of their market segment — the standard
    // robust-feature step before training. Percentiles are quantized to
    // 1e6 BEFORE the clamp (the q_mad_outlier recipe) so both engines
    // compare against identical doubles; the clamp itself is then exact.
    // Group stats are segment-count-sized → broadcast back; one agg
    // shuffle + one map-side join, scales.
    GraftQuery(
      "q_winsorize",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val qs = c.groupBy("c_mktsegment").agg(
          (floor(expr("percentile(c_acctbal, 0.05)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("lo"),
          (floor(expr("percentile(c_acctbal, 0.95)") * lit(1e6) + lit(0.5)) / lit(1e6)).as("hi"))
        c.join(broadcast(qs), "c_mktsegment")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            least(greatest(col("c_acctbal"), col("lo")), col("hi")).as("clamped"))
          .orderBy("c_custkey")
      },
      Some("""WITH q AS (
             |  SELECT c_mktsegment,
             |    floor(quantile_cont(c_acctbal, 0.05) * 1e6 + 0.5) / 1e6 AS lo,
             |    floor(quantile_cont(c_acctbal, 0.95) * 1e6 + 0.5) / 1e6 AS hi
             |  FROM customer GROUP BY 1)
             |SELECT c_custkey, c.c_mktsegment, c_acctbal,
             |  least(greatest(c_acctbal, lo), hi) AS clamped
             |FROM customer c JOIN q ON q.c_mktsegment = c.c_mktsegment
             |ORDER BY c_custkey""".stripMargin),
    ),

    // 2-D skyline (Pareto frontier): parts no other part dominates
    // (higher-or-equal price AND smaller-or-equal size, one strict). The
    // naive form is an O(n²) NOT EXISTS self-join; the scalable form used
    // here is a telescoped running min — collapse to one row per distinct
    // price (data-sized agg, one shuffle), then the strictly-higher-price
    // running min of size via [[Scale.bucketedPrefixMin]]: prices bucket
    // by value, the exclusive min runs inside each bucket in parallel,
    // and cross-bucket state is a bucket-count-bounded broadcast — no
    // unpartitioned window over the distinct-price frame (value-domain-
    // bounded at this sf, but distinct prices at corpus scale are not
    // small; the serial-window twin stays in the DuckDB oracle, so the
    // hash gate proves scalable ≡ serial). A part survives iff no
    // strictly-higher price saw size ≤ its own and no equal-price row
    // beats it strictly.
    GraftQuery(
      "q_skyline",
      (s, dir) => {
        val g = Tables(s, dir, "part")
          .groupBy(col("p_retailprice").as("price")).agg(min("p_size").as("msz"))
        val r = Scale.bucketedPrefixMin(g, "price", descending = true, "msz", "mh")
        Tables(s, dir, "part")
          .join(r, col("p_retailprice") === col("price"))
          .filter(!coalesce(col("mh") <= col("p_size"), lit(false)) &&
            !(col("msz") < col("p_size")))
          .select("p_partkey", "p_retailprice", "p_size")
          .orderBy("p_partkey")
      },
      Some("""WITH g AS (
             |  SELECT p_retailprice AS price, min(p_size) AS msz
             |  FROM part GROUP BY 1),
             |r AS (
             |  SELECT price, msz,
             |    min(msz) OVER (ORDER BY price DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mh
             |  FROM g)
             |SELECT p_partkey, p_retailprice, p_size
             |FROM part JOIN r ON price = p_retailprice
             |WHERE NOT coalesce(mh <= p_size, FALSE) AND NOT (msz < p_size)
             |ORDER BY p_partkey""".stripMargin),
    ),

    // Gaps-and-islands: maximal runs of consecutive active days per user.
    // day − dense-ordinal is constant within a run (the classic trick), so
    // islands fall out of one groupBy — no self-join, no iteration; ONE
    // exchange on user_id serves the distinct, the window, and the final
    // group. The coverage-gap report ("activity streaks", data freshness
    // audits) is this operator.
    GraftQuery(
      "q_gap_islands",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("day")
        Tables(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          // partition by user only: hashpartitioning(user_id) satisfies the
          // (user_id, day) distinct AND the window AND the island groupBy,
          // so the whole pipeline rides ONE exchange
          .repartition(col("user_id"))
          .distinct()
          .withColumn("grp", datediff(col("day"), lit("1970-01-01")) -
            row_number().over(w))
          .groupBy("user_id", "grp")
          .agg(min("day").as("start_day"), max("day").as("end_day"),
            count(lit(1)).as("n_days"))
          .select(col("user_id"),
            date_format(col("start_day"), "yyyy-MM-dd").as("start_day"),
            date_format(col("end_day"), "yyyy-MM-dd").as("end_day"), col("n_days"))
          .orderBy("user_id", "start_day")
      },
      Some("""WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |g AS (
             |  SELECT user_id, day,
             |    CAST(day - DATE '1970-01-01' AS BIGINT) -
             |      row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
             |  FROM d)
             |SELECT user_id,
             |  strftime(min(day), '%Y-%m-%d') AS start_day,
             |  strftime(max(day), '%Y-%m-%d') AS end_day,
             |  count(*) AS n_days
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, start_day""".stripMargin),
    ),

    // Two-sample Welch test between event cohorts (purchase vs click
    // values): means and the t statistic from EXACT decimal moments — one
    // partial-aggregated scan, a 2-row pivot, all the statistics arithmetic
    // on broadcast scalars. The experiment-readout primitive: at 100 TB
    // the only data-sized work is the moment aggregation, which map-side
    // combines. Sample variance (n−1); identical double math both engines
    // from identical exact sums.
    GraftQuery(
      "q_ab_test",
      (s, dir) => {
        val m = Tables(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy("event_type").agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(30, 10))).cast(DoubleType).as("sm"),
            sum((col("value") * col("value")).cast(DecimalType(30, 10))).cast(DoubleType).as("s2"))
          .localCheckpoint(false) // 2 rows, feeds both pivot legs
        val a = m.filter(col("event_type") === "purchase")
          .select(col("n").as("na"), col("sm").as("sma"), col("s2").as("s2a"))
        val b = m.filter(col("event_type") === "click")
          .select(col("n").as("nb"), col("sm").as("smb"), col("s2").as("s2b"))
        val mean = (sm: Column, n: Column) => sm / n.cast(DoubleType)
        val varS = (sm: Column, s2: Column, n: Column) => {
          val nd = n.cast(DoubleType)
          (s2 - sm * sm / nd) / (nd - lit(1.0))
        }
        val r6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
        a.crossJoin(b).select(
          col("na"), col("nb"),
          r6(mean(col("sma"), col("na"))).as("mean_a"),
          r6(mean(col("smb"), col("nb"))).as("mean_b"),
          // n < 2 leaves the sample variance undefined: abstain with null
          // rather than emit an Inf/NaN statistic
          when(col("na") < 2 || col("nb") < 2, lit(null).cast(DoubleType))
            .otherwise(
              r6((mean(col("sma"), col("na")) - mean(col("smb"), col("nb"))) /
                sqrt(varS(col("sma"), col("s2a"), col("na")) / col("na").cast(DoubleType) +
                  varS(col("smb"), col("s2b"), col("nb")) / col("nb").cast(DoubleType))))
            .as("t_welch"))
      },
      Some("""WITH m AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sm,
             |    CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2
             |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
             |a AS (SELECT n AS na, sm AS sma, s2 AS s2a FROM m WHERE event_type = 'purchase'),
             |b AS (SELECT n AS nb, sm AS smb, s2 AS s2b FROM m WHERE event_type = 'click')
             |SELECT na, nb,
             |  floor(sma / CAST(na AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_a,
             |  floor(smb / CAST(nb AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_b,
             |  CASE WHEN na < 2 OR nb < 2 THEN NULL ELSE
             |  floor((sma / CAST(na AS DOUBLE) - smb / CAST(nb AS DOUBLE)) /
             |    sqrt((s2a - sma * sma / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) / CAST(na AS DOUBLE)
             |       + (s2b - smb * smb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) / CAST(nb AS DOUBLE))
             |    * 1e6 + 0.5) / 1e6 END AS t_welch
             |FROM a, b""".stripMargin),
    ),

    // Per-segment Gini concentration of positive account balances: rank
    // windows + Σi·x from exact decimal sums (i·x stays integral-decimal,
    // so accumulation order can't perturb the result), final Gini as one
    // double expression per segment. ONE exchange on the segment serves
    // the rank window and the aggregate — the wealth-concentration /
    // skew-audit primitive.
    GraftQuery(
      "q_gini",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        Tables(s, dir, "customer")
          .filter(col("c_acctbal") > 0.0)
          .withColumn("i", row_number().over(w))
          .groupBy("c_mktsegment").agg(
            count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(30, 6))).cast(DoubleType).as("sx"),
            sum((col("i") * col("c_acctbal")).cast(DecimalType(30, 6))).cast(DoubleType).as("six"))
          .select(col("c_mktsegment"), col("n"),
            (floor((lit(2.0) * col("six") - (col("n").cast(DoubleType) + lit(1.0)) * col("sx")) /
              (col("n").cast(DoubleType) * col("sx")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("gini"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH r AS (
             |  SELECT c_mktsegment, c_acctbal,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal, c_custkey) AS i
             |  FROM customer WHERE c_acctbal > 0.0)
             |SELECT c_mktsegment, count(*) AS n,
             |  floor((2.0 * CAST(sum(CAST(i * c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
             |    - (CAST(count(*) AS DOUBLE) + 1.0) * CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE))
             |    / (CAST(count(*) AS DOUBLE) * CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE))
             |    * 1e6 + 0.5) / 1e6 AS gini
             |FROM r GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
    ),

    // Touch attribution: each purchase credits the user's most recent
    // strictly-prior click (last-touch) and their first prior view
    // (first-touch), with the click→purchase lag. Two IGNORE NULLS value
    // windows over ONE exchange on the user key — the same carry-forward
    // machinery as q_first_last, aimed at the conversion-credit question
    // every growth pipeline answers. Purchases with no prior touch
    // abstain with nulls rather than mis-credit.
    GraftQuery(
      "q_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("secs"), col("event_type"))
          .withColumn("last_click_id",
            last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
          .withColumn("last_click_secs",
            last(when(col("event_type") === "click", col("secs")), ignoreNulls = true).over(w))
          .withColumn("first_view_id",
            first(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("last_click_id"),
            (col("secs") - col("last_click_secs")).as("click_lag_secs"),
            col("first_view_id"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS secs, event_type
             |  FROM events),
             |t AS (
             |  SELECT event_id, user_id, secs, event_type,
             |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |      OVER w AS last_click_id,
             |    last_value(CASE WHEN event_type = 'click' THEN secs END IGNORE NULLS)
             |      OVER w AS last_click_secs,
             |    first_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
             |      OVER w AS first_view_id
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY secs, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id, last_click_id,
             |  secs - last_click_secs AS click_lag_secs, first_view_id
             |FROM t WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin),
    ),

    // RFM segmentation: recency / frequency / monetary quintiles per
    // customer — the classic value-segmentation grid. One aggregation
    // shuffle on custkey builds the three metrics (decimal-exact spend);
    // each quintile score is [[Scale.distributedNtile]] — exact SQL
    // ntile(5) semantics (the oracle below IS ntile) computed as a
    // range-repartitioned two-phase rank + broadcast offsets, so no score
    // pulls the full customer population through one task. Custkey
    // tie-breaks make each order total, hence deterministic on any
    // engine. Segment ids concatenate the three scores.
    GraftQuery(
      "q_rfm",
      (s, dir) => {
        // persisted: distributedNtiles drives two actions over m (the
        // cutoff quantile job + the ranking job) — without persistence each
        // one re-runs the orders scan + aggregate. MEMORY_AND_DISK is the
        // 100 TB contract: the entity aggregate is customer-bounded but
        // still entity-sized, and an evicted MEMORY_ONLY block would
        // silently recompute the whole scan+aggregate mid-rank — spilling
        // the partition to local disk is the bounded-cost path. Bench and
        // Verify clearCache() between queries; callers that reuse the
        // session should unpersist after the final action over the result.
        val m = Tables(s, dir, "orders").groupBy("o_custkey").agg(
          max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
            .cast(LongType).as("last_day"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice").cast(DecimalType(30, 6))).cast(DoubleType).as("spend"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // all three quintile scores in ONE shared rank pass
        // (Scale.distributedNtiles): the metrics unpivot to narrow rows
        // through a single bucket window + offsets broadcast, then pivot
        // back — one quantile job, one count, one ranking job, instead of
        // a rank pipeline per metric (measured 4.4 s chained / 1.9 s
        // per-metric / 0.9 s shared at sf0.1 for the same answer).
        val scored = Scale.distributedNtiles(m, "o_custkey",
          Seq(("r_score", "last_day"), ("f_score", "freq"), ("m_score", "spend")), 5)
        scored
          .select(col("o_custkey"), col("freq"), col("spend"),
            col("r_score"), col("f_score"), col("m_score"),
            concat_ws("-", col("r_score"), col("f_score"), col("m_score")).as("segment"))
          .orderBy("o_custkey")
      },
      Some("""WITH m AS (
             |  SELECT o_custkey,
             |    CAST(CAST(max(o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT) AS last_day,
             |    count(*) AS freq,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spend
             |  FROM orders GROUP BY 1),
             |sc AS (
             |  SELECT o_custkey, freq, spend,
             |    CAST(ntile(5) OVER (ORDER BY last_day DESC, o_custkey) AS BIGINT) AS r_score,
             |    CAST(ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_score,
             |    CAST(ntile(5) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS m_score
             |  FROM m)
             |SELECT o_custkey, freq, spend, r_score, f_score, m_score,
             |  r_score || '-' || f_score || '-' || m_score AS segment
             |FROM sc ORDER BY o_custkey""".stripMargin),
    ),

    // Period-over-period reporting: monthly revenue per order priority
    // with previous-month delta and percent change. The fact table
    // collapses to a (priority × month) aggregate in one decimal-exact
    // shuffle; the lag window runs over that calendar-bounded frame.
    // First months abstain (null delta) rather than fake a 0% baseline.
    GraftQuery(
      "q_pop_growth",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority").orderBy("month_start")
        Tables(s, dir, "orders")
          .groupBy(col("o_orderpriority"),
            date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
          .agg(sum(col("o_totalprice").cast(DecimalType(30, 6))).cast(DoubleType).as("revenue"))
          .withColumn("prev", lag("revenue", 1).over(w))
          .select(col("o_orderpriority"), col("month_start"),
            (floor(col("revenue") * lit(1e2) + lit(0.5)) / lit(1e2)).as("revenue"),
            (floor((col("revenue") - col("prev")) * lit(1e2) + lit(0.5)) / lit(1e2)).as("delta"),
            (floor((col("revenue") - col("prev")) / col("prev") * lit(1e6) + lit(0.5)) / lit(1e6)).as("pct_change"))
          .orderBy("o_orderpriority", "month_start")
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority,
             |    strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
             |  FROM orders GROUP BY 1, 2),
             |l AS (
             |  SELECT *, lag(revenue) OVER (PARTITION BY o_orderpriority
             |    ORDER BY month_start) AS prev
             |  FROM m)
             |SELECT o_orderpriority, month_start,
             |  floor(revenue * 1e2 + 0.5) / 1e2 AS revenue,
             |  floor((revenue - prev) * 1e2 + 0.5) / 1e2 AS delta,
             |  floor((revenue - prev) / prev * 1e6 + 0.5) / 1e6 AS pct_change
             |FROM l ORDER BY o_orderpriority, month_start""".stripMargin),
    ),

    // Interval-union coverage per user: treat each event as the interval
    // [ts, ts + ⌊value⌋ seconds], merge overlaps, and report total
    // covered micros + the merged-island count — the machine-utilization
    // / "time actually engaged" rollup that double-counts nothing when
    // activities overlap (q_sessionize's gap-based islands answer a
    // different question: it chains events CLOSE to each other; this
    // merges events that literally overlap). The classic one-window
    // sweep: an island starts where start > running max of prior ends
    // (ROWS … 1 PRECEDING), island id = running sum of starts, one
    // aggregate per island, one per user — all integer micros, two
    // window passes over the same (user, start) sort order so the sort
    // is paid once.
    GraftQuery(
      "q_interval_coverage",
      (s, dir) => {
        val iv = Tables(s, dir, "events")
          .select(col("user_id"),
            unix_micros(col("ts")).as("s0"),
            (unix_micros(col("ts")) +
              floor(col("value")).cast(LongType) * 1000000L).as("e0"))
        val byU = Window.partitionBy("user_id").orderBy(col("s0"), col("e0"))
        val flagged = iv
          .withColumn("pmax", max("e0").over(byU.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("newi",
            when(col("pmax").isNull || col("s0") > col("pmax"), 1L).otherwise(0L))
          .withColumn("island", sum("newi").over(byU))
        flagged.groupBy("user_id", "island")
          .agg(min("s0").as("is0"), max("e0").as("ie0"))
          .groupBy("user_id")
          .agg(sum(col("ie0") - col("is0")).as("covered_us"),
            count(lit(1)).as("n_islands"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (
             |  SELECT user_id,
             |    epoch_us(ts) AS s0,
             |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS e0
             |  FROM events),
             |f AS (
             |  SELECT user_id, s0, e0,
             |    max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM iv),
             |g AS (
             |  SELECT user_id, s0, e0,
             |    sum(CASE WHEN pmax IS NULL OR s0 > pmax THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY s0, e0) AS island
             |  FROM f),
             |isl AS (
             |  SELECT user_id, island, min(s0) AS is0, max(e0) AS ie0
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id,
             |  CAST(sum(ie0 - is0) AS BIGINT) AS covered_us,
             |  count(*) AS n_islands
             |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),

    // Exact weighted median per group: the smallest p_size whose
    // cumulative weight reaches half the brand's total (lower weighted
    // median — the deterministic convention), weight = how many lineitems
    // reference the part. Pure integers: one weight aggregate, one
    // running-sum window ordered by the value, one min — the exact
    // distributed two-pass shape (weight histogram, then rank scan) that
    // replaces a global sort at scale, since the window partitions by
    // group and the per-group value domain is small.
    GraftQuery(
      "q_weighted_median",
      (s, dir) => {
        val w = Tables(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("pk")).agg(count(lit(1)).as("w"))
        val pw = Tables(s, dir, "part")
          .join(w, col("pk") === col("p_partkey"))
          .groupBy("p_brand", "p_size").agg(sum("w").as("w"))
        val byBrand = Window.partitionBy("p_brand")
        val cum = pw
          .withColumn("cw", sum("w").over(byBrand.orderBy("p_size")))
          .withColumn("tw", sum("w").over(byBrand))
        cum.filter(col("cw") * 2 >= col("tw"))
          .groupBy("p_brand").agg(min("p_size").as("wmedian"))
          .orderBy("p_brand")
      },
      Some("""WITH w AS (
             |  SELECT l_partkey AS pk, count(*) AS w FROM lineitem GROUP BY 1),
             |pw AS (
             |  SELECT p_brand, p_size, sum(w) AS w
             |  FROM part JOIN w ON pk = p_partkey GROUP BY 1, 2),
             |c AS (
             |  SELECT p_brand, p_size,
             |    sum(w) OVER (PARTITION BY p_brand ORDER BY p_size) AS cw,
             |    sum(w) OVER (PARTITION BY p_brand) AS tw
             |  FROM pw)
             |SELECT p_brand, min(p_size) AS wmedian FROM c
             |WHERE 2 * cw >= tw
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
    ),

    // Activity bitmaps: each user's January compressed to one 30-bit
    // BIGINT mask (bit d-1 = active on day d) via bit_or — the bitmap-
    // index layout engagement rollups use at scale, because week/cohort
    // retention and streak questions become BITWISE ops on one BIGINT
    // per user instead of re-scanning events. The max-streak chain
    // s_{i+1} = s_i & (s_i << 1) (nonzero iff some run of length i+1
    // survives) is generated step-by-step from the SAME expression
    // strings the oracle nests, so every bit is engine-exact.
    GraftQuery(
      "q_bitmap_retention",
      (s, dir) => activityBitmap(Tables(s, dir, "events")).orderBy("user_id"),
      Some {
        val inner = (2 to 30).foldLeft(
          "SELECT user_id, mask, mask AS s1 FROM (SELECT user_id," +
            " bit_or(1::BIGINT << (day(ts) - 1)) AS mask FROM events GROUP BY user_id)") {
          (q, i) => s"SELECT *, ${streakStep(i)} AS s$i FROM ($q)"
        }
        val streak = (1 to 30).map(i => s"CAST(s$i <> 0 AS INT)").mkString(" + ")
        s"""SELECT user_id, mask,
           |  CAST(bit_count(mask) AS INT) AS active_days,
           |  $streak AS max_streak,
           |  CAST((mask & 127) <> 0 AS INT) AS week1_active,
           |  CAST(((mask >> 21) & 127) <> 0 AS INT) AS week4_active,
           |  CAST((mask & 127) <> 0 AND ((mask >> 21) & 127) <> 0 AS INT) AS retained
           |FROM ($inner) ORDER BY user_id""".stripMargin
      },
    ),

    // STL-lite seasonal decomposition of the per-type daily value
    // series: trend = centered 7-day moving average, seasonal =
    // per-weekday mean of the detrended series, residual = the rest.
    // The entire decomposition runs in INTEGER MICROS as the documented
    // definition (daily totals accumulate in DECIMAL then floor to
    // micros; every later step is BIGINT div) — engine-exact, no float
    // accumulation anywhere. Two exchanges: one groupBy to days, one
    // broadcast-join of the 7-row weekday profile back onto the series.
    GraftQuery(
      "q_seasonal",
      (s, dir) => {
        val daily = Tables(s, dir, "events")
          .groupBy(col("event_type"), col("ts").cast("date").as("d"))
          .agg(expr("CAST(sum(CAST(value AS DECIMAL(30,6))) * 1000000 AS BIGINT)")
            .as("daily_micros"))
        val w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
        // `div`, not `/`+cast: double division loses exactness past 2^53
        // and rounds where div truncates — DuckDB `//` truncates toward
        // zero identically (verified on negatives)
        val trended = daily
          .withColumn("__ws", sum("daily_micros").over(w))
          .withColumn("__wc", count(lit(1)).over(w))
          .withColumn("trend_micros", expr("__ws div __wc"))
          .withColumn("det", col("daily_micros") - col("trend_micros"))
          .withColumn("dow", expr("weekday(d)"))
        val seasonal = trended.groupBy("event_type", "dow")
          .agg(sum("det").as("__sd"), count(lit(1)).as("__n"))
          .select(col("event_type"), col("dow"), expr("__sd div __n").as("seasonal_micros"))
        trended.join(broadcast(seasonal), Seq("event_type", "dow"))
          .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("d"),
            col("daily_micros"), col("trend_micros"), col("seasonal_micros"),
            (col("det") - col("seasonal_micros")).as("residual_micros"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(value AS DECIMAL(30,6))) * 1000000 AS BIGINT) AS daily_micros
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, d, daily_micros,
             |    CAST(sum(daily_micros) OVER w // count(*) OVER w AS BIGINT) AS trend_micros,
             |    isodow(d) - 1 AS dow
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (
             |  SELECT *, daily_micros - trend_micros AS det FROM t),
             |seas AS (
             |  SELECT event_type, dow,
             |    CAST(sum(det) // count(*) AS BIGINT) AS seasonal_micros
             |  FROM det GROUP BY 1, 2)
             |SELECT d.event_type, strftime(d.d, '%Y-%m-%d') AS d,
             |  d.daily_micros, d.trend_micros, s.seasonal_micros,
             |  d.det - s.seasonal_micros AS residual_micros
             |FROM det d JOIN seas s ON s.event_type = d.event_type AND s.dow = d.dow
             |ORDER BY d.event_type, d.d""".stripMargin),
    ),

    // Lag-1 / lag-7 autocorrelation of the per-type event value series —
    // the seasonality screen ("does today predict tomorrow? does the
    // week repeat?") a forecasting pipeline runs before model choice.
    // One shuffle on the key serves both lag windows and the aggregate;
    // corr carries the house 1e-4 primitive-rounding guard
    // (accumulation-order doubles, same discipline as q_stats_corr).
    GraftQuery(
      "q_autocorr",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        Tables(s, dir, "events")
          .withColumn("prev1", lag("value", 1).over(w))
          .withColumn("prev7", lag("value", 7).over(w))
          .groupBy("event_type")
          .agg(
            (floor(corr(col("value"), col("prev1")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("autocorr_lag1"),
            (floor(corr(col("value"), col("prev7")) * lit(1e4) + lit(0.5)) / lit(1e4)).as("autocorr_lag7"),
            count(col("prev1")).as("n_pairs"))
          .orderBy("event_type")
      },
      Some("""WITH l AS (
             |  SELECT event_type, value,
             |    lag(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev1,
             |    lag(value, 7) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev7
             |  FROM events)
             |SELECT event_type,
             |  floor(corr(value, prev1) * 1e4 + 0.5) / 1e4 AS autocorr_lag1,
             |  floor(corr(value, prev7) * 1e4 + 0.5) / 1e4 AS autocorr_lag7,
             |  count(prev1) AS n_pairs
             |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
  )

  /** One max-streak chain step: s_i = s_{i-1} & (s_{i-1} << 1) — the
    * shared expression text both engines evaluate (q_bitmap_retention).
    */
  private def streakStep(i: Int): String = s"s${i - 1} & (s${i - 1} << 1)"

  /** Per-user day-of-month activity bitmap over (user_id, ts) rows:
    * mask (bit d−1 = active on day d), active-day count, longest
    * consecutive streak (the s & (s << 1) chain — s_i ≠ 0 iff some run
    * of length i survives), first/fourth-week flags, and their AND
    * (week-4 retention). Everything downstream of the one bit_or
    * aggregate is per-row bitwise arithmetic.
    */
  def activityBitmap(events: DataFrame): DataFrame = {
    val base = events.groupBy("user_id")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), day(ts) - 1))").as("mask"))
    val withChain = (2 to 30).foldLeft(
      base.withColumn("s1", col("mask"))
        .withColumn("streak", when(col("s1") =!= 0, 1).otherwise(0))) {
      (d, i) =>
        d.withColumn(s"s$i", expr(streakStep(i)))
          .withColumn("streak",
            col("streak") + when(col(s"s$i") =!= 0, 1).otherwise(0))
    }
    withChain.select(col("user_id"), col("mask"),
      expr("CAST(bit_count(mask) AS INT)").as("active_days"),
      col("streak").as("max_streak"),
      expr("CAST((mask & 127) <> 0 AS INT)").as("week1_active"),
      expr("CAST(((mask >> 21) & 127) <> 0 AS INT)").as("week4_active"),
      expr("CAST((mask & 127) <> 0 AND ((mask >> 21) & 127) <> 0 AS INT)").as("retained"))
  }

  /** Bucket-blocked interval-overlap join: all (left, right) pairs sharing
    * `keyCol` whose closed intervals [ls, le] and [rs, re] overlap
    * (ls ≤ re ∧ rs ≤ le), plus `overlap_secs` = length of the
    * intersection. Spark has no native interval-overlap physical join —
    * a bare theta join would be a per-key cross product. Instead each
    * interval explodes to the coarse time buckets it touches, the join
    * runs as a pure EQUI-join on (key, bucket) — shuffle-partitionable,
    * AQE-skew-splittable — and the overlap predicate is a residual
    * filter. A pair meeting in several shared buckets is emitted exactly
    * once: only in the bucket containing the overlap's start
    * (`greatest(ls, rs) div bucketW`) — dedup by construction, no
    * distinct pass. Replication factor = interval span / bucketW + 1, so
    * bucketW trades shuffle volume against per-bucket join density.
    * Bounds must be non-negative (epoch seconds): `div` truncates toward
    * zero, which only floor-aligns buckets for non-negative operands.
    */
  def intervalOverlapJoin(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, keyCol: String,
      ls: String, le: String, rs: String, re: String,
      bucketW: Long): org.apache.spark.sql.DataFrame = {
    require(bucketW >= 1, s"bucket width must be >= 1, got $bucketW")
    val lb = left.withColumn("bkt",
      explode(expr(s"sequence($ls div $bucketW, $le div $bucketW)")))
    val rb = right.withColumn("bkt",
      explode(expr(s"sequence($rs div $bucketW, $re div $bucketW)")))
    lb.join(rb, Seq(keyCol, "bkt"))
      .filter(col(ls) <= col(re) && col(rs) <= col(le))
      .filter(col("bkt") === expr(s"greatest($ls, $rs) div $bucketW"))
      .drop("bkt")
      .withColumn("overlap_secs", least(col(le), col(re)) - greatest(col(ls), col(rs)))
  }
}
