package graft.operators

import graft.{GraftQuery, Tables}
import graft.ml.FraudScorer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Full Lloyd's k-means over ×1000-quantized vectors. Centroids live on
    * the DRIVER between rounds (k rows — a constant, the bounded-collect
    * class of the Geo dimension), so each round's assignment is a pure
    * map-side expression: fold the k centroid literals per row, take the
    * lexicographic-min (d2, cid) struct. No assignment join, no id-keyed
    * shuffle — the ONLY exchange per round carries (cluster, dim) partial
    * sums, bounded by k·dims·partitions, and the corpus vectors never
    * leave their scan tasks. Integer squared-L2 + true FLOOR division
    * ((sv − pmod(sv, n)) / n — `div` would truncate toward zero and bias
    * negative coordinates) keep every round partitioning-invariant and
    * engine-deterministic, the [[Graph.pageRank]] discipline applied to
    * clustering. Empty clusters keep their previous centroid. Init = the
    * k lowest-id vectors. Output: (id, cluster, d2) under the FINAL
    * centroids.
    */
  def lloyd(df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && iters >= 1 && iters <= 50)
    val e = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long")).as("q"))
      .localCheckpoint(false) // feeds every round — quantize once
    // the lambda-valued aggregate loses its Alias inside struct() (fields
    // resolve as col1/col2), so the struct is re-typed by cast
    def best(cents: Array[(Long, Array[Long])]) = array_min(
      array(cents.map { case (cid, cq) =>
        struct(
          aggregate(zip_with(col("q"), array(cq.map(lit).toIndexedSeq: _*),
            (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x),
          lit(cid))
      }.toIndexedSeq: _*)).cast("struct<d2:bigint,cid:bigint>")
    var cents: Array[(Long, Array[Long])] = e.orderBy("id").limit(k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    for (_ <- 1 to iters) {
      val upd = e.select(best(cents).getField("cid").as("cluster"),
          posexplode(col("q")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        // numerator is exactly divisible after the pmod subtraction, so the
        // truncating `div` IS floor division here — and stays in long
        // arithmetic (plain `/` would detour through double and lose
        // exactness past 2^53)
        .select(col("cluster"), col("dim"),
          expr("(sv - pmod(sv, n)) div n").as("cv"))
        .collect().groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray // dim is posexplode's int
        }
      cents = cents.map { case (cid, cq) => cid -> upd.getOrElse(cid, cq) }
    }
    e.select(col("id"), best(cents).getField("cid").as("cluster"),
      best(cents).getField("d2").as("d2"))
  }

  /** The evaluation frame every metric query shares: each event reduced to
    * its integer-quantized frozen-scorer probability (`sq` = prob·1e4 —
    * logisticProb's numerator taken directly; the /1e4·1e4 round-trip
    * through the displayed double would re-enter float territory) and its
    * 3-rule `label`.
    */
  private def scoredEvents(s: SparkSession, dir: String): DataFrame = {
    val scoreF = coalesce(col("score"), lit(1000.0))
    val aou = coalesce(when(col("ucl") =!= 0, col("value") / col("ucl")), lit(0.0))
    val speedF = coalesce(col("speed_kms"), lit(0.0))
    val m = FraudScorer.logisticMargin(scoreF, aou, speedF)
    val sq = floor(lit(1.0) / (lit(1.0) + exp(-m)) * lit(1e4) + lit(0.5)).cast("long")
    Relational.fraudEnriched(s, dir)
      .select(col("event_id"), sq.as("sq"), col("label"))
  }

  /** WITH-clause fragment replaying [[scoredEvents]] in DuckDB; terminal
    * CTE is `scored(sq, label)`. */
  private val scoredSql: String =
    s"""located AS (${Relational.coordsSql}),
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
       |  SELECT s.event_id,
       |    floor((-2.0 + -0.004 * coalesce(c.c_acctbal, 1000.0)
       |      + 1.5 * coalesce(CASE WHEN u.ucl <> 0 THEN s.value / u.ucl END, 0.0)
       |      + 4.0 * coalesce(s.speed_kms, 0.0)) * 1e6 + 0.5) / 1e6 AS m,
       |    CASE WHEN (c.c_acctbal IS NOT NULL AND c.c_acctbal < 200)
       |           OR (u.ucl IS NOT NULL AND s.value > u.ucl)
       |           OR (s.speed_kms IS NOT NULL AND s.speed_kms > 0.25)
       |      THEN 'FRAUD' ELSE 'GENUINE' END AS label
       |  FROM speeds s
       |  LEFT JOIN ucl u ON s.user_id = u.user_id
       |  LEFT JOIN customer c ON s.user_id = c.c_custkey
       |),
       |scored AS (
       |  SELECT event_id,
       |    CAST(floor(1.0 / (1.0 + exp(-m)) * 1e4 + 0.5) AS BIGINT) AS sq, label
       |  FROM feat
       |)""".stripMargin

  /** Tie-aware ROC-AUC (Mann–Whitney rank-sum) over a frame with an
    * integer-quantized score column `sq` and a `positive` class predicate.
    * Each positive beats every lower-scored negative and half-ties the
    * negatives at its own score: AUC·2PN = Σ_s p_s·(2·N_below(s) + n_s),
    * evaluated in exact integer arithmetic until the final division. The
    * cumulative window runs over DISTINCT quantized scores (bounded by the
    * quantization range, e.g. ≤ 10,001 for a 4-decimal probability), never
    * over events.
    */
  def rocAuc(scored: org.apache.spark.sql.DataFrame, positive: Column): org.apache.spark.sql.DataFrame = {
    val g = scored.groupBy("sq").agg(
      sum(when(positive, 1L).otherwise(0L)).as("np"),
      sum(when(positive, 0L).otherwise(1L)).as("nn"))
    val wAsc = Window.orderBy("sq").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("nb", coalesce(sum("nn").over(wAsc), lit(0L)))
      .agg(
        sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(col("np") * (lit(2L) * col("nb") + col("nn"))).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        // single-class input → no rankable pairs → null, not a div-by-zero
        when(col("n_pos") > 0 && col("n_neg") > 0,
          floor(col("num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("auc"))
  }

  /** Exact best decision stump by histogram split finding — the
    * LightGBM-style scalable shape: each feature is bucketed onto a
    * `bins`-cell grid over its own [min, max] (one partial-aggregated
    * pass builds ALL features' histograms via posexplode — no per-feature
    * scan), cumulative bin counts give every candidate split's left/right
    * class totals from ONE window pass, and the best split minimizes the
    * count-weighted Gini impurity
    * G = [nl − (pl² + ql²)/nl + nr − (pr² + qr²)/nr] / n.
    *
    * Determinism: all counts are exact BIGINTs; G is ONE double
    * expression over exact-int operands (both engines evaluate the same
    * IEEE tree), micro-quantized; argmin tie-break is (g, feature, bin).
    * The candidate table is features × bins rows — constants — so the
    * final argmin sort touches O(f·bins) rows regardless of corpus size.
    * `labeled` must carry (label: 0/1, f0..f{nf−1}: double features).
    * Output: one row — (feature, threshold, gini, nl, posl, nr, posr).
    */
  def bestStump(labeled: DataFrame, nf: Int, bins: Int): DataFrame = {
    require(nf >= 1 && bins >= 2 && bins <= 1024)
    val lf = labeled.select(col("label").cast("long").as("label"),
      posexplode(array((0 until nf).map(i => col(s"f$i").cast("double")): _*)))
      .toDF("label", "feature", "v")
      .filter(col("v").isNotNull)
    val ranges = lf.groupBy("feature")
      .agg(min("v").as("lo"), max("v").as("hi"))
      .withColumn("w", (col("hi") - col("lo")) / lit(bins.toDouble))
    val hist = lf.join(broadcast(ranges), Seq("feature"))
      .select(col("feature"), col("label"),
        when(col("w") > 0,
          least(greatest(floor((col("v") - col("lo")) / col("w")), lit(0.0)),
            lit((bins - 1).toDouble)).cast("long"))
          .otherwise(lit(0L)).as("bin"))
      .groupBy("feature", "bin")
      .agg(count(lit(1)).as("n"), sum("label").as("pos"))
    val wCum = Window.partitionBy("feature").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("feature")
    val cand = hist
      .withColumn("nl", sum("n").over(wCum))
      .withColumn("pl", sum("pos").over(wCum))
      .withColumn("nt", sum("n").over(wAll))
      .withColumn("pt", sum("pos").over(wAll))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("pr", col("pt") - col("pl"))
      .filter(col("nl") > 0 && col("nr") > 0)
    val d = (c: Column) => c.cast("double")
    val g = (d(col("nl")) - (d(col("pl")) * d(col("pl"))
        + d(col("nl") - col("pl")) * d(col("nl") - col("pl"))) / d(col("nl"))
      + d(col("nr")) - (d(col("pr")) * d(col("pr"))
        + d(col("nr") - col("pr")) * d(col("nr") - col("pr"))) / d(col("nr"))) / d(col("nt"))
    cand
      .join(broadcast(ranges.select(col("feature"), col("lo"), col("w"))), Seq("feature"))
      .select(col("feature"), col("bin"),
        (col("lo") + (d(col("bin")) + lit(1.0)) * col("w")).as("threshold"),
        (floor(g * lit(1e6) + lit(0.5)) / lit(1e6)).as("gini"),
        col("nl"), col("pl").as("posl"), col("nr"), col("pr").as("posr"))
      .orderBy(col("gini"), col("feature"), col("bin"))
      .limit(1)
      .select(col("feature"), col("threshold"), col("gini"),
        col("nl"), col("posl"), col("nr"), col("posr"))
  }

  /** Contingency-table feature scores — χ² independence statistic and
    * mutual information between a categorical feature X and a bucketed
    * value Y, the two classic filter-method feature selectors. One
    * partial-aggregated groupBy builds the O_xy table; margins come from
    * two window sums over the |X|·|Y|-row table (constants, not corpus-
    * scaled).
    *
    * Float discipline: every cell term is ONE double expression over
    * exact-int operands, quantized to micros at the CELL, then summed as
    * exact BIGINTs (a raw double sum would be accumulation-order-
    * dependent — the one nondeterminism this repo never ships). χ² cell:
    * (O − E)²/E with E = rx·cy/n evaluated as the identical IEEE tree
    * both engines; MI cell log-ratio: ln(O/n) − ln(rx/n) − ln(cy/n)
    * (the q_kl_source form — products like O·n would outgrow 2⁵³ at
    * corpus scale, differences of lns do not), weighted by exact O and
    * floor-divided by n once at the end. Output: one row per X with its
    * partial sums — (x, n_x, chi2_part, mi_part).
    */
  def contingencyScores(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val o = df.select(xCol.as("x"), yCol.as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("o"))
    val wx = Window.partitionBy("x")
    val wy = Window.partitionBy("y")
    val wn = Window.partitionBy()
    val d = (c: Column) => c.cast("double")
    val cells = o
      .withColumn("rx", sum("o").over(wx))
      .withColumn("cy", sum("o").over(wy))
      .withColumn("n", sum("o").over(wn))
      .withColumn("e", d(col("rx")) * d(col("cy")) / d(col("n")))
      .withColumn("chi2c",
        floor((d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e")
          * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("lr",
        floor((log(d(col("o")) / d(col("n"))) - log(d(col("rx")) / d(col("n")))
          - log(d(col("cy")) / d(col("n")))) * lit(1e6) + lit(0.5)).cast("long"))
    cells.groupBy("x")
      .agg(max("rx").as("n_x"),
        sum("chi2c").as("c2"),
        sum(col("o") * col("lr")).as("ml"),
        max("n").as("nn"))
      .select(col("x"), col("n_x"),
        (d(col("c2")) / lit(1e6)).as("chi2_part"),
        (floor(d(col("ml")) / d(col("nn"))).cast("long").cast("double")
          / lit(1e6)).as("mi_part"))
  }

  /** Weighted isotonic regression over a bucketed axis by the max-min
    * identity: the PAV fit at bucket i is
    * f_i = max_{j ≤ i} min_{k ≥ i} avg(y over buckets [j, k]) — the
    * closed form of pool-adjacent-violators (Robertson et al. 1988), which
    * needs no sequential pooling loop and so lowers to three tiny joins.
    * `bins` carries (i, n, np): bucket index, weight, positive count.
    *
    * Scale shape: the corpus-sized work happened UPSTREAM (the groupBy
    * that built the buckets); everything here is O(B³) on the B-row
    * bucket table via prefix sums → all (j,k) window averages → per-i
    * min-then-max — B is a calibration grid (≤ a few hundred), so the
    * cubic is constant work. Window averages are doubles of exact-int
    * sums (identical IEEE division both engines); min/max never mix
    * values from different expressions, so ordering is deterministic;
    * the fit is micro-quantized only at output.
    * Output: (i, n, frac_pos, iso) with iso nondecreasing in i.
    */
  def isotonicFit(bins: DataFrame): DataFrame = {
    val wCum = Window.orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = (c: Column) => c.cast("double")
    val pre = bins
      .withColumn("cw", sum("n").over(wCum))
      .withColumn("cs", sum("np").over(wCum))
      .localCheckpoint(false) // B rows; feeds three legs
    val lo = pre.select(col("i").as("j"),
      (col("cw") - col("n")).as("w0"), (col("cs") - col("np")).as("s0"))
    val hi = pre.select(col("i").as("k"), col("cw").as("w1"), col("cs").as("s1"))
    val pairs = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        (d(col("s1") - col("s0")) / d(col("w1") - col("w0"))).as("avg"))
    val m = pre.select(col("i")).join(pairs, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy("i", "j").agg(min("avg").as("mn"))
      .groupBy("i").agg(max("mn").as("f"))
    pre.select(col("i"), col("n"), col("np")).join(m, Seq("i"))
      .select(col("i"), col("n"),
        (floor(d(col("np")) / d(col("n")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("frac_pos"),
        (floor(col("f") * lit(1e6) + lit(0.5)) / lit(1e6)).as("iso"))
  }

  val queries: Seq[GraftQuery] = Seq(

    // Isotonic (PAV) probability calibration of the frozen scorer on a
    // 20-bucket score grid — the monotone recalibration map production
    // scorers ship next to the Platt-style q_calibration diagnostic.
    // Fit by the max-min identity (see isotonicFit).
    GraftQuery(
      "q_isotonic",
      (s, dir) => isotonicFit(
        scoredEvents(s, dir)
          .withColumn("i", least(floor(col("sq") / lit(500L)), lit(19L)))
          .groupBy("i").agg(count(lit(1)).as("n"),
            sum(when(col("label") === "FRAUD", 1L).otherwise(0L)).as("np")))
        .orderBy("i"),
      Some(s"""WITH $scoredSql,
              |bins AS (
              |  SELECT least(CAST(floor(sq / 500) AS BIGINT), 19) AS i,
              |    count(*) AS n,
              |    CAST(sum(CASE WHEN label = 'FRAUD' THEN 1 ELSE 0 END) AS BIGINT) AS np
              |  FROM scored GROUP BY 1),
              |pre AS (
              |  SELECT i, n, np,
              |    CAST(sum(n) OVER wc AS BIGINT) AS cw,
              |    CAST(sum(np) OVER wc AS BIGINT) AS cs
              |  FROM bins
              |  WINDOW wc AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |pairs AS (
              |  SELECT a.i AS j, b.i AS k,
              |    CAST(b.cs - (a.cs - a.np) AS DOUBLE)
              |      / CAST(b.cw - (a.cw - a.n) AS DOUBLE) AS avg
              |  FROM pre a JOIN pre b ON a.i <= b.i),
              |m AS (
              |  SELECT p.i, pr.j, min(pr.avg) AS mn
              |  FROM pre p JOIN pairs pr ON pr.j <= p.i AND pr.k >= p.i
              |  GROUP BY 1, 2),
              |f AS (SELECT i, max(mn) AS f FROM m GROUP BY 1)
              |SELECT p.i, p.n,
              |  floor(CAST(p.np AS DOUBLE) / CAST(p.n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS frac_pos,
              |  floor(f.f * 1e6 + 0.5) / 1e6 AS iso
              |FROM pre p JOIN f ON f.i = p.i
              |ORDER BY p.i""".stripMargin),
    ),

    // χ² and mutual information between event_type and the value decile
    // (50-wide buckets over [0, 500]) — the two filter-method feature
    // selectors from one contingency pass (see contingencyScores).
    GraftQuery(
      "q_feature_scores",
      (s, dir) => contingencyScores(Tables(s, dir, "events"),
          col("event_type"),
          least(greatest(floor(col("value") / lit(50.0)), lit(0.0)), lit(9.0))
            .cast("long"))
        .orderBy("x"),
      Some("""WITH o AS (
             |  SELECT event_type AS x,
             |    CAST(least(greatest(floor(value / 50.0), CAST(0 AS DOUBLE)),
             |      CAST(9 AS DOUBLE)) AS BIGINT) AS y,
             |    count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |cells AS (
             |  SELECT x, o,
             |    CAST(sum(o) OVER (PARTITION BY x) AS BIGINT) AS rx,
             |    CAST(sum(o) OVER (PARTITION BY y) AS BIGINT) AS cy,
             |    CAST(sum(o) OVER () AS BIGINT) AS n
             |  FROM o),
             |t AS (
             |  SELECT x, o, rx, n,
             |    CAST(rx AS DOUBLE) * CAST(cy AS DOUBLE) / CAST(n AS DOUBLE) AS e,
             |    CAST(floor((ln(CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ln(CAST(rx AS DOUBLE) / CAST(n AS DOUBLE))
             |      - ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))) * 1e6 + 0.5)
             |      AS BIGINT) AS lr
             |  FROM cells),
             |c2 AS (
             |  SELECT x, o, rx, n, lr,
             |    CAST(floor((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
             |      * 1e6 + 0.5) AS BIGINT) AS chi2c
             |  FROM t)
             |SELECT x, max(rx) AS n_x,
             |  CAST(sum(chi2c) AS DOUBLE) / 1e6 AS chi2_part,
             |  CAST(CAST(floor(CAST(sum(o * lr) AS DOUBLE) / CAST(max(n) AS DOUBLE))
             |    AS BIGINT) AS DOUBLE) / 1e6 AS mi_part
             |FROM c2 GROUP BY x ORDER BY x""".stripMargin),
    ),

    // Best decision stump over three event features (value, hour, props
    // length) predicting event_type = 'purchase' — histogram split
    // finding with 64 bins per feature (see bestStump). One row out: the
    // winning (feature, threshold) and its exact split counts.
    GraftQuery(
      "q_stump",
      (s, dir) => bestStump(
        Tables(s, dir, "events").select(
          (col("event_type") === "purchase").cast("int").as("label"),
          col("value").as("f0"),
          hour(col("ts")).cast("double").as("f1"),
          length(col("props")).cast("double").as("f2")),
        nf = 3, bins = 64),
      Some("""WITH lf AS (
             |  SELECT CAST(event_type = 'purchase' AS BIGINT) AS label,
             |    f.feature, f.v
             |  FROM events, LATERAL (VALUES
             |    (0, value),
             |    (1, CAST(hour(ts) AS DOUBLE)),
             |    (2, CAST(length(props) AS DOUBLE))) AS f(feature, v)
             |  WHERE f.v IS NOT NULL),
             |rg AS (
             |  SELECT feature, min(v) AS lo, max(v) AS hi,
             |    (max(v) - min(v)) / CAST(64 AS DOUBLE) AS w
             |  FROM lf GROUP BY 1),
             |hist AS (
             |  SELECT l.feature,
             |    CASE WHEN r.w > 0 THEN CAST(least(greatest(
             |      floor((l.v - r.lo) / r.w), CAST(0 AS DOUBLE)),
             |      CAST(63 AS DOUBLE)) AS BIGINT) ELSE 0 END AS bin,
             |    count(*) AS n, CAST(sum(l.label) AS BIGINT) AS pos
             |  FROM lf l JOIN rg r USING (feature) GROUP BY 1, 2),
             |cand AS (
             |  SELECT feature, bin,
             |    CAST(sum(n) OVER wc AS BIGINT) AS nl,
             |    CAST(sum(pos) OVER wc AS BIGINT) AS pl,
             |    CAST(sum(n) OVER wa AS BIGINT) AS nt,
             |    CAST(sum(pos) OVER wa AS BIGINT) AS pt
             |  FROM hist
             |  WINDOW wc AS (PARTITION BY feature ORDER BY bin
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    wa AS (PARTITION BY feature)),
             |scored AS (
             |  SELECT feature, bin, nl, pl, nt - nl AS nr, pt - pl AS pr,
             |    floor((
             |      CAST(nl AS DOUBLE)
             |        - (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
             |           + CAST(nl - pl AS DOUBLE) * CAST(nl - pl AS DOUBLE))
             |          / CAST(nl AS DOUBLE)
             |      + CAST(nt - nl AS DOUBLE)
             |        - (CAST(pt - pl AS DOUBLE) * CAST(pt - pl AS DOUBLE)
             |           + CAST((nt - nl) - (pt - pl) AS DOUBLE) * CAST((nt - nl) - (pt - pl) AS DOUBLE))
             |          / CAST(nt - nl AS DOUBLE)
             |    ) / CAST(nt AS DOUBLE) * 1e6 + 0.5) / 1e6 AS gini
             |  FROM cand WHERE nl > 0 AND nt - nl > 0)
             |SELECT s.feature, r.lo + (CAST(s.bin AS DOUBLE) + 1.0) * r.w AS threshold,
             |  s.gini, s.nl, s.pl AS posl, s.nr, s.pr AS posr
             |FROM scored s JOIN rg r USING (feature)
             |ORDER BY s.gini, s.feature, s.bin LIMIT 1""".stripMargin),
    ),

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

    // kNN majority-vote classification over the embedding column: each
    // vector takes the majority label of its 5 exact-cosine nearest
    // neighbors (leave-one-out over the labeled corpus). Neighbor search is
    // [[Similarity.bruteForceTopK]] — the tiled pair scan, so the only
    // O(n²) work is bounded per (tile × tile) cell and nothing lands on the
    // driver; the label join is corpus-sized → broadcast; the vote is a
    // 5-rows-per-query partial aggregate. Ties break to the label of the
    // nearer neighbor (min rank — unique per query, so the vote is total).
    // The same shape serves label propagation / weak supervision at 100 TB:
    // swap the exact scan for the LSH/IVF variants, keep the vote.
    GraftQuery(
      "q_knn_label",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val nn = Similarity.bruteForceTopK(e, "vec_id", "embedding", 5)
        val votes = nn
          .join(broadcast(e.select(col("vec_id").as("neighbor_id"),
            col("label").cast("long").as("n_label"))), "neighbor_id")
          .groupBy("query_id", "n_label")
          .agg(count(lit(1)).as("votes"), min("rank").as("best_rank"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("votes").desc, col("best_rank"))
        votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .join(broadcast(e.select(col("vec_id").as("query_id"),
            col("label").cast("long").as("true_label"))), "query_id")
          .select(col("query_id").as("vec_id"), col("true_label"),
            col("n_label").as("pred_label"), col("votes"),
            (col("n_label") === col("true_label")).as("correct"))
          .orderBy("vec_id")
      },
      Some("""WITH prep AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings
             |),
             |normed AS (
             |  SELECT vec_id, label, q, list_dot_product(q, q) AS nrm FROM prep
             |),
             |pairs AS (
             |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS n_label,
             |    list_dot_product(a.q, b.q) / (sqrt(a.nrm) * sqrt(b.nrm)) AS cos
             |  FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
             |),
             |ranked AS (
             |  SELECT query_id, neighbor_id, n_label,
             |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM pairs
             |),
             |votes AS (
             |  SELECT query_id, n_label, count(*) AS votes, min(rank) AS best_rank
             |  FROM ranked WHERE rank <= 5 GROUP BY query_id, n_label
             |),
             |win AS (
             |  SELECT query_id, n_label, votes,
             |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, best_rank) AS rn
             |  FROM votes
             |)
             |SELECT w.query_id AS vec_id, CAST(e.label AS BIGINT) AS true_label,
             |  CAST(w.n_label AS BIGINT) AS pred_label, w.votes,
             |  w.n_label = e.label AS correct
             |FROM win w JOIN embeddings e ON e.vec_id = w.query_id
             |WHERE w.rn = 1
             |ORDER BY vec_id""".stripMargin),
    ),

    // One Lloyd assignment step of k-means (k=8, deterministic lowest-id
    // init) — the IVF coarse-quantizer trainer. Distances are EXACT
    // integer squared-L2 over the ×1000-quantized vectors (the Similarity
    // recipe), so the argmin is unambiguous and engine-identical; ties
    // break to the lower centroid id. Centroids broadcast (k rows);
    // assignment is a map-side k-way compare + one partial-aggregated
    // min(struct) per vector — NO shuffle of the corpus, which is what
    // lets the step run per-epoch over 100 TB of embeddings. Centroid
    // RE-computation is the oracle-pinned q_centroid machinery.
    GraftQuery(
      "q_kmeans_step",
      (s, dir) => {
        val k = 8
        val e = Tables(s, dir, "embeddings")
          .withColumn("q", transform(col("embedding"),
            x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long")))
        val cents = e.orderBy("vec_id").limit(k)
          .select(col("vec_id").as("cid"), col("q").as("cq"))
        val d2 = aggregate(
          zip_with(col("q"), col("cq"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x)
        e.select(col("vec_id"), col("q")).crossJoin(broadcast(cents))
          .withColumn("d2", d2)
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("cid"))).as("best"))
          .select(col("vec_id"), col("best.cid").as("cluster"), col("best.d2").as("d2"))
          .orderBy("vec_id")
      },
      Some("""WITH prep AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings),
             |cents AS (SELECT vec_id AS cid, q AS cq FROM prep ORDER BY vec_id LIMIT 8),
             |asg AS (
             |  SELECT p.vec_id, c.cid,
             |    CAST(list_dot_product(p.q, p.q) - 2 * list_dot_product(p.q, c.cq)
             |      + list_dot_product(c.cq, c.cq) AS BIGINT) AS d2
             |  FROM prep p CROSS JOIN cents c),
             |r AS (
             |  SELECT vec_id, cid, d2,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             |  FROM asg)
             |SELECT vec_id, cid AS cluster, d2 FROM r WHERE rn = 1
             |ORDER BY vec_id""".stripMargin),
    ),

    // Full Lloyd iteration, 3 assignment rounds with 2 centroid
    // recomputations between — q_kmeans_step run to an actual
    // clustering, entirely in INTEGER milli-units: embeddings quantize
    // once (floor at 1e3), centroid means are per-dimension integer
    // `div` (floor), distances are exact BIGINT sums — so the whole
    // trajectory, not just one step, is engine-exact. Assignment stays
    // a map-side broadcast compare (no corpus shuffle); recomputation
    // is one posexplode + keyed aggregate per round (the q_centroid
    // shape). A cluster that loses all members simply drops out of the
    // next round's centroid set (documented; both engines replay it).
    GraftQuery(
      "q_kmeans3",
      (s, dir) => {
        val k = 8
        val e = Tables(s, dir, "embeddings")
          .withColumn("q", transform(col("embedding"),
            x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long")))
          .select("vec_id", "q").localCheckpoint(false)
        def assign(cents: DataFrame): DataFrame = {
          val d2 = aggregate(
            zip_with(col("q"), col("cq"), (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, x) => acc + x)
          e.crossJoin(broadcast(cents))
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(min(struct(col("d2"), col("cid"))).as("best"))
            .select(col("vec_id"), col("best.cid").as("cluster"),
              col("best.d2").as("d2"))
        }
        def recompute(asg: DataFrame): DataFrame =
          e.join(asg.select(col("vec_id"), col("cluster").as("cid")), Seq("vec_id"))
            .select(col("cid"), posexplode(col("q")).as(Seq("dim", "v")))
            .groupBy("cid", "dim")
            .agg(sum("v").as("sv"), count(lit(1)).as("n"))
            .select(col("cid"), col("dim"), expr("sv div n").as("cv"))
            .groupBy("cid")
            .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), x -> x.cv)")
              .as("cq"))
            .localCheckpoint(false)
        val cents0 = e.orderBy("vec_id").limit(k)
          .select(col("vec_id").as("cid"), col("q").as("cq")).localCheckpoint(false)
        val a1 = assign(cents0).localCheckpoint(false)
        val a2 = assign(recompute(a1)).localCheckpoint(false)
        assign(recompute(a2)).orderBy("vec_id")
      },
      Some {
        def roundSql(i: Int): String =
          s"""asg$i AS MATERIALIZED (
             |  SELECT vec_id, cid, d2 FROM (
             |    SELECT p.vec_id, c.cid,
             |      CAST(list_dot_product(p.q, p.q) - 2 * list_dot_product(p.q, c.cq)
             |        + list_dot_product(c.cq, c.cq) AS BIGINT) AS d2,
             |      row_number() OVER (PARTITION BY p.vec_id
             |        ORDER BY CAST(list_dot_product(p.q, p.q)
             |          - 2 * list_dot_product(p.q, c.cq)
             |          + list_dot_product(c.cq, c.cq) AS BIGINT), c.cid) AS rn
             |    FROM prep p CROSS JOIN cents${i - 1} c)
             |  WHERE rn = 1),
             |cd$i AS MATERIALIZED (
             |  SELECT a.cid, pos, CAST(sum(q) // count(*) AS BIGINT) AS cv FROM (
             |    SELECT vec_id, unnest(q) AS q, generate_subscripts(q, 1) AS pos
             |    FROM prep) u
             |  JOIN asg$i a ON a.vec_id = u.vec_id
             |  GROUP BY 1, 2),
             |cents$i AS MATERIALIZED (
             |  SELECT cid, list(cv ORDER BY pos) AS cq FROM cd$i GROUP BY cid)""".stripMargin
        (Seq(
          """WITH prep AS MATERIALIZED (
            |  SELECT vec_id,
            |    list_transform(embedding,
            |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
            |  FROM embeddings),
            |cents0 AS (SELECT vec_id AS cid, q AS cq FROM prep ORDER BY vec_id LIMIT 8)""".stripMargin) ++
          Seq(roundSql(1), roundSql(2))).mkString(",\n") +
          """,
            |final AS (
            |  SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id
            |    ORDER BY d2, cid) AS rn FROM (
            |    SELECT p.vec_id, c.cid,
            |      CAST(list_dot_product(p.q, p.q) - 2 * list_dot_product(p.q, c.cq)
            |        + list_dot_product(c.cq, c.cq) AS BIGINT) AS d2
            |    FROM prep p CROSS JOIN cents2 c))
            |SELECT vec_id, cid AS cluster, d2 FROM final WHERE rn = 1
            |ORDER BY vec_id""".stripMargin
      },
    ),

    // Distributed tie-aware ROC-AUC (Mann–Whitney rank-sum) of the frozen
    // logistic scorer against the 3-rule labels — the evaluation metric a
    // model-serving pipeline computes at corpus scale. The per-event score
    // is the ALREADY-QUANTIZED 4-decimal probability, so the grouped frame
    // has ≤ 10,001 distinct scores: the cumulative-negatives window is
    // k-BOUNDED (runs over score groups, never over events — house rule on
    // unpartitioned windows), and everything until the final division is
    // exact integer arithmetic:
    //   AUC·2PN = Σ_s p_s · (2·N_below(s) + n_s)
    // (each positive beats every lower-scored negative and half-ties the
    // negatives at its own score).
    GraftQuery(
      "q_auc",
      (s, dir) => rocAuc(scoredEvents(s, dir), positive = col("label") === "FRAUD"),
      Some(s"""WITH $scoredSql,
              |g AS (
              |  SELECT sq,
              |    sum(CASE WHEN label = 'FRAUD' THEN 1 ELSE 0 END) AS np,
              |    sum(CASE WHEN label = 'GENUINE' THEN 1 ELSE 0 END) AS nn
              |  FROM scored GROUP BY 1
              |),
              |cum AS (
              |  SELECT sq, np, nn,
              |    coalesce(sum(nn) OVER (ORDER BY sq
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
              |  FROM g
              |)
              |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
              |  CASE WHEN sum(np) > 0 AND sum(nn) > 0 THEN
              |    floor(CAST(sum(np * (2 * nb + nn)) AS DOUBLE) /
              |      (2.0 * sum(np) * sum(nn)) * 1e6 + 0.5) / 1e6 END AS auc
              |FROM cum""".stripMargin),
    ),

    // Calibration (reliability) bins for the frozen scorer: predicted
    // probability deciles vs empirical positive rate. One map-side pass +
    // a 10-row aggregate; the mean prediction per bin sums the INTEGER
    // prob·1e4 values (order-free) and divides once.
    GraftQuery(
      "q_calibration",
      (s, dir) => {
        val g = scoredEvents(s, dir)
          .withColumn("bin", least(floor(col("sq") / lit(1000L)), lit(9L)))
          .groupBy("bin").agg(
            count(lit(1)).as("n"),
            sum("sq").as("sum_sq"),
            sum(when(col("label") === "FRAUD", 1L).otherwise(0L)).as("np"))
        g.select(col("bin"), col("n"),
            (floor(col("sum_sq").cast("double") / (col("n") * lit(1e4)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_pred"),
            (floor(col("np").cast("double") / col("n") * lit(1e6) + lit(0.5)) / lit(1e6)).as("frac_pos"))
          .orderBy("bin")
      },
      Some(s"""WITH $scoredSql,
              |g AS (
              |  SELECT least(CAST(floor(sq / 1000) AS BIGINT), 9) AS bin,
              |    count(*) AS n, sum(sq) AS sum_sq,
              |    sum(CASE WHEN label = 'FRAUD' THEN 1 ELSE 0 END) AS np
              |  FROM scored GROUP BY 1
              |)
              |SELECT bin, CAST(n AS BIGINT) AS n,
              |  floor(CAST(sum_sq AS DOUBLE) / (n * 1e4) * 1e6 + 0.5) / 1e6 AS mean_pred,
              |  floor(CAST(np AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS frac_pos
              |FROM g ORDER BY bin""".stripMargin),
    ),

    // Precision/recall/F1 sweep at the 9 decile thresholds: the score-group
    // frame (≤ 10,001 rows) crossed with a broadcast 9-row threshold dim —
    // never a per-event pass per threshold. Exact integer TP/FP/FN;
    // ratios divide once, quantized.
    GraftQuery(
      "q_pr_curve",
      (s, dir) => {
        val g = scoredEvents(s, dir)
          .groupBy("sq").agg(
            sum(when(col("label") === "FRAUD", 1L).otherwise(0L)).as("np"),
            sum(when(col("label") === "GENUINE", 1L).otherwise(0L)).as("nn"))
        val totals = g.agg(sum("np").as("pos_tot"))
        val thresholds = (1 to 9).map(i => i * 1000L)
        val t = g.sparkSession.createDataFrame(
          thresholds.map(Tuple1.apply)).toDF("t")
        val pr = g.crossJoin(broadcast(t))
          .groupBy("t").agg(
            sum(when(col("sq") >= col("t"), col("np")).otherwise(0L)).as("tp"),
            sum(when(col("sq") >= col("t"), col("nn")).otherwise(0L)).as("fp"))
          .crossJoin(broadcast(totals))
          .withColumn("fn", col("pos_tot") - col("tp"))
        pr.select(col("t"), col("tp"), col("fp"), col("fn"),
            (floor(col("tp").cast("double") / greatest(col("tp") + col("fp"), lit(1L)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("precision"),
            (floor(col("tp").cast("double") / greatest(col("tp") + col("fn"), lit(1L)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("recall"),
            (floor(lit(2.0) * col("tp") / greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("f1"))
          .orderBy("t")
      },
      Some(s"""WITH $scoredSql,
              |g AS (
              |  SELECT sq,
              |    sum(CASE WHEN label = 'FRAUD' THEN 1 ELSE 0 END) AS np,
              |    sum(CASE WHEN label = 'GENUINE' THEN 1 ELSE 0 END) AS nn
              |  FROM scored GROUP BY 1
              |),
              |t AS (SELECT unnest([1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000]) AS t),
              |tot AS (SELECT sum(np) AS pos_tot FROM g),
              |pr AS (
              |  SELECT t,
              |    sum(CASE WHEN sq >= t THEN np ELSE 0 END) AS tp,
              |    sum(CASE WHEN sq >= t THEN nn ELSE 0 END) AS fp
              |  FROM g CROSS JOIN t GROUP BY t
              |)
              |SELECT CAST(t AS BIGINT) AS t, CAST(tp AS BIGINT) AS tp,
              |  CAST(fp AS BIGINT) AS fp,
              |  CAST(pos_tot - tp AS BIGINT) AS fn,
              |  floor(CAST(tp AS DOUBLE) / greatest(tp + fp, 1) * 1e6 + 0.5) / 1e6 AS precision,
              |  floor(CAST(tp AS DOUBLE) / greatest(pos_tot, 1) * 1e6 + 0.5) / 1e6 AS recall,
              |  floor(2.0 * tp / greatest(2 * tp + fp + (pos_tot - tp), 1) * 1e6 + 0.5) / 1e6 AS f1
              |FROM pr CROSS JOIN tot ORDER BY t""".stripMargin),
    ),

    // Population stability index between two deterministic event halves
    // (event_id parity — the monitoring shape compares a reference window
    // to the current one): score-decile shares with add-½ smoothing,
    // contrib = (p−q)·ln(p/q) per bin quantized to micros, psi = the
    // INTEGER sum of those micros — so the total can never depend on bin
    // summation order.
    GraftQuery(
      "q_psi",
      (s, dir) => {
        val halves = scoredEvents(s, dir)
          .withColumn("bin", least(floor(col("sq") / lit(1000L)), lit(9L)))
          .groupBy("bin").agg(
            sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("ref_n"),
            sum(when(col("event_id") % 2 =!= 0, 1L).otherwise(0L)).as("cur_n"))
        val tot = halves.agg(sum("ref_n").as("rt"), sum("cur_n").as("ct"))
        val contrib = halves.crossJoin(broadcast(tot))
          .withColumn("p", (col("ref_n") + lit(0.5)) / (col("rt") + lit(5.0)))
          .withColumn("q", (col("cur_n") + lit(0.5)) / (col("ct") + lit(5.0)))
          .withColumn("contrib_micros",
            floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e6) + lit(0.5)).cast("long"))
        val psi = contrib.agg(sum("contrib_micros").as("psi_micros"))
        contrib.crossJoin(broadcast(psi))
          .select(col("bin"), col("ref_n"), col("cur_n"),
            (col("contrib_micros").cast("double") / lit(1e6)).as("contrib"),
            (col("psi_micros").cast("double") / lit(1e6)).as("psi"))
          .orderBy("bin")
      },
      Some(s"""WITH $scoredSql,
              |halves AS (
              |  SELECT least(CAST(floor(sq / 1000) AS BIGINT), 9) AS bin,
              |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS ref_n,
              |    sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS cur_n
              |  FROM scored GROUP BY 1),
              |tot AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM halves),
              |c AS (
              |  SELECT bin, ref_n, cur_n,
              |    CAST(floor(((ref_n + 0.5) / (rt + 5.0) - (cur_n + 0.5) / (ct + 5.0))
              |      * ln(((ref_n + 0.5) / (rt + 5.0)) / ((cur_n + 0.5) / (ct + 5.0)))
              |      * 1e6 + 0.5) AS BIGINT) AS cm
              |  FROM halves CROSS JOIN tot),
              |p AS (SELECT sum(cm) AS pm FROM c)
              |SELECT bin, CAST(ref_n AS BIGINT) AS ref_n, CAST(cur_n AS BIGINT) AS cur_n,
              |  CAST(cm AS DOUBLE) / 1e6 AS contrib,
              |  CAST(pm AS DOUBLE) / 1e6 AS psi
              |FROM c CROSS JOIN p ORDER BY bin""".stripMargin),
    ),

    // Kolmogorov–Smirnov statistic between the class-conditional score
    // CDFs — the classic fraud-scorecard separation metric. The cumulative
    // pass runs over the ≤ 10,001-row score-group frame; the max gap is
    // compared on EXACT integers (|cumP·N − cumN·P|), the division to a
    // displayed double happens once. `at_sq` = the lowest score attaining
    // the max (deterministic under ties).
    GraftQuery(
      "q_ks",
      (s, dir) => {
        val g = scoredEvents(s, dir)
          .groupBy("sq").agg(
            sum(when(col("label") === "FRAUD", 1L).otherwise(0L)).as("np"),
            sum(when(col("label") === "GENUINE", 1L).otherwise(0L)).as("nn"))
        val wCum = Window.orderBy("sq")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = g
          .withColumn("cp", sum("np").over(wCum))
          .withColumn("cn", sum("nn").over(wCum))
        val tot = cum.agg(max("cp").as("p_tot"), max("cn").as("n_tot"))
        val gaps = cum.crossJoin(broadcast(tot))
          .withColumn("gap", abs(col("cp") * col("n_tot") - col("cn") * col("p_tot")))
        gaps.agg(
            max(struct(col("gap").as("gap"), (-col("sq")).as("neg_sq"))).as("best"),
            max("p_tot").as("p_tot"), max("n_tot").as("n_tot"))
          .select(
            (floor(col("best.gap").cast("double") / (col("p_tot") * col("n_tot"))
              * lit(1e6) + lit(0.5)) / lit(1e6)).as("ks"),
            (-col("best.neg_sq")).as("at_sq"))
      },
      Some(s"""WITH $scoredSql,
              |g AS (
              |  SELECT sq,
              |    sum(CASE WHEN label = 'FRAUD' THEN 1 ELSE 0 END) AS np,
              |    sum(CASE WHEN label = 'GENUINE' THEN 1 ELSE 0 END) AS nn
              |  FROM scored GROUP BY 1),
              |cum AS (
              |  SELECT sq,
              |    sum(np) OVER (ORDER BY sq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
              |    sum(nn) OVER (ORDER BY sq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
              |  FROM g),
              |tot AS (SELECT max(cp) AS p_tot, max(cn) AS n_tot FROM cum),
              |gaps AS (
              |  SELECT sq, abs(cp * n_tot - cn * p_tot) AS gap, p_tot, n_tot
              |  FROM cum CROSS JOIN tot),
              |best AS (
              |  SELECT gap, sq, p_tot, n_tot,
              |    row_number() OVER (ORDER BY gap DESC, sq) AS rn
              |  FROM gaps)
              |SELECT floor(CAST(gap AS DOUBLE) / (p_tot * n_tot) * 1e6 + 0.5) / 1e6 AS ks,
              |  sq AS at_sq
              |FROM best WHERE rn = 1""".stripMargin),
    ),
  )
}
