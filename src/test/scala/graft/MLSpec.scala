package graft

import graft.functions.TextFunctions
import graft.ml.FraudScorer
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** MLlib fraud scorer: a seeded shallow tree trained on rule-engine labels
  * recovers the rule thresholds (consistency between the ML path and the
  * rule path), plus rolling-hash fingerprint properties.
  */
class MLSpec extends SparkSuite {

  test("decision tree recovers the rule labels from rule-shaped features") {
    val features = FraudScorer.featurize(Relational.fraudEnriched(spark, sf("sf0.001"))).cache()
    val model = FraudScorer.train(features)
    val scored = FraudScorer.score(model, features)
    val agree = scored.filter(col("prediction") === col("is_fraud")).count().toDouble /
      scored.count()
    assert(agree > 0.97, s"rule/ML agreement $agree")
    assert(FraudScorer.auc(scored) > 0.97)
    // both classes present in the training frame (guards a degenerate fit)
    assert(features.select("is_fraud").distinct().count() == 2)
  }

  test("logistic scorer: probabilities in (0,1), label = margin sign, monotone in speed") {
    val s = spark
    import s.implicits._
    val scored = operators.Ml.queries.find(_.name == "q_ml_score").get.fn(spark, sf("sf0.001"))
    val rows = scored.select("ml_score", "ml_label").as[(Double, String)].collect()
    assert(rows.nonEmpty)
    // closed interval: 4-decimal rounding collapses extreme margins to 0/1
    assert(rows.forall { case (p, _) => p >= 0.0 && p <= 1.0 })
    // label is the margin's sign ⇔ p vs 0.5 (p = 0.5 exactly ⇒ margin ≤ 0)
    assert(rows.forall { case (p, l) =>
      if (p > 0.5) l == "FRAUD" else if (p < 0.5) l == "GENUINE" else true
    })
    // the speed weight is positive: scoring a synthetic frame with higher
    // speed must not lower the probability
    val m1 = ml.FraudScorer.logisticMargin(lit(1000.0), lit(1.0), lit(0.1))
    val m2 = ml.FraudScorer.logisticMargin(lit(1000.0), lit(1.0), lit(5.0))
    val (p1, p2) = spark.range(1)
      .select(ml.FraudScorer.logisticProb(m1), ml.FraudScorer.logisticProb(m2))
      .as[(Double, Double)].head()
    assert(p2 > p1)
  }

  test("model persistence: saved pipeline reloads with identical predictions") {
    val features = FraudScorer.featurize(Relational.fraudEnriched(spark, sf("sf0.001")))
    val model = FraudScorer.train(features)
    val path = java.nio.file.Files.createTempDirectory("graft-model").toString + "/m"
    model.write.overwrite().save(path)
    val reloaded = org.apache.spark.ml.PipelineModel.load(path)
    val a = FraudScorer.score(model, features).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    val b = FraudScorer.score(reloaded, features).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("rolling hash: equal sequences equal, permutation differs, fold is sequential") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "spark table join merge"),
      ("b", "spark table join merge"),
      ("c", "merge join table spark"),
    ).toDF("id", "text")
      .withColumn("h", TextFunctions.rollingHash(col("text")))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c")) // order-sensitive, unlike the sorted-set md5 fingerprint
    assert(m.values.forall(h => h >= 0L && h < 2147483647L))
  }

  test("lloyd: converges to the true partition on separated clusters, any partitioning") {
    val s = spark
    import s.implicits._
    // two tight clusters around (0,0) and (10,10); init picks ids 0 and 1
    // (one from each cluster by construction)
    val pts = Seq(
      (0L, Array(0.1f, 0.0f)), (1L, Array(10.0f, 10.1f)),
      (2L, Array(0.0f, 0.2f)), (3L, Array(9.9f, 10.0f)),
      (4L, Array(0.2f, 0.1f)), (5L, Array(10.1f, 9.9f)),
    )
    for (parts <- Seq(1, 5)) {
      val df = pts.toDF("vec_id", "embedding").repartition(parts)
      val got = operators.Ml.lloyd(df, "vec_id", "embedding", k = 2, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(0L) == got(2L) && got(2L) == got(4L), s"parts=$parts")
      assert(got(1L) == got(3L) && got(3L) == got(5L), s"parts=$parts")
      assert(got(0L) != got(1L), s"parts=$parts")
    }
  }

  test("lloyd: an empty cluster keeps its previous centroid instead of vanishing") {
    val s = spark
    import s.implicits._
    // k=2 but every point sits on one spot: the second centroid (init id 1)
    // attracts nothing after round 1 yet must survive with k rows of output space
    val pts = Seq((0L, Array(5.0f, 5.0f)), (1L, Array(5.0f, 5.0f)), (2L, Array(5.0f, 5.0f)))
    val got = operators.Ml.lloyd(pts.toDF("vec_id", "embedding"), "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 3)
    // identical points all land in ONE cluster (tie breaks to lower cid)
    assert(got.values.toSet.size == 1)
  }

  test("rocAuc: hand-computed tie-aware Mann-Whitney value, perfect and inverted extremes") {
    val s = spark
    import s.implicits._
    def auc(rows: Seq[(Long, String)]): (Long, Long, Double) = {
      val r = operators.Ml.rocAuc(rows.toDF("sq", "label"),
        positive = col("label") === "P").head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // scores 9,8,8,1 / labels P,P,N,N: pairs (9>8)=1,(9>1)=1,(8=8)=0.5,(8>1)=1
    // -> 3.5/4 = 0.875, with a genuine tie straddling the classes
    assert(auc(Seq((9L, "P"), (8L, "P"), (8L, "N"), (1L, "N"))) == ((2L, 2L, 0.875)))
    // perfect separation -> 1.0; inverted -> 0.0
    assert(auc(Seq((9L, "P"), (8L, "P"), (2L, "N"), (1L, "N")))._3 == 1.0)
    assert(auc(Seq((1L, "P"), (2L, "N")))._3 == 0.0)
    // all-tied scores -> 0.5 exactly
    assert(auc(Seq((5L, "P"), (5L, "P"), (5L, "N")))._3 == 0.5)
    // single-class input -> null AUC, not a division by zero
    val oneClass = operators.Ml.rocAuc(Seq((5L, "P"), (6L, "P")).toDF("sq", "label"),
      positive = col("label") === "P").head()
    assert(oneClass.isNullAt(2), oneClass.toString)
  }
}
