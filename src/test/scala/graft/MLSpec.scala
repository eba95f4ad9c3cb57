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
    val scored = operators.Ml.queries.head.fn(spark, sf("sf0.001"))
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
}
