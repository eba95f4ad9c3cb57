package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MLlib layer on top of the rule engine (the north-star "DataFrame ops +
  * MLlib for fraud detection"): learn a classifier from rule-labeled history
  * so scoring can generalize past the hard thresholds.
  *
  * Features mirror the three rule inputs (score, amount vs UCL, speed) —
  * a shallow decision tree recovers the rule disjunction's axis-aligned
  * thresholds almost exactly, which doubles as a consistency check between
  * the ML path and the rule path. Training is seeded and deterministic.
  *
  * Scale notes: featurization is the same declarative plan as
  * `q_fraud_rules` (broadcast dims, one window pass); MLlib's tree trainer
  * aggregates sufficient statistics map-side, so the fit is one pass over
  * the features per depth level — no per-record driver traffic.
  */
object FraudScorer {

  val featureCols: Array[String] = Array("score_f", "amount_over_ucl", "speed_f")

  /** Labeled (rule-engine output) rows → numeric features + binary label.
    * Nulls become neutral sentinels: missing score/ucl/speed must not fire
    * (the abstention semantics of SURVEY §7.1).
    */
  def featurize(labeled: DataFrame): DataFrame =
    labeled.select(
      coalesce(col("score").cast("double"), lit(1000.0)).as("score_f"),
      coalesce(col("value") / col("ucl"), lit(0.0)).as("amount_over_ucl"),
      coalesce(col("speed_kms"), lit(0.0)).as("speed_f"),
      when(col("label") === "FRAUD", 1.0).otherwise(0.0).as("is_fraud"),
    )

  def pipeline(seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
    val tree = new DecisionTreeClassifier()
      .setLabelCol("is_fraud").setFeaturesCol("features")
      .setMaxDepth(5).setSeed(seed)
    new Pipeline().setStages(Array(assembler, tree))
  }

  def train(features: DataFrame, seed: Long = 42L): PipelineModel =
    pipeline(seed).fit(features)

  def score(model: PipelineModel, features: DataFrame): DataFrame =
    model.transform(features)

  def auc(scored: DataFrame): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol("is_fraud").setRawPredictionCol("rawPrediction")
      .evaluate(scored)

  /** Fixed weights of the deterministic logistic scorer (bias, score,
    * amount/UCL ratio, speed) — the "trained model frozen into the engine"
    * deployment shape: scoring is a pure codegen'd column expression, no
    * model object, no per-record JVM↔MLlib boundary.
    */
  final val W0 = -2.0
  final val W1 = -0.004
  final val W2 = 1.5
  final val W3 = 4.0

  /** Raw logistic margin, quantized at 1e-6 so the cross-engine oracle
    * compares exp() on bit-identical arguments (speed features carry the
    * usual 1-ulp libm skew). Evaluation order is fixed left-to-right and
    * mirrored verbatim in the SQL oracle.
    */
  def logisticMargin(scoreF: Column, amountOverUcl: Column, speedF: Column): Column = {
    val m = lit(W0) + lit(W1) * scoreF + lit(W2) * amountOverUcl + lit(W3) * speedF
    floor(m * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** P(fraud) = sigmoid(margin), rounded half-up at 4 decimals. */
  def logisticProb(margin: Column): Column =
    floor(lit(1.0) / (lit(1.0) + exp(-margin)) * lit(1e4) + lit(0.5)) / lit(1e4)
}
