package graft.rules

import graft.model.FraudConfig
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The rule engine (SURVEY §2.2 P5/P6) as pure Column expressions — no UDFs,
  * fully codegen'd.
  */
object Rules {

  /** P6: 3-rule disjunction `score < 200 OR amount > ucl OR speed > 0.25`
    * (FinFraudGuard.java:82-83) with abstention semantics (SURVEY §7.1): a
    * NULL parameter means that rule cannot fire, so a first-ever card with no
    * lookup state is GENUINE unless another rule fires.
    */
  def fraudLabel(
      score: Column,
      amount: Column,
      ucl: Column,
      speedKmPerSec: Column,
      cfg: FraudConfig = FraudConfig(),
  ): Column =
    when(
      (score.isNotNull && score < cfg.scoreThreshold) ||
        (ucl.isNotNull && amount > ucl) ||
        (speedKmPerSec.isNotNull && speedKmPerSec > cfg.speedThresholdKmPerSec),
      lit(cfg.fraudLabel),
    ).otherwise(lit(cfg.genuineLabel))

  /** Scalar twin of [[fraudLabel]] for the streaming state function. */
  def fraudLabelScalar(
      score: Option[Int],
      amount: Double,
      ucl: Option[Double],
      speedKmPerSec: Option[Double],
      cfg: FraudConfig = FraudConfig(),
  ): String = {
    val fires = score.exists(_ < cfg.scoreThreshold) ||
      ucl.exists(amount > _) ||
      speedKmPerSec.exists(_ > cfg.speedThresholdKmPerSec)
    if (fires) cfg.fraudLabel else cfg.genuineLabel
  }

  /** P5: batch-history relabel `CASE WHEN score < 200 THEN 'Fraudulent' ELSE
    * status END` (README.md:266-279).
    */
  def scoreRelabel(score: Column, status: Column, cfg: FraudConfig = FraudConfig()): Column =
    when(score < cfg.scoreThreshold, lit("Fraudulent")).otherwise(status)
}
