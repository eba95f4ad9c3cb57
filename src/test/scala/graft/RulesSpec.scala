package graft

import graft.model.FraudConfig
import graft.rules.Rules

/** P6 truth table including null abstention (P7) — SURVEY §5.1. */
class RulesSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private val cfg = FraudConfig()

  test("scalar truth table with abstention") {
    // (score, amount, ucl, speed) → label
    val cases = Seq(
      (Some(199), 1.0, Some(1000.0), Some(0.0)) -> "FRAUD", // score fires
      (Some(200), 1.0, Some(1000.0), Some(0.0)) -> "GENUINE", // boundary: strict <
      (Some(700), 1000.01, Some(1000.0), Some(0.0)) -> "FRAUD", // ucl fires (strict >)
      (Some(700), 1000.0, Some(1000.0), Some(0.0)) -> "GENUINE", // boundary
      (Some(700), 1.0, Some(1000.0), Some(0.2500001)) -> "FRAUD", // speed fires
      (Some(700), 1.0, Some(1000.0), Some(0.25)) -> "GENUINE", // boundary
      (None, 1e12, None, None) -> "GENUINE", // everything abstains
      (None, 1e12, Some(10.0), None) -> "FRAUD", // only ucl known, fires
      (Some(100), 0.0, None, None) -> "FRAUD", // only score known, fires
    )
    cases.foreach { case ((sc, am, ucl, sp), want) =>
      assert(Rules.fraudLabelScalar(sc, am, ucl, sp, cfg) == want,
        s"case ($sc, $am, $ucl, $sp)")
    }
  }

  test("property: UCL >= mean for any amounts (sigma >= 0) — SURVEY §5.4") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val amounts = Gen.nonEmptyListOf(Gen.choose(0.0, 10000.0))
    val prop = Prop.forAll(amounts) { xs =>
      val df = xs.zipWithIndex
        .map { case (a, i) => (1L, a, 10524, i.toLong, f"2024-01-01 ${i % 24}%02d:00:00", "GENUINE") }
        .toDF("card_id", "amount", "postcode", "pos_id", "transaction_dt", "status")
      val ucl = graft.batch.FraudBatch.cardUcl(df.select("card_id", "amount"))
        .head().getDouble(1)
      val mean = xs.sum / xs.size
      ucl >= mean - 1e-9
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: UCL-rule label is monotone in amount (higher amount never flips FRAUD->GENUINE)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val g = for {
      ucl <- Gen.choose(0.0, 1000.0)
      a <- Gen.choose(0.0, 2000.0)
      b <- Gen.choose(0.0, 2000.0)
    } yield (ucl, math.min(a, b), math.max(a, b))
    val prop = Prop.forAll(g) { case (ucl, lo, hi) =>
      val lowLabel = Rules.fraudLabelScalar(None, lo, Some(ucl), None, cfg)
      val hiLabel = Rules.fraudLabelScalar(None, hi, Some(ucl), None, cfg)
      !(lowLabel == "FRAUD" && hiLabel == "GENUINE")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("column expression matches the scalar on the same table, nulls included") {
    val df = Seq(
      (Some(199), 1.0, Some(1000.0), Some(0.0)),
      (Some(200), 1.0, Some(1000.0), Some(0.0)),
      (Some(700), 1000.01, Some(1000.0), Some(0.0)),
      (None: Option[Int], 1e12, None: Option[Double], None: Option[Double]),
      (None: Option[Int], 1e12, Some(10.0), None: Option[Double]),
      (Some(100), 0.0, None: Option[Double], None: Option[Double]),
    ).toDF("score", "amount", "ucl", "speed")
    val got = df.select(
      Rules.fraudLabel(col("score"), col("amount"), col("ucl"), col("speed"), cfg).as("label")
    ).as[String].collect().toSeq
    val want = Seq("FRAUD", "GENUINE", "FRAUD", "GENUINE", "FRAUD", "FRAUD")
    assert(got == want)
  }
}
