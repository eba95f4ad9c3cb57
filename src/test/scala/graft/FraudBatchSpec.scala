package graft

import graft.batch.FraudBatch
import graft.model.FraudConfig
import graft.rules.Rules
import org.apache.spark.sql.functions.col

/** EP1 batch lookup-build goldens over a hand-rolled fixture exercising the
  * FIXTURES.md §A1 requirements: a card with >10 genuine rows (window cut),
  * one with <10, one with zero genuine rows, plus a timestamp tie.
  */
class FraudBatchSpec extends SparkSuite {
  import spark.implicits._

  // card 1: 12 genuine rows, amounts 100..1200 (ts ascending by hour) + 1 fraud
  // card 2: 3 genuine rows, amounts 10, 20, 30
  // card 3: only FRAUDULENT rows
  private lazy val tx = {
    val c1 = (1 to 12).map { i =>
      (1L, 101L, i * 100.0, 10524, 9000L + i, f"2024-01-01 ${i - 1}%02d:00:00", "GENUINE")
    } :+ ((1L, 101L, 99999.0, 10001, 9999L, "2024-01-01 23:00:00", "FRAUDULENT"))
    val c2 = Seq(
      (2L, 102L, 10.0, 10526, 8001L, "2024-01-02 10:00:00", "GENUINE"),
      (2L, 102L, 20.0, 10526, 8002L, "2024-01-02 11:00:00", "GENUINE"),
      // tie on ts with the row above; pos_id 8003 > 8002 wins the tie
      (2L, 102L, 30.0, 10527, 8003L, "2024-01-02 11:00:00", "GENUINE"),
    )
    val c3 = Seq((3L, 103L, 500.0, 10001, 7001L, "2024-01-03 09:00:00", "FRAUDULENT"))
    (c1 ++ c2 ++ c3)
      .toDF("card_id", "member_id", "amount", "postcode", "pos_id", "transaction_dt", "status")
  }

  private lazy val cardMember = Seq(
    (1L, 101L, "2020-01-01", "2020-02-01", "US", "NYC"),
    (2L, 102L, "2020-01-01", "2020-02-01", "US", "LA"),
    (3L, 103L, "2020-01-01", "2020-02-01", "US", "SF"),
  ).toDF("card_id", "member_id", "member_joining_dt", "card_purchase_dt", "country", "city")

  private lazy val memberScore = Seq((101L, 500), (102L, 199), (103L, 650))
    .toDF("member_id", "score")

  test("lastTenGenuine keeps exactly the 10 most recent genuine rows") {
    val lt = FraudBatch.lastTenGenuine(tx)
    val c1 = lt.filter($"card_id" === 1).select("amount").as[Double].collect().sorted
    // rows 3..12 (amounts 300..1200) survive; 100, 200 cut; the fraud row excluded
    assert(c1.toSeq == (3 to 12).map(_ * 100.0))
    assert(lt.filter($"card_id" === 2).count() == 3)
    assert(lt.filter($"card_id" === 3).count() == 0)
  }

  test("cardUcl = mean + 3*population stddev (Hive STDDEV parity)") {
    val ucl = FraudBatch.cardUcl(FraudBatch.lastTenGenuine(tx))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // card 1: amounts 300..1200, mean 750, pop sd = sqrt(mean(x^2)-mean^2)
    val amounts = (3 to 12).map(_ * 100.0)
    val mean = amounts.sum / 10
    val sd = math.sqrt(amounts.map(a => a * a).sum / 10 - mean * mean)
    assert(math.abs(ucl(1L) - (mean + 3 * sd)) < 1e-9)
    // card 2: 10,20,30 → mean 20, pop sd sqrt((100+400+900)/3-400)
    val sd2 = math.sqrt((100.0 + 400.0 + 900.0) / 3 - 400.0)
    assert(math.abs(ucl(2L) - (20.0 + 3 * sd2)) < 1e-9)
    assert(!ucl.contains(3L)) // no genuine history ⇒ no UCL row
  }

  test("latestZip picks the newest row per card, pos_id breaking ties") {
    val lz = FraudBatch.latestZip(tx)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    assert(lz(1L) == ((10001, "2024-01-01 23:00:00"))) // fraud row is still latest-known location
    assert(lz(2L) == ((10527, "2024-01-02 11:00:00"))) // tie broken by pos_id desc
    assert(lz(3L) == ((10001, "2024-01-03 09:00:00")))
  }

  test("full pipeline assembles lookup schema; no-genuine-history card drops out") {
    val lookup = FraudBatch.lookupPipeline(tx, cardMember, memberScore)
    assert(lookup.columns.toSeq == Seq("card_id", "ucl", "postcode", "transaction_dt", "score"))
    val rows = lookup.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L)) // card 3 has no UCL ⇒ inner join drops it
    assert(rows(1L).getInt(4) == 500)
    assert(rows(2L).getInt(4) == 199)
  }

  test("scoreRelabel (P5) flips low-score rows to Fraudulent") {
    val joined = tx.join(cardMember.select("card_id", "member_id"), Seq("card_id", "member_id"))
      .join(memberScore, Seq("member_id"))
      .select($"card_id", Rules.scoreRelabel($"score", $"status").as("status"))
    assert(joined.filter($"card_id" === 2).select("status").as[String].collect().forall(_ == "Fraudulent"))
    // high-score card keeps its original literals — the history's FRAUDULENT
    // row is untouched (the relabel only rewrites low-score rows)
    assert(joined.filter($"card_id" === 1 && $"status" === "Fraudulent").count() == 0)
    assert(joined.filter($"card_id" === 1 && $"status" === "FRAUDULENT").count() == 1)
  }

  test("mergeLookup: batch owns (ucl, score), stream owns (postcode, dt), full-outer fallback") {
    val batch = Seq(
      (1L, 100.0, 10524, "2024-01-01 10:00:00", 700), // card also seen by stream
      (2L, 200.0, 10001, "2024-01-02 10:00:00", 650), // batch-only card
    ).toDF("card_id", "ucl", "postcode", "transaction_dt", "score")
    val stream = Seq(
      (1L, 90.0, 10526, "2024-01-05 12:00:00", 700), // stale ucl carried in state
      (3L, 50.0, 10527, "2024-01-06 12:00:00", 300), // stream-only card
    ).toDF("card_id", "ucl", "postcode", "transaction_dt", "score")
    val merged = graft.batch.FraudBatch.mergeLookup(batch, stream)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(merged(1L).getDouble(1) == 100.0) // batch's fresh ucl wins
    assert(merged(1L).getInt(2) == 10526) // stream's newer location wins
    assert(merged(1L).getString(3) == "2024-01-05 12:00:00")
    assert(merged(2L).getInt(2) == 10001) // no stream row → batch location kept
    assert(merged(3L).getDouble(1) == 50.0) // no batch row → stream ucl kept
    assert(merged(3L).getInt(4) == 300)
  }

  test("config fork: spec thresholds are expressible (README 500 km/h vs code 0.25 km/s)") {
    val spec = FraudConfig(speedThresholdKmPerSec = 500.0 / 3600.0)
    assert(spec.speedThresholdKmPerSec < FraudConfig().speedThresholdKmPerSec)
  }
}
