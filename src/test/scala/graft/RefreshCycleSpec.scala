package graft

import graft.batch.FraudBatch
import graft.model._
import graft.streaming.FraudStream
import org.apache.spark.sql.functions._

/** EP3 full cycle: batch snapshot → stream advances location state →
  * restart with a REFRESHED batch snapshot — the stream's location must
  * survive the restart (mergeLookup), so impossible travel is still caught
  * against the stream-advanced position, not the batch's stale one.
  */
class RefreshCycleSpec extends SparkSuite {
  import spark.implicits._

  private val zip = Map(
    "11111" -> (0.0, 0.0),
    "22222" -> (0.0, 90.0), // 10007 km from A
  )
  private val cfg = FraudConfig()

  test("stream state recovered from master survives a batch refresh") {
    val zipBc = spark.sparkContext.broadcast(zip)

    // phase 1: batch snapshot says card 1 was last at A long ago
    val snap1 = Seq(CardLookup(1L, Some(1000.0), Some(700), Some(11111),
      Some("2024-01-01 10:00:00"))).toDS()
    // stream: genuine txn at B (slow travel: a month later)
    val batch1 = Seq(Transaction(1L, 101L, 10.0, 1L, 22222, "01-02-2024 10:00:00")).toDS()
    val master1 = FraudStream.classify(batch1, snap1, zipBc, cfg).toDF()
    assert(master1.select("status").as[String].head() == "GENUINE")

    // restart: fresh batch snapshot still carries the STALE location (A) —
    // the batch layer only owns (ucl, score)
    val snap2batch = Seq((1L, 900.0, 700, 11111, "2024-01-01 10:00:00"))
      .toDF("card_id", "ucl", "score", "postcode", "transaction_dt")
    val streamState = FraudStream.stateFromMaster(master1, cfg)
    // normalized to batch format for the merged snapshot
    assert(streamState.select("transaction_dt").as[String].head() == "2024-02-01 10:00:00")
    val merged = FraudBatch.mergeLookup(snap2batch, streamState)
    val mergedRow = merged.head()
    assert(mergedRow.getDouble(1) == 900.0) // refreshed ucl from batch
    assert(mergedRow.getInt(2) == 22222) // stream's location wins

    // phase 2: txn back at A ten seconds after the stream's last position —
    // impossible travel ONLY if the stream state survived the refresh
    val batch2 = Seq(Transaction(1L, 101L, 10.0, 2L, 11111, "01-02-2024 10:00:10")).toDS()
    val snap2 = merged.select(
      col("card_id"), col("ucl").cast("double"), col("score").cast("int"),
      col("postcode").cast("int"), col("transaction_dt")).as[CardLookup]
    val labeled2 = FraudStream.classify(batch2, snap2, zipBc, cfg)
    assert(labeled2.collect().map(_.status).toSeq == Seq("FRAUD"))

    // counterfactual: seeding from the stale batch snapshot alone would
    // have missed it (A → A looks like zero travel)
    val snapStale = snap2batch.select(
      col("card_id"), col("ucl").cast("double"), col("score").cast("int"),
      col("postcode").cast("int"), col("transaction_dt")).as[CardLookup]
    val labeledStale = FraudStream.classify(batch2, snapStale, zipBc, cfg)
    assert(labeledStale.collect().map(_.status).toSeq == Seq("GENUINE"))
  }
}
