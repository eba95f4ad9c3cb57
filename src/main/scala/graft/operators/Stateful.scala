package graft.operators

import graft.{GraftQuery, Tables}
import graft.model.{CardLookup, FraudConfig, Transaction}
import graft.streaming.FraudStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** K3 — the keyed mutable read-modify-write classifier — exposed through the
  * driver's query surface by replaying `events` as a transaction stream in
  * batch mode (flatMapGroupsWithState has identical semantics on a batch
  * Dataset). The per-card fold is order-dependent (only GENUINE advances the
  * location/time state), which plain SQL cannot express — no oracle; the
  * driver records the rows-only check and StreamingSpec pins the semantics
  * against hand-computed scenarios.
  */
object Stateful {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_stateful_classify",
      (s, dir) => {
        import s.implicits._
        val cfg = FraudConfig()
        val e = Tables(s, dir, "events")
        val k = get_json_object(col("props"), "$.k").cast(IntegerType)
        // events → Transaction: user=card, value=amount, payload k=postcode,
        // streaming day-first timestamp format (FinFraudGuard.java:76)
        val txns = e.select(
          col("user_id").as("card_id"),
          col("user_id").as("member_id"),
          col("value").as("amount"),
          col("event_id").as("pos_id"),
          k.as("postcode"),
          date_format(col("ts"), "dd-MM-yyyy HH:mm:ss").as("transaction_dt"),
        ).as[Transaction]
        // zip dimension analog: every payload k is a "zip" on the same
        // deterministic grid as Relational.withCoords
        val zip: Map[String, (Double, Double)] = (0 until 100).map { kk =>
          kk.toString -> ((kk * 37 % 140 - 70) + 0.5, (kk * 73 % 340 - 170) + 0.25)
        }.toMap
        val zipBc = s.sparkContext.broadcast(zip)
        // seed state: ucl from the batch layer (last-10 stats), score from the
        // customer dimension — the EP3 dual-writer split
        val ucl = Relational.uclPerUserPublic(e)
        val score = Tables(s, dir, "customer")
          .select(col("c_custkey").as("card_id"), col("c_acctbal").cast(IntegerType).as("score"))
        val snapshot = ucl.withColumnRenamed("user_id", "card_id")
          .join(score, Seq("card_id"), "left")
          .select(
            col("card_id"),
            col("ucl"),
            col("score"),
            lit(null).cast(IntegerType).as("postcode"),
            lit(null).cast("string").as("transaction_dt"),
          ).as[CardLookup]
        FraudStream.classify(txns, snapshot, zipBc, cfg)
          .toDF()
          .select("card_id", "pos_id", "amount", "status")
          .orderBy("pos_id")
      },
      oracle = None,
    ),
  )
}
