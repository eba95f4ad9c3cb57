package graft.batch

import graft.model.FraudConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 12-step batch lookup build (FDProcBatch.txt:1-358;
  * SURVEY §3 EP1) as composable, pure DataFrame stages.
  *
  * Scale notes (100 TB): `cardScore` broadcasts the member_score dimension
  * (small per README.md:319 "cached in memory"); `lastTenGenuine`, `cardUcl`
  * and `latestZip` all partition by `card_id`, so Catalyst reuses one
  * hash-partitioning across window → filter → aggregate without a second
  * shuffle; the final 3-way join joins three already-card_id-partitioned
  * sides. Heavy skew on a hot card is bounded by the rn<=10 cut upstream of
  * the aggregate.
  */
object FraudBatch {

  /** Step 5 (J1): per-card credit score — card_member ⋈ member_score on
    * member_id (FDProcBatch.txt:262-267).
    */
  def cardScore(cardMember: DataFrame, memberScore: DataFrame): DataFrame =
    cardMember.select("card_id", "member_id")
      .join(broadcast(memberScore), Seq("member_id"))
      .select("card_id", "score")

  /** Step 6 (P2+W1): last 10 GENUINE transactions per card, ordered by the
    * parsed batch timestamp descending (FDProcBatch.txt:279-293). Ties break
    * on pos_id for determinism (the reference leaves tie order unspecified).
    */
  def lastTenGenuine(tx: DataFrame, cfg: FraudConfig = FraudConfig()): DataFrame = {
    val w = Window.partitionBy("card_id")
      .orderBy(unix_timestamp(col("transaction_dt"), cfg.batchTsFormat).desc, col("pos_id").desc)
    tx.filter(col("status") === cfg.genuineLabel)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("card_id", "amount", "postcode", "transaction_dt", "status")
  }

  /** Step 7 (A1): UCL = mean + 3σ(population) over the last-10 set
    * (FDProcBatch.txt:305-310). Hive's STDDEV is population σ — pinned in
    * FraudBatchSpec.
    */
  def cardUcl(lastTen: DataFrame): DataFrame =
    lastTen.groupBy("card_id")
      .agg((avg("amount") + lit(3) * coalesce(stddev_pop("amount"), lit(0.0))).as("ucl"))

  /** Step 8 (W2): latest postcode + timestamp per card
    * (FDProcBatch.txt:322-333).
    */
  def latestZip(tx: DataFrame, cfg: FraudConfig = FraudConfig()): DataFrame = {
    val w = Window.partitionBy("card_id")
      .orderBy(unix_timestamp(col("transaction_dt"), cfg.batchTsFormat).desc, col("pos_id").desc)
    tx.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("card_id", "postcode", "transaction_dt")
  }

  /** Step 9 (J2): assemble the lookup row — score ⋈ ucl ⋈ latest-zip on
    * card_id (FDProcBatch.txt:345-354). Output schema matches
    * card_transactions_lookup (FDProcBatch.txt:158-169).
    */
  def buildLookup(score: DataFrame, ucl: DataFrame, latest: DataFrame): DataFrame =
    ucl.join(latest, Seq("card_id"))
      .join(score, Seq("card_id"))
      .select("card_id", "ucl", "postcode", "transaction_dt", "score")

  /** EP3 dual-writer merge (SURVEY §3 EP3, §7.5): the lookup table has two
    * writers racing column-wise — the batch refresh owns (ucl, score)
    * (README.md:244,282) and the stream owns (postcode, transaction_dt)
    * (HBaseTransLink.java:76-81). On (re)start the fresh batch snapshot's
    * parameters are merged with the stream's last-known location/time:
    * full-outer on card_id, each column taken from its owner, falling back
    * to the other side when the owner has no row (a card seen only by the
    * stream keeps its location; a card with no stream history yet keeps the
    * batch's last-known location).
    */
  def mergeLookup(batchSnapshot: DataFrame, streamState: DataFrame): DataFrame = {
    val b = batchSnapshot.select(
      col("card_id"), col("ucl").as("b_ucl"), col("score").as("b_score"),
      col("postcode").as("b_postcode"), col("transaction_dt").as("b_dt"))
    val s = streamState.select(
      col("card_id"), col("ucl").as("s_ucl"), col("score").as("s_score"),
      col("postcode").as("s_postcode"), col("transaction_dt").as("s_dt"))
    b.join(s, Seq("card_id"), "full_outer")
      .select(
        col("card_id"),
        coalesce(col("b_ucl"), col("s_ucl")).as("ucl"),
        coalesce(col("s_postcode"), col("b_postcode")).as("postcode"),
        coalesce(col("s_dt"), col("b_dt")).as("transaction_dt"),
        coalesce(col("b_score"), col("s_score")).as("score"),
      )
  }

  /** The full pipeline: history + dimensions → lookup snapshot (EP1). */
  def lookupPipeline(
      tx: DataFrame,
      cardMember: DataFrame,
      memberScore: DataFrame,
      cfg: FraudConfig = FraudConfig(),
  ): DataFrame = {
    val genuine = lastTenGenuine(tx, cfg)
    buildLookup(cardScore(cardMember, memberScore), cardUcl(genuine), latestZip(tx, cfg))
  }
}
