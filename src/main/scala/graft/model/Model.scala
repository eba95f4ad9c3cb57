package graft.model

/** Domain model of the reference pipeline (SURVEY.md §1).
  *
  * Timestamps stay STRING end-to-end like the reference
  * (FDProcBatch.txt:66,289; FinFraudGuard.java:76-78) and are parsed on
  * demand with the per-path format from [[FraudConfig]].
  */

/** Streaming payload (TransFraudModel.java:9-25; README.md:38-46). */
final case class Transaction(
    card_id: Long,
    member_id: Long,
    amount: Double,
    pos_id: Long,
    postcode: Int,
    transaction_dt: String,
)

/** Historical fact row (FDProcBatch.txt:70-82). */
final case class TransactionHistory(
    card_id: Long,
    member_id: Long,
    amount: Double,
    postcode: Int,
    pos_id: Long,
    transaction_dt: String,
    status: String,
)

/** card_member dimension (FDProcBatch.txt:177-187). */
final case class CardMember(
    card_id: Long,
    member_id: Long,
    member_joining_dt: String,
    card_purchase_dt: String,
    country: String,
    city: String,
)

/** member_score dimension (FDProcBatch.txt:190-196). */
final case class MemberScore(member_id: Long, score: Int)

/** Lookup-table row (FDProcBatch.txt:158-169; TransQueryLog.java:8-12).
  * All parameters nullable: the reference extracts each HBase column
  * null-tolerantly (HBaseTransLink.java:39-49) — a missing value makes the
  * corresponding rule abstain (SURVEY §7.1).
  */
final case class CardLookup(
    card_id: Long,
    ucl: Option[Double],
    score: Option[Int],
    postcode: Option[Int],
    transaction_dt: Option[String],
)

/** Labeled output row (master-table insert, HBaseTransLink.java:63-73). */
final case class LabeledTransaction(
    card_id: Long,
    member_id: Long,
    amount: Double,
    pos_id: Long,
    postcode: Int,
    transaction_dt: String,
    status: String,
)

/** Zip geo dimension row (GeoGraudData.csv via FraudDistMetric.java:41-52). */
final case class ZipInfo(
    zip: String,
    lat: Double,
    lon: Double,
    city: String,
    state: String,
    post_id: String,
)

/** Policy for a transaction whose postcode is absent from the zip dimension.
  * The reference throws inside a swallowed try/catch
  * (FraudDistMetric.java:59-66); default here is Abstain (speed rule cannot
  * fire), with Fail available for strictness.
  */
sealed trait UnknownZipPolicy
object UnknownZipPolicy {
  case object Abstain extends UnknownZipPolicy
  case object Fail extends UnknownZipPolicy
}

/** Engine configuration; defaults follow the executable layer of the
  * reference where spec and code disagree (SURVEY §0 fork table, §7.1):
  * 0.25 km/s (FinFraudGuard.java:82), score < 200 (same line), labels
  * GENUINE/FRAUD, batch ts `yyyy-MM-dd HH:mm:ss` (FDProcBatch.txt:289) vs
  * streaming ts `dd-MM-yyyy HH:mm:ss` (FinFraudGuard.java:76).
  */
final case class FraudConfig(
    speedThresholdKmPerSec: Double = 0.25,
    scoreThreshold: Int = 200,
    batchTsFormat: String = "yyyy-MM-dd HH:mm:ss",
    streamTsFormat: String = "dd-MM-yyyy HH:mm:ss",
    genuineLabel: String = "GENUINE",
    fraudLabel: String = "FRAUD",
    unknownZip: UnknownZipPolicy = UnknownZipPolicy.Abstain,
)
