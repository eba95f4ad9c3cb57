package graft

import graft.batch.FraudBatch
import graft.model.{CardLookup, FraudConfig}
import graft.sources.Sources
import graft.streaming.FraudStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deployment entry points mirroring the reference's two jobs, so a
  * reference user keeps their operational shape:
  *
  *  - batch: the FDProcBatch.txt runbook as one spark-submit
  *    (`FDProcBatch.txt:1-358`)
  *  - streaming: `spark2-submit ... <broker> <topic> <groupId> <zipCsv>
  *    <hbaseMaster>` (`RTFraudScan.txt:80-87`; FinFraudGuard.java:27-37) —
  *    same argument order, with the HBase master replaced by the lookup
  *    snapshot + master output paths.
  */
object FraudBatchJob {
  /** args: <transactionsCsv> <cardMemberCsv> <memberScoreCsv> <lookupOutPath> */
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: FraudBatchJob <transactionsCsv> <cardMemberCsv> <memberScoreCsv> <lookupOutPath>")
    val Array(txCsv, memberCsv, scoreCsv, outPath) = args
    val b = SparkSession.builder().appName("graft-fraud-batch")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // spark-submit provides spark.master; default to local[*] for direct runs
    val spark = (if (sys.props.contains("spark.master")) b else b.master("local[*]")).getOrCreate()
    val lookup = FraudBatch.lookupPipeline(
      Sources.readTransactionsCsv(spark, txCsv),
      spark.read.schema(Sources.cardMemberSchema).option("header", "true").csv(memberCsv),
      spark.read.schema(Sources.memberScoreSchema).option("header", "true").csv(scoreCsv),
    )
    Sources.overwriteSnapshot(lookup, outPath)
    println(s"lookup snapshot written: $outPath (${spark.read.parquet(outPath).count()} cards)")
    spark.stop()
  }
}

object FraudStreamJob {
  /** args: <broker> <topic> <groupId> <zipCodeCsvPath> <lookupSnapshotPath>
    *       <masterOutPath> <checkpointPath>
    * (first four match FinFraudGuard.java:27-37; the HBase master arg
    * becomes the snapshot/master/checkpoint paths)
    */
  def main(args: Array[String]): Unit = {
    require(args.length == 7,
      "usage: FraudStreamJob <broker> <topic> <groupId> <zipCsv> <lookupSnapshot> <masterOut> <checkpoint>")
    val Array(broker, topic, _, zipCsv, lookupPath, masterPath, checkpoint) = args
    val b = SparkSession.builder().appName("graft-fraud-stream")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    val spark = (if (sys.props.contains("spark.master")) b else b.master("local[*]")).getOrCreate()
    import spark.implicits._
    val cfg = FraudConfig()
    val snapshot = spark.read.parquet(lookupPath)
      .select(col("card_id"), col("ucl").cast("double"), col("score").cast("int"),
        col("postcode").cast("int"), col("transaction_dt"))
      .as[CardLookup]
    val zipBc = graft.geo.Geo.broadcastZipMap(spark, zipCsv)
    // GRAFT_STATE_API=tws selects the transformWithState/RocksDB path
    val stateApi = sys.env.getOrElse("GRAFT_STATE_API", "fmgws")
    val query = FraudStream.run(spark, broker, topic, snapshot, zipBc,
      masterPath, checkpoint, cfg, stateApi).start()
    query.awaitTermination()
  }
}
