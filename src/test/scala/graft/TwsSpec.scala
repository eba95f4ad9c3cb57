package graft

import graft.model._
import graft.streaming.{FraudStream, FraudStreamTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState path (Spark 4 StatefulProcessor) against the
  * flatMapGroupsWithState path: same fold, same labels, same carried state
  * across micro-batches — on a real MemoryStream with the RocksDB state
  * store (the only provider transformWithState streams on).
  */
class TwsSpec extends SparkSuite {

  private val zip = Map(
    "11111" -> (0.0, 0.0),
    "22222" -> (0.0, 90.0),
    "33333" -> (0.1, 0.0),
  )
  private val cfg = FraudConfig()

  private def txn(card: Long, amount: Double, pc: Int, ts: String, pos: Long = 1L) =
    Transaction(card, card + 100, amount, pos, pc, ts)

  test("transformWithState classifier matches flatMapGroupsWithState across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-ckpt").toString
      val input = MemoryStream[Transaction]
      val snapshot = Seq(
        CardLookup(1L, Some(1000.0), Some(700), Some(11111), Some("2024-01-01 10:00:00")),
        CardLookup(2L, Some(50.0), Some(150), None, None), // low score: always FRAUD
      ).toDS()
      val zipBc = spark.sparkContext.broadcast(zip)
      val q = FraudStreamTws.classify(input.toDS(), snapshot, zipBc, cfg)
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("tws_out")
        .start()
      try {
        // batch 0: slow travel (genuine, advances state), low-score card
        input.addData(
          txn(1, 50.0, 33333, "01-01-2024 11:00:00", 1),
          txn(2, 10.0, 11111, "01-01-2024 11:00:00", 2))
        q.processAllAvailable()
        // batch 1: impossible travel from the batch-0 location (fraud, state
        // must have carried 33333 across the micro-batch boundary)
        input.addData(txn(1, 50.0, 22222, "01-01-2024 11:00:10", 3))
        q.processAllAvailable()
        val got = spark.table("tws_out").as[LabeledTransaction].collect()
          .map(t => (t.pos_id, t.status)).toMap
        assert(got == Map(1L -> "GENUINE", 2L -> "FRAUD", 3L -> "FRAUD"))

        // cross-check: the flatMapGroupsWithState path in batch mode over the
        // same replay gives identical labels
        val all = Seq(
          txn(1, 50.0, 33333, "01-01-2024 11:00:00", 1),
          txn(2, 10.0, 11111, "01-01-2024 11:00:00", 2),
          txn(1, 50.0, 22222, "01-01-2024 11:00:10", 3),
        ).toDS()
        val ref = FraudStream.classify(all, snapshot, zipBc, cfg).collect()
          .map(t => (t.pos_id, t.status)).toMap
        assert(ref == got)
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
