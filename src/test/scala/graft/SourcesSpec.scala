package graft

import graft.sources.Sources
import java.nio.file.Files

/** Sink/reader roundtrips: CSV with declared schema + header skip (S4), zip
  * CSV with malformed-row drop (S5), ORC+snappy staging write (S6),
  * overwrite snapshot (S8), uuid append master (S11).
  */
class SourcesSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sources").toString

  test("transactions CSV: declared schema, header skipped") {
    val dir = tmp()
    val p = s"$dir/tx.csv"
    Files.writeString(java.nio.file.Paths.get(p),
      """card_id,member_id,amount,postcode,pos_id,transaction_dt,status
        |1,101,42.50,10524,9001,2024-01-01 10:00:00,GENUINE
        |2,102,13.37,10001,9002,2024-01-01 11:00:00,FRAUDULENT
        |""".stripMargin)
    val df = Sources.readTransactionsCsv(spark, p)
    assert(df.schema == Sources.transactionHistorySchema)
    assert(df.count() == 2)
    assert(df.filter($"card_id" === 1).head().getDouble(2) == 42.50)
  }

  test("zip CSV: wrong-field-count rows dropped (FraudDistMetric.java:43)") {
    val dir = tmp()
    val p = s"$dir/zip.csv"
    Files.writeString(java.nio.file.Paths.get(p),
      """10524,41.3706,-73.922,Garrison,New York,008478487970070
        |badrow,1.0
        |10001,40.7506,-73.9971,New York,New York,761343519600829
        |""".stripMargin)
    val df = Sources.readZipCsv(spark, p)
    assert(df.count() == 2)
    val m = graft.geo.Geo.zipMap(spark, p)
    assert(m.keySet == Set("10524", "10001"))
    assert(m("10524") == ((41.3706, -73.922)))
  }

  test("JSON lines roundtrip with the streaming payload schema") {
    val dir = tmp()
    val p = s"$dir/tx.jsonl"
    Files.writeString(java.nio.file.Paths.get(p),
      """{"card_id": 1, "member_id": 101, "amount": 42.5, "pos_id": 9001, "postcode": 10524, "transaction_dt": "12-08-2026 10:15:30"}
        |{"card_id": 2, "member_id": 102, "amount": 13.37, "pos_id": 9002, "postcode": 10001, "transaction_dt": "12-08-2026 11:00:00"}
        |""".stripMargin)
    val df = Sources.readJsonLines(spark, p, graft.streaming.FraudStream.payloadSchema)
    assert(df.count() == 2)
    assert(df.filter($"card_id" === 1).head().getDouble(2) == 42.5)
    val out = s"$dir/out"
    Sources.writeJsonLines(df, out)
    val back = Sources.readJsonLines(spark, out, graft.streaming.FraudStream.payloadSchema)
    assert(back.orderBy("card_id").collect().toSeq == df.orderBy("card_id").collect().toSeq)
  }

  test("ORC+snappy staging write roundtrips") {
    val out = tmp() + "/orc"
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("card_id", "ucl")
    Sources.writeOrcSnappy(df, out)
    val back = spark.read.orc(out)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("card_id", "ucl"))
  }

  test("overwrite snapshot replaces; uuid append accumulates with unique row ids") {
    val snap = tmp() + "/snap"
    Sources.overwriteSnapshot(Seq((1L, 1.0)).toDF("card_id", "ucl"), snap)
    Sources.overwriteSnapshot(Seq((2L, 2.0), (3L, 3.0)).toDF("card_id", "ucl"), snap)
    assert(spark.read.parquet(snap).count() == 2) // second overwrite wins

    val master = tmp() + "/master"
    val batch = Seq((1L, "GENUINE"), (2L, "FRAUD")).toDF("card_id", "status")
    Sources.appendWithUuid(batch, master)
    Sources.appendWithUuid(batch, master)
    val got = spark.read.parquet(master)
    assert(got.count() == 4) // append mode accumulates
    assert(got.select("rowid").distinct().count() == 4) // fresh uuid per row
    assert(got.select("rowid").as[String].head().matches("[0-9a-f]{32}")) // dashes stripped
  }

  test("appendMasterBatch: deterministic rowid, replaying a batchId does not duplicate") {
    val master = tmp() + "/master"
    val b0 = Seq((1L, "GENUINE"), (2L, "FRAUD")).toDF("card_id", "status")
    Sources.appendMasterBatch(b0, master, batchId = 0L)
    Sources.appendMasterBatch(b0, master, batchId = 0L) // foreachBatch replay
    val afterReplay = spark.read.parquet(master)
    assert(afterReplay.count() == 2) // overwrite, not append
    val b1 = Seq((3L, "GENUINE")).toDF("card_id", "status")
    Sources.appendMasterBatch(b1, master, batchId = 1L)
    val got = spark.read.parquet(master)
    assert(got.count() == 3) // distinct epochs accumulate
    assert(got.select("rowid").distinct().count() == 3)
    assert(got.select("batch_id").distinct().count() == 2)
  }

  test("appendMasterBatch: rowid is unique across null-position twins and exact duplicates") {
    val master = tmp() + "/master"
    // rows differing only in WHICH column is null (a bare concat_ws would
    // collapse them), plus two identical duplicate rows in the same batch
    val batch = Seq(
      (Option("a"), Option.empty[String]),
      (Option.empty[String], Option("a")),
      (Option("dup"), Option("dup")),
      (Option("dup"), Option("dup")),
    ).toDF("c1", "c2")
    Sources.appendMasterBatch(batch, master, batchId = 0L)
    val got = spark.read.parquet(master)
    assert(got.count() == 4)
    assert(got.select("rowid").distinct().count() == 4) // all four distinct
    // and still deterministic: a replay produces the same rowid set
    val first = got.select("rowid").as[String].collect().sorted.toSeq
    Sources.appendMasterBatch(batch, master, batchId = 0L)
    val replay = spark.read.parquet(master).select("rowid").as[String].collect().sorted.toSeq
    assert(replay == first)
  }
}
