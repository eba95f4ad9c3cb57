package graft

import graft.model._
import graft.streaming.FraudStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.{Files, Paths}

/** The classifier behind a real readStream source (file source — the same
  * decode → classify → sink graph the Kafka wiring uses, S13/K1 without a
  * broker): JSON lines appear in a directory, micro-batches classify them,
  * state carries across files.
  */
class FileStreamSpec extends SparkSuite {

  test("file-source stream: decode, classify, state across micro-batches") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-filestream").toString
    val inDir = s"$dir/in"
    Files.createDirectories(Paths.get(inDir))
    val zipBc = spark.sparkContext.broadcast(Map(
      "11111" -> (0.0, 0.0), "22222" -> (0.0, 90.0)))
    val snapshot = Seq(CardLookup(1L, Some(1000.0), Some(700), None, None)).toDS()

    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(inDir)
    val q = FraudStream.classify(FraudStream.decode(raw), snapshot, zipBc)
      .writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Append).start()
    try {
      // file 1: genuine at A
      Files.writeString(Paths.get(s"$inDir/b1.jsonl"),
        """{"card_id": 1, "member_id": 101, "amount": 10.0, "pos_id": 1, "postcode": 11111, "transaction_dt": "01-02-2024 10:00:00"}""" + "\n")
      q.processAllAvailable()
      // file 2: impossible travel to B 10s later — state from file 1 must carry
      Files.writeString(Paths.get(s"$inDir/b2.jsonl"),
        """{"card_id": 1, "member_id": 101, "amount": 10.0, "pos_id": 2, "postcode": 22222, "transaction_dt": "01-02-2024 10:00:10"}""" + "\n")
      q.processAllAvailable()
      val got = spark.table("fs_out").orderBy("pos_id")
        .select("status").as[String].collect().toSeq
      assert(got == Seq("GENUINE", "FRAUD"))
    } finally q.stop()
  }
}
