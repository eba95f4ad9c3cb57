package graft

import graft.streaming.CorpusStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus ingestion: content dedup within the watermark, quality
  * gate, malformed-payload drop — across micro-batches.
  */
class CorpusStreamSpec extends SparkSuite {

  test("ingest: dedupes redelivered content, gates quality, drops malformed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val out = CorpusStream.ingest(input.toDF().toDF("value"), minWords = 3)
    val q = out.writeStream.format("memory").queryName("corpus_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        """{"doc_id": 1, "text": "a fine long document", "source": "web"}""",
        """{"doc_id": 2, "text": "too short", "source": "web"}""", // < 3 words
        "not json at all",
        """{"doc_id": 4, "text": "1234567 890123 456789 0123", "source": "web"}""", // digit-heavy
      )
      q.processAllAvailable()
      input.addData(
        // doc 5 redelivers doc 1's exact content under a new id — deduped
        """{"doc_id": 5, "text": "a fine long document", "source": "mirror"}""",
        """{"doc_id": 6, "text": "another quality document entirely", "source": "web"}""",
      )
      q.processAllAvailable()
      val got = spark.table("corpus_out").select("doc_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 6L))
      // quality signals surface as columns
      val row = spark.table("corpus_out").filter(col("doc_id") === 1L)
        .select("n_words", "content_md5").head()
      assert(row.getLong(0) == 4L && row.getString(1).length == 32)
    } finally q.stop()
  }
}
