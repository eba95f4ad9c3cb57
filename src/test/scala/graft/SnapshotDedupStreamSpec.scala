package graft

import graft.streaming.CorpusStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-static snapshot near-dup guard: arriving docs that near-dup a
  * static snapshot surface exactly once, unique docs never surface, and
  * the flag agrees with the batch `Dedup.incrementalDedup` verdict on
  * the same corpus split (the lambda-layer agreement check).
  */
class SnapshotDedupStreamSpec extends SparkSuite {

  private val snapshotDocs = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota",
    3L -> "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20",
    5L -> "completely different snapshot content lives here",
  )
  private val arrivals = Seq(
    10L -> "alpha beta gamma delta epsilon zeta eta theta iota", // exact dup of 1
    12L -> "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20 tail", // near-dup of 3
    14L -> "nothing matches this arriving document at all",      // unique
  )

  test("flags stream docs that near-dup the snapshot, once each, batch-consistent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val snap = CorpusStream.prepareSnapshot(
      snapshotDocs.toDF("doc_id", "text"), "doc_id", "text").cache()
    val input = MemoryStream[String]
    val flagged = CorpusStream.snapshotNearDups(
      CorpusStream.decode(input.toDF().toDF("value")), snap, "doc_id", "text")
    val q = flagged.writeStream.format("memory").queryName("snap_dup_out")
      .outputMode(OutputMode.Append).start()
    try {
      arrivals.foreach { case (id, t) =>
        input.addData(s"""{"doc_id": $id, "text": "$t", "source": "web"}""")
      }
      q.processAllAvailable()
      // a redelivery in a later batch inside the watermark stays collapsed
      input.addData("""{"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta eta theta iota", "source": "web"}""")
      q.processAllAvailable()
      val got = spark.table("snap_dup_out")
        .select("doc_id", "dup_of", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(10L, 12L), s"flagged: ${got.toSeq}")
      assert(got(0)._2 == 1L && got(0)._3 == 1.0)      // exact twin, one witness
      assert(got(1)._2 == 3L && got(1)._3 == 20.0 / 21.0)
      // lambda agreement: the batch incremental dedup on the same split
      // flags exactly the same arriving ids
      val combined = (snapshotDocs ++ arrivals).toDF("doc_id", "text")
      val batch = graft.operators.Dedup.incrementalDedup(
          combined, "doc_id", "text", col("doc_id") >= 10L)
        .filter(col("is_dup")).select("doc_id").collect().map(_.getLong(0)).sorted
      assert(batch.toSeq == got.map(_._1).toSeq)
    } finally q.stop()
  }
}
