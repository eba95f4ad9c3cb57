package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time windowed aggregation with a watermark — the Structured
  * Streaming shape the reference's DStream layer lacks (K6 documents its
  * arrival-order semantics; this pins the upgrade path: bounded state,
  * late-data drop).
  */
class WatermarkSpec extends SparkSuite {

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("tumbling window with watermark finalizes on watermark pass and drops late rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("wstart"), $"n")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts("10:00"), 1L), (ts("10:01"), 2L))
      q.processAllAvailable() // watermark still before the window end — nothing emitted
      assert(spark.table("win").count() == 0)

      input.addData((ts("10:30"), 3L)) // advances watermark to 10:20 at batch end
      q.processAllAvailable()
      input.addData((ts("10:31"), 4L)) // next batch emits the finalized window
      q.processAllAvailable()
      val rows = spark.table("win").collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(rows.get(ts("10:00")).contains(2L)) // [10:00,10:05) finalized with both rows

      input.addData((ts("10:02"), 5L)) // later than watermark — dropped
      input.addData((ts("10:32"), 6L))
      q.processAllAvailable()
      val after = spark.table("win").collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(after.get(ts("10:00")).contains(2L)) // count unchanged: late row discarded
    } finally q.stop()
  }

  test("session window in streaming mode merges overlapping sessions and finalizes on watermark") {
    // the streaming twin of q_window_session: the same session_window()
    // expression under a watermark — state is per open session, closed and
    // emitted once the watermark passes the gap
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "uid")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"uid")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("sstart"), $"uid", $"n")
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append).start()
    try {
      // two events 3 min apart -> ONE session (gap < 5 min); a third at 10:20
      // starts a new session for the same user
      input.addData((ts("10:00"), 1L), (ts("10:03"), 1L), (ts("10:20"), 1L))
      q.processAllAvailable()
      input.addData((ts("10:45"), 1L)) // watermark to 10:35: both sessions finalize
      q.processAllAvailable()
      input.addData((ts("10:46"), 1L)) // emit batch
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getTimestamp(0), r.getLong(2))).toMap
      assert(rows.get(ts("10:00")).contains(2L)) // merged 10:00+10:03 session
      assert(rows.get(ts("10:20")).contains(1L)) // separate later session
    } finally q.stop()
  }
}
