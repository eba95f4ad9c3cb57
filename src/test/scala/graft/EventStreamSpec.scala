package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time session windows and the watermarked stream-stream interval
  * join, driven through real MemoryStream micro-batch runs: session merge
  * across batches, append-mode finalization only past the watermark, late
  * events dropped after state eviction, and the interval join's ±tolerance
  * boundary on both sides.
  */
class EventStreamSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class Pur(user_id: Long, p_ts: Timestamp, amount: Double)
  case class Err(e_user: Long, e_ts: Timestamp)

  test("session windows: merge within gap, finalize past watermark, drop late stragglers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionAgg(input.toDF(), gap = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append).start()
    try {
      // one session in three pieces across two batches: 10:00, 10:05 then
      // 10:12 — the 10:12 arrival MERGES into [10:00, 10:22) because the
      // watermark (10:00+05 − 10 min) hasn't closed it yet
      input.addData(Ev(1, ts("2026-01-01 10:00:00"), 1.0), Ev(1, ts("2026-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts("2026-01-01 10:12:00"), 3.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0, "no session may emit before the watermark passes its end")
      // 11:00 advances the watermark to 10:50 > 10:22 → session 1 emits
      // (on the FOLLOWING trigger; the empty addData forces it)
      input.addData(Ev(1, ts("2026-01-01 11:00:00"), 4.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts("2026-01-01 11:40:00"), 5.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts("2026-01-01 12:40:00"), 6.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(rows.contains((1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 10:22:00"), 3L, 6.0)),
        s"merged session missing: ${rows.mkString("; ")}")
      assert(rows.contains((1L, ts("2026-01-01 11:00:00"), ts("2026-01-01 11:10:00"), 1L, 4.0)))
      assert(rows.contains((2L, ts("2026-01-01 11:40:00"), ts("2026-01-01 11:50:00"), 1L, 5.0)))
      // a straggler INSIDE the long-finalized first session must not
      // resurrect it (state was evicted at finalization)
      val before = spark.table("sessions").count()
      input.addData(Ev(1, ts("2026-01-01 10:03:00"), 99.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts("2026-01-01 13:40:00"), 7.0))
      q.processAllAvailable()
      val after = spark.table("sessions")
        .filter("user_id = 1 AND session_start = '2026-01-01 10:00:00'").collect()
      assert(after.length == 1 && after(0).getLong(3) == 3L,
        "late straggler resurrected or duplicated a finalized session")
      assert(!spark.table("sessions").collect()
        .exists(r => r.getDouble(4) == 99.0), "late straggler emitted its own session")
      assert(spark.table("sessions").count() >= before)
    } finally q.stop()
  }

  test("interval join: ±tolerance on event time, same user only, state evicted past watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[Pur]
    val eIn = MemoryStream[Err]
    val q = EventStream.intervalJoin(pIn.toDF(), eIn.toDF(), toleranceSec = 120, watermark = "5 minutes")
      .writeStream.format("memory").queryName("correlated").outputMode(OutputMode.Append).start()
    try {
      pIn.addData(Pur(1, ts("2026-01-01 10:00:00"), 42.0))
      eIn.addData(
        Err(1, ts("2026-01-01 09:59:00")),  // −60 s: match
        Err(1, ts("2026-01-01 10:01:30")),  // +90 s: match
        Err(1, ts("2026-01-01 10:02:01")),  // +121 s: out of tolerance
        Err(2, ts("2026-01-01 10:00:30")),  // other user
      )
      q.processAllAvailable()
      val got = spark.table("correlated")
        .collect().map(r => (r.getLong(0), r.getLong(4))).sorted
      assert(got.toSeq == Seq((1L, -60L), (1L, 90L)), s"got ${got.mkString(";")}")
      // advance both watermarks far past 10:00 (+tolerance), evicting the
      // purchase from join state — a very late error may not match it
      pIn.addData(Pur(9, ts("2026-01-01 11:00:00"), 1.0))
      eIn.addData(Err(9, ts("2026-01-01 11:30:00")))
      q.processAllAvailable()
      eIn.addData(Err(1, ts("2026-01-01 10:00:30"))) // in-window but LATE
      q.processAllAvailable()
      val stillJust2 = spark.table("correlated")
        .filter("user_id = 1").count()
      assert(stillJust2 == 2, "late error matched an evicted purchase")
    } finally q.stop()
  }

  test("left-outer interval join: unmatched purchases emit null twins only after absence is proven") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[Pur]
    val eIn = MemoryStream[Err]
    val q = EventStream.intervalJoinCleared(pIn.toDF(), eIn.toDF(),
        toleranceSec = 120, watermark = "5 minutes")
      .writeStream.format("memory").queryName("cleared").outputMode(OutputMode.Append).start()
    try {
      // u1 gets a match; u2 gets none — but u2's null twin may NOT appear
      // until the error-side watermark passes 10:00 + tolerance
      pIn.addData(Pur(1, ts("2026-01-01 10:00:00"), 42.0), Pur(2, ts("2026-01-01 10:00:00"), 7.0))
      eIn.addData(Err(1, ts("2026-01-01 10:01:00")))
      q.processAllAvailable()
      val early = spark.table("cleared").collect()
      assert(early.forall(r => !r.isNullAt(3)),
        s"null twin emitted before absence was proven: ${early.mkString(";")}")
      // advance BOTH watermarks well past 10:02 (+tolerance) and flush
      pIn.addData(Pur(9, ts("2026-01-01 11:00:00"), 1.0))
      eIn.addData(Err(9, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      pIn.addData(Pur(9, ts("2026-01-01 12:00:00"), 1.0))
      eIn.addData(Err(9, ts("2026-01-01 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("cleared")
        .filter("user_id IN (1, 2)")
        .collect().map(r => (r.getLong(0), r.isNullAt(3)))
      assert(rows.toSet == Set((1L, false), (2L, true)),
        s"expected u1 matched + u2 cleared-null, got ${rows.mkString(";")}")
      assert(rows.length == 2, "matched purchase must not also emit a null twin")
    } finally q.stop()
  }
}
