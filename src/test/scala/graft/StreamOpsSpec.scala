package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming operators beyond the reference's surface: watermarked
  * deduplication (at-least-once Kafka delivery → exactly-once effects; the
  * reference's auto-commit K5 would double-classify on redelivery) and a
  * stream-stream interval join.
  */
class StreamOpsSpec extends SparkSuite {

  private def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("dropDuplicates with watermark: redelivered records classified once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val deduped = input.toDF().toDF("txn_id", "ts", "amount")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("txn_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("10:00"), 5.0), (2L, ts("10:01"), 6.0))
      q.processAllAvailable()
      input.addData((1L, ts("10:00"), 5.0)) // Kafka redelivery of txn 1
      input.addData((3L, ts("10:02"), 7.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("txn_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L)) // txn 1 exactly once
    } finally q.stop()
  }

  test("stream-stream interval join: transactions enriched by auth events within 5 minutes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val txns = MemoryStream[(Long, Timestamp, Double)]
    val auths = MemoryStream[(Long, Timestamp, String)]
    val t = txns.toDF().toDF("card_id", "t_ts", "amount").withWatermark("t_ts", "10 minutes")
    val a = auths.toDF().toDF("auth_card", "a_ts", "auth_result").withWatermark("a_ts", "10 minutes")
    val joined = t.join(a,
      expr("""card_id = auth_card AND
             |a_ts BETWEEN t_ts - INTERVAL 5 MINUTES AND t_ts""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append).start()
    try {
      auths.addData((7L, ts("10:00"), "OK"))
      txns.addData((7L, ts("10:03"), 42.0)) // within 5 min of its auth
      txns.addData((8L, ts("10:03"), 13.0)) // no auth at all
      auths.addData((9L, ts("09:00"), "OK"))
      txns.addData((9L, ts("10:00"), 99.0)) // auth too old (60 min)
      q.processAllAvailable()
      val got = spark.table("ssjoin_out")
        .select("card_id", "auth_result").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((7L, "OK"))) // only the in-window pair joins
    } finally q.stop()
  }

  test("kmv_sketch and bounded_set run inside a watermarked streaming aggregation") {
    // the custom TypedImperativeAggregates must partial-aggregate and merge
    // under the streaming state store exactly as they do in batch — this is
    // what makes the sketch layer usable in the speed path (distinct-count
    // and neighbor-set maintenance over an unbounded stream at O(k) state)
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.KmvSketch.register(s)
    graft.functions.BoundedSetAgg.register(s)
    val input = MemoryStream[(String, Long, Timestamp)]
    val agg = input.toDF().toDF("grp", "uid", "ts")
      .withWatermark("ts", "10 minutes")
      .withColumn("win", window(col("ts"), "1 hour"))
      .groupBy("grp", "win")
      .agg(expr("kmv_sketch(uid, 4) AS sk"), expr("bounded_set(uid, 3) AS ss"))
    val q = agg.writeStream.format("memory").queryName("sketch_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(("a", 7L, ts("10:00")), ("a", 3L, ts("10:01")), ("a", 7L, ts("10:02")))
      input.addData(("b", 1L, ts("10:00")), ("b", 2L, ts("10:01")),
        ("b", 3L, ts("10:02")), ("b", 4L, ts("10:03")))
      q.processAllAvailable()
      val rows = spark.table("sketch_out")
        .select(col("grp"), col("sk.nd"), col("sk.kth"), col("ss"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
      // a: 2 distinct uids {3, 7}; set fits cap 3
      assert(rows("a")._1 == 2L && rows("a")._2 == 7L)
      assert(rows("a")._3.map(_.asInstanceOf[scala.collection.Seq[Long]].toList) == Some(List(3L, 7L)))
      // b: 4 distinct uids saturate kmv k=4 (kth=4) and overflow bounded_set cap 3 -> null
      assert(rows("b")._1 == 4L && rows("b")._2 == 4L)
      assert(rows("b")._3.isEmpty)
    } finally q.stop()
  }

  test("streamingCountMin: registers equal the batch sketch of the same prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val regs = graft.streaming.CorpusStream
      .streamingCountMin(input.toDF().toDF("k"), "k", depth = 3, width = 16)
    val q = regs.writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val batch1 = Seq("a", "a", "b", "c")
      val batch2 = Seq("a", "d", "d", "e", "b")
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("cms_out").orderBy("row", "bucket").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      // the streaming state after both batches must equal the BATCH sketch
      // of the concatenated prefix, register for register
      val expect = graft.operators.Sketches
        .countMin((batch1 ++ batch2).toDF("k"), "k", 3, 16)
        .orderBy("row", "bucket").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
      // state is the register table: never more than depth*width rows
      assert(got.size <= 3 * 16)
      // and batch-side point estimates off the streaming registers dominate
      // the true counts (overestimate-only)
      val snap = spark.table("cms_out")
      val exact = (batch1 ++ batch2).groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val est = graft.operators.Sketches
        .countMinEstimate(snap, exact.keys.toSeq.toDF("key"), "key", 3, 16)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      exact.foreach { case (k, c) => assert(est(k) >= c, s"key $k: ${est(k)} < $c") }
    } finally q.stop()
  }
}
