package graft

import org.apache.spark.sql.functions._

/** Hand-computed goldens for the round-14 inline queries, driven through
  * the REAL query entry points over crafted parquet fixtures (the same
  * Tables path the driver uses): windowed funnel anchor/deadline
  * semantics, the all-integer seasonal identity on a flat series, and a
  * serial-Lloyd equivalence for the 3-round clustering.
  */
class QueryGoldenSpec extends SparkSuite {

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft-golden").toString

  private def writeEvents(dir: String, rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("q_window_funnel golden: anchors, deadlines, and step order") {
    val dir = fixtureDir()
    writeEvents(dir, Seq(
      // user 1: clean 3-step chain inside 72 h → depth 3
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (2L, "2024-01-01 01:00:00", 1L, "click", 1.0),
      (3L, "2024-01-01 02:00:00", 1L, "purchase", 1.0),
      // user 2: first anchor's click lands outside ITS 72 h window, but a
      // later anchor catches it → max depth 2 over 2 anchors
      (4L, "2024-01-01 00:00:00", 2L, "view", 1.0),
      (5L, "2024-01-04 07:00:00", 2L, "view", 1.0),
      (6L, "2024-01-04 08:00:00", 2L, "click", 1.0),
      // user 3: purchase BEFORE the click — step order blocks depth 3
      (7L, "2024-01-01 00:00:00", 3L, "view", 1.0),
      (8L, "2024-01-01 01:00:00", 3L, "purchase", 1.0),
      (9L, "2024-01-01 02:00:00", 3L, "click", 1.0),
      // user 4: no view at all → absent from the output
      (10L, "2024-01-01 00:00:00", 4L, "click", 1.0),
    ))
    val got = SparkEntry.queries("q_window_funnel")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((3, 1L)), 2L -> ((2, 2L)), 3L -> ((2, 1L))))
  }

  test("q_seasonal golden: a flat series decomposes to trend = level, zero seasonal/residual") {
    val dir = fixtureDir()
    writeEvents(dir, (1 to 14).map(d =>
      (d.toLong, f"2024-01-$d%02d 12:00:00", 1L, "view", 2.0)))
    val got = SparkEntry.queries("q_seasonal")(spark, dir).collect()
    assert(got.length == 14)
    got.foreach { r =>
      assert(r.getLong(2) == 2000000L, "daily_micros")
      assert(r.getLong(3) == 2000000L, "trend_micros")
      assert(r.getLong(4) == 0L, "seasonal_micros")
      assert(r.getLong(5) == 0L, "residual_micros")
    }
  }

  test("q_kmeans3 matches a serial integer Lloyd on crafted embeddings") {
    val dir = fixtureDir()
    val s = spark
    import s.implicits._
    // 12 vectors in 2-D (padded), two obvious blobs; init = first 8 ids,
    // so several seed centroids start inside the same blob and the
    // recompute rounds must actually move them
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 12L).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      i -> Array(base + rnd.nextFloat(), base - rnd.nextFloat(), 0.5f, -0.25f)
    }
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_kmeans3")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // serial replica: quantize at 1e3, 3 assignments, integer-mean
    // recompute between, ties by (d2, cid)
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)
    }.toMap
    var cents: Map[Long, Array[Long]] =
      q.toSeq.sortBy(_._1).take(8).toMap.map(identity)
    def assign(): Map[Long, (Long, Long)] = q.map { case (id, v) =>
      val best = cents.toSeq.map { case (cid, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min
      id -> ((best._2, best._1))
    }
    def recompute(asg: Map[Long, (Long, Long)]): Unit =
      cents = asg.groupBy(_._2._1).map { case (cid, m) =>
        val members = m.keys.map(q).toSeq
        // plain Long '/' truncates toward zero — matching Spark `div`
        // and DuckDB `//` (floorDiv would differ on negative sums)
        cid -> Array.tabulate(4)(d => members.map(_(d)).sum / members.size)
      }
    val a1 = assign(); recompute(a1)
    val a2 = assign(); recompute(a2)
    val a3 = assign()
    assert(got == a3.map { case (id, (cid, d2)) => id -> ((cid, d2)) })
  }
}
