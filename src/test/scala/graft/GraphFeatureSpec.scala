package graft

import graft.operators.{Analytics, Graph}
import org.apache.spark.sql.functions._

/** Link prediction, deterministic random walks, and the activity-bitmap
  * rollup: hand-computed goldens, partition invariance, and the edge
  * rules (direct edges excluded from candidates, walks stay on
  * adjacency, streak chain exact on crafted masks).
  */
class GraphFeatureSpec extends SparkSuite {

  private def und(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("a", "b")
  }

  test("linkPredict golden: path graph scores the endpoints via the middle") {
    // 1—2—3 plus 2—4: candidates are the 2-hop pairs through node 2:
    // (1,3), (1,4), (3,4), each with cn=1; degrees 1,3,1,1
    val got = Graph.linkPredict(und(Seq((1L, 2L), (2L, 3L), (2L, 4L))), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    // jaccard = 1e6·1/(1+1−1) = 1e6; pref = 1·1
    assert(got == Map(
      (1L, 3L) -> ((1L, 1000000L, 1L, 1)),
      (1L, 4L) -> ((1L, 1000000L, 1L, 2)),
      (3L, 4L) -> ((1L, 1000000L, 1L, 1))))
  }

  test("linkPredict: direct edges are never candidates; cn ranks; k caps") {
    // triangle 1-2-3 plus pendant 2—4, 3—4: (1,4) shares {2,3} → cn 2;
    // all triangle pairs are edges → excluded
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.linkPredict(und(es), k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1: deg 2; 4: deg 2; (1,4) cn=2 — the only non-edge 2-hop pair
    assert(got == Set((1L, 4L, 2L)))
    // jaccard = 1e6·2/(2+2−2) = 1e6; pref = 4
    val full = Graph.linkPredict(und(es), k = 1).collect().head
    assert(full.getLong(3) == 1000000L && full.getLong(4) == 4L)
  }

  test("linkPredict is partition-invariant") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(x => x._1 != x._2)
    val a = Graph.linkPredict(und(es), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(5))).toSet
    val b = Graph.linkPredict(und(es).repartition(13), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(5))).toSet
    assert(a == b)
  }

  test("randomWalks: every hop is a true neighbor, deterministic under repartition") {
    val rnd = new scala.util.Random(19)
    val es = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(x => x._1 != x._2)
    val adj = es.flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val a = Graph.randomWalks(und(es), steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    a.foreach { case (n, h1, h2, h3) =>
      assert(adj(n).contains(h1) && adj(h1).contains(h2) && adj(h2).contains(h3),
        s"walk $n→$h1→$h2→$h3 left the adjacency")
    }
    val b = Graph.randomWalks(und(es).repartition(9), steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("randomWalks golden: a single edge ping-pongs") {
    val got = Graph.randomWalks(und(Seq((5L, 9L))), steps = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((5L, 9L, 5L), (9L, 5L, 9L)))
  }

  private def bitmapOf(rows: Seq[(Long, String)]): Map[Long, (Long, Int, Int, Int, Int, Int)] = {
    val s = spark
    import s.implicits._
    val df = rows.toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("timestamp").as("ts"))
    Analytics.activityBitmap(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
  }

  test("activityBitmap golden: masks, streaks, and week flags") {
    val got = bitmapOf(Seq(
      // user 1: days 1,2,3 (streak 3, week1 only)
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-03 10:00:00"),
      // duplicate same-day activity must not change the mask
      (1L, "2024-01-02 23:59:59"),
      // user 2: days 5 and 25 (streak 1, retained: week1 + week4)
      (2L, "2024-01-05 00:00:00"), (2L, "2024-01-25 12:00:00"),
      // user 3: days 10..15 (streak 6, neither week window)
      (3L, "2024-01-10 01:00:00"), (3L, "2024-01-11 01:00:00"),
      (3L, "2024-01-12 01:00:00"), (3L, "2024-01-13 01:00:00"),
      (3L, "2024-01-14 01:00:00"), (3L, "2024-01-15 01:00:00"),
    ))
    assert(got(1L) == ((7L, 3, 3, 1, 0, 0)))
    assert(got(2L) == (((1L << 4) | (1L << 24), 2, 1, 1, 1, 1)))
    assert(got(3L) == ((0x3FL << 9, 6, 6, 0, 0, 0)))
  }

  test("activityBitmap: a full month is a 30-streak; day 30 sits in no week window") {
    val got = bitmapOf((1 to 30).map(d => (9L, f"2024-01-$d%02d 06:00:00")))
    assert(got(9L) == (((1L << 30) - 1, 30, 30, 1, 1, 1)))
    val single = bitmapOf(Seq((4L, "2024-01-30 06:00:00")))
    assert(single(4L) == ((1L << 29, 1, 1, 0, 0, 0)))
  }
}
