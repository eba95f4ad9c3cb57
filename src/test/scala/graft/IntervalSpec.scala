package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** The bucket blocking in intervalOverlapJoin must be result-invisible:
  * any bucket width yields exactly the pairs the plain overlap predicate
  * yields, each pair exactly once even when it shares many buckets.
  */
class IntervalSpec extends SparkSuite {

  private def left = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 10L, 0L, 100L),    // spans buckets 0-10 at w=10
      (1L, 11L, 205L, 210L),
      (2L, 20L, 0L, 5L),
    ).toDF("k", "lid", "ls", "le")
  }

  private def right = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 90L, 50L, 120L),   // overlaps lid 10 across buckets 5-12
      (1L, 91L, 100L, 100L),  // touches lid 10 at a single point
      (1L, 92L, 101L, 204L),  // disjoint from both user-1 intervals
      (2L, 93L, 5L, 9L),      // touches lid 20 at ls boundary
      (3L, 94L, 0L, 100L),    // key with no left side
    ).toDF("k", "rid", "rs", "re")
  }

  test("matches the plain overlap predicate, one row per pair, exact lengths") {
    val out = Analytics.intervalOverlapJoin(left, right, "k", "ls", "le", "rs", "re", 10L)
      .select("lid", "rid", "overlap_secs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // (10,90): [50,100]∩[50,120] -> 50; (10,91): point touch -> 0; (20,93): point -> 0
    assert(out == Seq((10L, 90L, 50L), (10L, 91L, 0L), (20L, 93L, 0L)))
  }

  test("bucket width is result-invisible, including widths wider than any interval") {
    def run(w: Long) =
      Analytics.intervalOverlapJoin(left, right, "k", "ls", "le", "rs", "re", w)
        .select("lid", "rid", "overlap_secs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val base = run(1L) // every shared second is a shared bucket
    assert(base == run(7L) && base == run(10L) && base == run(100000L))
  }

  test("rejects a non-positive bucket width") {
    intercept[IllegalArgumentException] {
      Analytics.intervalOverlapJoin(left, right, "k", "ls", "le", "rs", "re", 0L)
    }
  }
}
