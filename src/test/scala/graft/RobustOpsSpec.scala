package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed fixtures for the round-6 robust-analytics operators
  * (EWMA, median/MAD outliers, PMI collocations, kNN classification).
  * Each test writes a tiny table to a temp dir and drives the REAL
  * registered query (SparkEntry.queries), so the exact code the driver
  * verifies is what's pinned here — including rounding and tie-breaks.
  */
class RobustOpsSpec extends SparkSuite {

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("q_ewma: weights renormalize over the rows present; alpha=1/2 exact") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ewma")
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "purchase", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 00:01:00"), 7L, "purchase", 20.0),
      (3L, Timestamp.valueOf("2024-01-01 00:02:00"), 7L, "purchase", 40.0),
      (4L, Timestamp.valueOf("2024-01-01 00:03:00"), 7L, "click", 999.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_ewma")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // clicks excluded
    assert(out(1L) == 10.0)               // first row: ewma == value
    assert(out(2L) == 16.666667)          // (20 + 10*0.5) / 1.5
    assert(out(3L) == 30.0)               // (40 + 20*0.5 + 10*0.25) / 1.75
  }

  test("q_mad_outlier: median/MAD robust z, one wild value doesn't move the band") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("mad")
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_mad_outlier")(s, dir)
      .collect().map(r => (r.getDouble(2), (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    // med = 3, devs = [2,1,0,1,97] -> mad = 1
    assert(out(3.0) == ((3.0, 1.0, 0.0, false)))
    assert(out(1.0) == ((3.0, 1.0, -1.349, false)))   // (1-3)*0.6745
    assert(out(100.0) == ((3.0, 1.0, 65.4265, true))) // 97*0.6745 — flagged
    // the mean+stddev z-score (q_anomaly recipe) would NOT flag 100 here:
    // mean=22, stddev≈39 -> z≈2 — the point of the robust variant
  }

  test("q_pmi: hand-computed collocation score; noise floor drops rare pairs") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("pmi")
    Seq((1L, "a b a b a b a b a b", "en", "web", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_pmi")(s, dir).collect()
    // bigrams: "a b" x5, "b a" x4 (Nb=9); unigrams a:5 b:5 (Nu=10).
    // (b,a) falls below the >=5 floor; PMI(a,b) = ln((5/9)/(0.5*0.5))
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("a", "b", 5L)))
    assert(r.getDouble(3) == math.floor(math.log(5.0 / 9.0 / 0.25) * 1e4 + 0.5) / 1e4)
    assert(r.getDouble(3) == 0.7985)
  }

  test("q_knn_label: majority vote; vote ties break to the nearer neighbor") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("knn")
    def vec(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // query 0 at 0°; neighbors by angle: 10°(L1) 20°(L2) 30°(L2) 40°(L1)
    // 50°(L3) 170°(L3). Top-5 votes: L1 x2 (best rank 1), L2 x2 (best rank
    // 2), L3 x1 -> tie L1/L2 resolved to L1 (nearer best neighbor).
    Seq(
      (0L, vec(0), 9), (1L, vec(10), 1), (2L, vec(20), 2), (3L, vec(30), 2),
      (4L, vec(40), 1), (5L, vec(50), 3), (6L, vec(170), 3),
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_knn_label")(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(0L) == ((9L, 1L, 2L, false))) // true 9, pred L1 on the tie-break
    assert(out.size == 7)                    // leave-one-out covers every vector
    // neighbors of vec 1 (10°): 0°,20°,30°,40°,50° -> labels 9,2,2,1,3 -> L2
    assert(out(1L)._2 == 2L)
  }
}
