package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Losslessness of the banded SimHash pair listing: the pigeonhole
  * chunk-band candidate stage (collapse to (block, signature) groups,
  * equi-join on maxHamming+1 signature chunks, expand back to members)
  * must list EXACTLY the pairs the quadratic definition lists — same-sig
  * pairs at hamming 0 via the tiled self-join, cross-sig pairs once each
  * via the first-equal-chunk dedupe — for every threshold shape: 0 (only
  * exact signature collisions), mid-range, 15 (one chunk per bit), and
  * ≥ 16 (pigeonhole bound vacuous → group all-pairs fallback).
  */
class SimHashPairsSpec extends SparkSuite {

  private def sigsOf(df: DataFrame): Array[(Long, String, Long)] = {
    graft.functions.SimHash16.register(spark)
    df.select(col("doc_id").cast("long"), col("source").cast("string"),
        expr("simhash16(array_distinct(split(text, ' ')))"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
  }

  /** Quadratic reference: every same-block id pair within the hamming bound,
    * sim_a = the smaller id's signature.
    */
  private def brute(sigs: Array[(Long, String, Long)], maxH: Int): Set[(Long, Long, Long, Int)] =
    (for {
      a <- sigs.iterator
      b <- sigs.iterator
      if a._2 == b._2 && a._1 < b._1
      h = java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= maxH
    } yield (a._1, b._1, a._3, h)).toSet

  private def listed(df: DataFrame, maxH: Int): Set[(Long, Long, Long, Int)] =
    Dedup.simHashPairs(df, "doc_id", "text", "source", maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("banded pair listing == quadratic definition on real docs, all threshold shapes") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val sigs = sigsOf(docs)
    for (maxH <- Seq(0, 1, 3, 7, 15, 16, 20)) {
      val expected = brute(sigs, maxH)
      val got = listed(docs, maxH)
      assert(got == expected, s"maxHamming=$maxH: got ${got.size}, expected ${expected.size}")
    }
    // the fixture must actually exercise both branches somewhere
    assert(brute(sigs, 3).nonEmpty)
  }

  test("banded pair listing == quadratic definition with heavy exact-dup groups") {
    val s = spark
    import s.implicits._
    // seeded corpus: two blocks, a 17-member exact-dup group (same-sig
    // branch, C(17,2) pairs through the tiled join), scattered singletons
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val dupText = "alpha beta gamma delta epsilon"
    val rows =
      (1L to 17L).map(i => (i, dupText, "b0")) ++
      (18L to 90L).map { i =>
        val t = Seq.fill(3 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" ")
        (i, t, if (i % 2 == 0) "b0" else "b1")
      }
    val df = rows.toDF("doc_id", "text", "source")
    val sigs = sigsOf(df)
    for (maxH <- Seq(0, 2, 5)) {
      assert(listed(df, maxH) == brute(sigs, maxH), s"maxHamming=$maxH")
    }
    // the dup group contributes its full C(17,2) at hamming 0
    assert(brute(sigs, 0).count(p => p._1 <= 17 && p._2 <= 17) == 17 * 16 / 2)
    intercept[IllegalArgumentException](
      Dedup.simHashPairs(df, "doc_id", "text", "source", -1).count())
  }
}
