package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-16 operators beyond the DuckDB hash gate: ROUGE clipped-count
  * goldens (hand-computed) and the JL sign-projection's determinism /
  * hash-derivation cross-check (an independent in-test md5 replay).
  */
class Round16Spec extends SparkSuite {
  import spark.implicits._

  test("rougePairs: hand-computed clipped-count goldens") {
    val docs = Seq(
      (1L, "the cat sat", "s"), (2L, "the cat ran", "s"),
      (3L, "a cat sat on the mat", "s"),
      (4L, "a a a b", "t"), (5L, "a a b b", "t"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.rougePairs(docs, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // (1,2): uni overlap {the,cat} = 2 of 3/3 -> p=r=f=0.666666;
    //        bi overlap {"the cat"} = 1 of 2/2 -> f = 0.5
    assert(got(0) == ((1L, 2L, 2L, 1L, 0.666666, 0.666666, 0.666666, 0.5)))
    // (2,3): uni {the,cat} = 2 of 3/6 -> p=0.666666 r=0.333333 f=4/9;
    //        bi overlap empty -> 0
    assert(got(1) == ((2L, 3L, 2L, 0L, 0.666666, 0.333333, 0.444444, 0.0)))
    // (4,5): CLIPPED uni min(3,2)+min(1,2)=3 of 4/4 -> 0.75 all three;
    //        bi min(2,1)+min(1,1)=2 of 3/3 -> 0.666666
    assert(got(2) == ((4L, 5L, 3L, 2L, 0.75, 0.75, 0.75, 0.666666)))
    // exactly one pair per adjacent id within source, none across sources
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L), (2L, 3L), (4L, 5L)))
  }

  test("rougePairs: identical docs score 1.0, disjoint docs 0.0") {
    val docs = Seq(
      (1L, "x y z w", "s"), (2L, "x y z w", "s"), (3L, "p q r t", "s"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.rougePairs(docs, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(6) == 1.0 && got(0).getDouble(7) == 1.0)
    assert(got(1).getDouble(6) == 0.0 && got(1).getDouble(7) == 0.0)
  }

  test("sourceKl: zero on a single source, ln(N/n) on disjoint vocabularies") {
    // one source: p_s = p_c exactly -> every per-type log ratio is 0
    val one = Seq((1L, "a b a c", "s"), (2L, "b c d", "s"))
      .toDF("doc_id", "text", "source")
    val g1 = TextAnalysis.sourceKl(one, "text", "source").collect()
    assert(g1.length == 1 && g1(0).getDouble(3) == 0.0)
    // disjoint vocabularies: c_w = c_sw for every word, so each type's
    // ratio is ln(N/n_s) and KL = ln(N/n_s) (micro-quantized)
    val two = Seq((1L, "a b a", "s"), (2L, "x y z w p", "t"))
      .toDF("doc_id", "text", "source")
    val g2 = TextAnalysis.sourceKl(two, "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // source s: n=3, types {a:2, b:1}; lp_a = ln(2/3)-ln(2/8), lp_b = ln(1/3)-ln(1/8)
    val lpA = math.floor((math.log(2.0 / 3.0) - math.log(2.0 / 8.0)) * 1e6 + 0.5).toLong
    val lpB = math.floor((math.log(1.0 / 3.0) - math.log(1.0 / 8.0)) * 1e6 + 0.5).toLong
    val klS = math.floor((2 * lpA + 1 * lpB).toDouble / 3.0).toDouble / 1e6
    val lpT = math.floor((math.log(1.0 / 5.0) - math.log(1.0 / 8.0)) * 1e6 + 0.5).toLong
    val klT = math.floor((5 * lpT).toDouble / 5.0).toDouble / 1e6
    assert(g2(0) == (("s", 3L, 2L, klS)))
    assert(g2(1) == (("t", 5L, 5L, klT)))
    assert(klS > 0 && klT > 0)
  }

  test("randomProjection: matches an independent md5-parity replay, partition-invariant") {
    // independent reimplementation of the sign derivation (the oracle does
    // the same from DuckDB's md5)
    def sign(i: Int, j: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    val vecs = Seq(
      (0L, Array(1.0f, -2.0f, 0.5f)),
      (1L, Array(0.25f, 0.0f, -1.0f)),
    )
    val emb = vecs.toDF("vec_id", "embedding")
    val k = 4
    val got = Similarity.randomProjection(emb, k).orderBy("vec_id", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = vecs.flatMap { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)
      (0 until k).map(j =>
        (id, j.toLong, q.indices.map(i => sign(i, j) * q(i)).sum))
    }
    assert(got.toSeq == expect)
    assert(got.length == vecs.size * k)
    // partition invariance
    val got7 = Similarity.randomProjection(emb.repartition(7), k)
      .orderBy("vec_id", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got7.toSeq == expect)
  }

  test("randomProjection: no shuffle in the plan (map-side only)") {
    val emb = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Similarity.randomProjection(emb, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be map-side:\n$plan")
  }
}
