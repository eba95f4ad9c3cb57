package graft

import graft.operators.Dedup
import scala.util.Random

/** rankedJaccardTopK's contract: top-k of { pairs with bigram-set jaccard
  * >= ladder floor }, ordered by (rounded jaccard desc, doc_a, doc_b) —
  * regardless of which descent rung supplied the answer. Pinned against an
  * in-test serial reference (collect + quadratic scan), the BpeSpec
  * discipline for operators whose execution strategy is adaptive.
  */
class SetsimTopKSpec extends SparkSuite {
  import spark.implicits._

  private def serialTopK(docs: Seq[(Long, String)], k: Int, floor: Double): Seq[(Long, Long, Double)] = {
    def grams(s: String): Set[String] =
      s.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    val gs = docs.map { case (id, t) => id -> grams(t) }
    val pairs = for {
      (a, ga) <- gs; (b, gb) <- gs if a < b
      inter = (ga & gb).size
      denom = ga.size + gb.size - inter
      if denom > 0
      j = inter.toDouble / denom if j >= floor
    } yield (a, b, math.floor(j * 1e6 + 0.5) / 1e6)
    pairs.toSeq.sortBy { case (a, b, j) => (-j, a, b) }.take(k)
  }

  private def run(docs: Seq[(Long, String)], k: Int,
      ladder: Seq[Double] = Seq(0.8, 0.4, 0.2, 0.1)): Seq[(Long, Long, Double)] =
    Dedup.rankedJaccardTopK(docs.toDF("doc_id", "text"), "doc_id", "text", k, ladder)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("matches the serial reference on a mixed-similarity corpus") {
    val rnd = new Random(7)
    val vocab = (1 to 30).map(i => s"w$i")
    def doc(len: Int) = (1 to len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = (0 until 10).map(_ => doc(25))
    val docs = (0 until 60).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      // a mix of exact dups, light rewrites, and fresh docs
      val t = rnd.nextInt(3) match {
        case 0 => b
        case 1 => b.split(" ").map(w => if (rnd.nextInt(8) == 0) doc(1) else w).mkString(" ")
        case _ => doc(25)
      }
      (i.toLong, t)
    }
    assert(run(docs, 20) == serialTopK(docs, 20, 0.1))
    assert(run(docs, 5) == serialTopK(docs, 5, 0.1))
  }

  test("fewer qualifying pairs than k returns all of them (floor contract)") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), // one jaccard-1.0 pair
      (3L, "q r s t u v"), (4L, "k l m n o p"), // nothing shared
    )
    val got = run(docs, 100)
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("first-rung early stop returns the same answer as a full descent") {
    // k=1 on a corpus with an exact-dup pair: the 0.8 rung already holds
    // >= 1 pair, so the descent stops immediately; semantics must equal
    // the single-rung floor query
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "a b c x y z q w"), (4L, "m n o p q r s t"),
    )
    assert(run(docs, 1) == serialTopK(docs, 1, 0.1))
    assert(run(docs, 1, ladder = Seq(0.1)) == serialTopK(docs, 1, 0.1))
  }
}
