package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[TextAnalysis.knScore]] (interpolated Kneser–Ney bigram LM
  * scoring) against a serial reference implementation of the exact same
  * formula — including the micro-quantization and the ntile bucket
  * arithmetic — on a corpus constructed so every probability path fires:
  * seen bigrams, unseen bigram with seen history, unseen history with
  * seen continuation, and fully-OOV words. The DuckDB oracle pins the
  * engine cross-check; this spec pins the SEMANTICS (the oracle would
  * agree with a consistently-wrong formula on both sides).
  */
class KnScoreSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Serial KN reference: same formula, same float association, same
    * micro rounding, same ntile semantics as the distributed operator. */
  private def serialKn(rows: Seq[(Long, String)], isTrain: Long => Boolean,
      buckets: Int): Seq[(Long, Long, Double, Long)] = {
    val d = 0.75
    def words(t: String) = t.split(" ", -1).toSeq
    def grams(t: String) = { val ws = words(t); ws.zip(ws.drop(1)) }
    val train = rows.filter(r => isTrain(r._1))
    val c12 = train.flatMap(r => grams(r._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val hist = c12.groupBy(_._1._1)
      .map { case (w1, m) => w1 -> (m.values.sum, m.size.toLong) }
    val cont = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val tt = c12.size.toLong
    val v = c12.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.size.toLong + 1
    def pc(w2: String): Double = (cont.getOrElse(w2, 0L) + 1).toDouble / (tt + v)
    def lp(w1: String, w2: String): Long = {
      val p = c12.get((w1, w2)) match {
        case Some(c) =>
          val (c1, n1f) = hist(w1)
          (c - d) / c1 + d * n1f / c1 * pc(w2)
        case None => hist.get(w1) match {
          case Some((c1, n1f)) => d * n1f / c1 * pc(w2)
          case None => pc(w2)
        }
      }
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }
    val perDoc = rows.flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else {
        val s = gs.map { case (a, b) => lp(a, b) }.sum
        val nb = gs.size.toLong
        Some((id, nb, math.floor(s.toDouble / nb + 0.5) / 1e6))
      }
    }
    val sorted = perDoc.sortBy(x => (x._3, x._1))
    val n = sorted.size.toLong
    val k = n / buckets
    val m = n % buckets
    sorted.zipWithIndex.map { case ((id, nb, a), i) =>
      val rn = i + 1L
      val b = if (rn <= m * (k + 1)) (rn + k) / (k + 1)
        else m + (rn - m * (k + 1) + k - 1) / k
      (id, nb, a, b)
    }.sortBy(_._1)
  }

  // train slice = even ids; odd ids carry unseen bigrams ("slow join":
  // both words seen, pair unseen), an unseen history with a seen
  // continuation ("late scan"), and fully-OOV words ("zzz qqq")
  private val corpus: Seq[(Long, String)] = Seq(
    0L -> "fast scan beats slow scan on wide table",
    2L -> "join on key then filter then scan",
    4L -> "slow filter on wide key beats join",
    6L -> "scan then join on key on key",
    8L -> "fast join beats slow filter",
    1L -> "slow join on wide table",
    3L -> "late scan then fast join",
    5L -> "zzz qqq zzz fast scan",
    7L -> "key on key on key",
  )

  private def run(buckets: Int = 3): Seq[(Long, Long, Double, Long)] =
    TextAnalysis.knScore(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0, buckets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq

  test("knScore equals the serial KN reference on all backoff paths — both tiers") {
    val expected = serialKn(corpus, _ % 2 == 0, 3)
    assert(run() == expected)
    // force the distributed join tier (driver-model cap 0) — same answer
    val joined = TextAnalysis.knScore(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0, 3, maxDriverTypes = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(joined == expected)
    // the fixture genuinely exercises the backoff tiers: the OOV doc must
    // score strictly worse than the all-seen train doc
    val byId = expected.map(e => e._1 -> e._3).toMap
    assert(byId(5L) > byId(0L))
  }

  test("knScore is partition-invariant and bucket-count-stable") {
    val expected = serialKn(corpus, _ % 2 == 0, 4)
    val shuffled = TextAnalysis.knScore(
        docs(corpus.reverse: _*).repartition(7), "doc_id", "text",
        col("doc_id") % 2 === 0, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(shuffled == expected)
  }

  test("knScore property: equals the serial reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // 5-word core vocab + a rare OOV token; random train membership
    // exercises every backoff tier across corpora
    val word = Gen.frequency(9 -> Gen.oneOf("ai", "bo", "cu", "de", "ef"),
      1 -> Gen.const("zzz"))
    val doc = Gen.choose(2, 7).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val gen = for {
      n <- Gen.choose(3, 7)
      texts <- Gen.listOfN(n, doc)
      mod <- Gen.choose(2, 3)
    } yield (texts, mod)
    val prop = Prop.forAll(gen) { case (texts, mod) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // guard: at least one train doc, else the LM has no statistics at
      // all and every tier collapses to the same OOV constant (fine but
      // uninformative)
      val out = TextAnalysis.knScore(docs(rows: _*), "doc_id", "text",
          col("doc_id") % mod === 0, 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq
      out == serialKn(rows, _ % mod == 0, 3)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("knScore drops single-word docs, keeps everything else") {
    val withSingle = corpus :+ (9L -> "lonely")
    val out = TextAnalysis.knScore(docs(withSingle: _*), "doc_id", "text",
      col("doc_id") % 2 === 0, 3)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq ==
      corpus.map(_._1).sorted)
  }
}
