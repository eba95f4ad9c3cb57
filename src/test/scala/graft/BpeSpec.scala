package graft

import graft.operators.Bpe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the distributed BPE trainer/segmenter against a serial reference
  * implementation (same tie-break, same greedy left-to-right merge pass,
  * same stop rule) — the decisive check for an operator whose iterative
  * argmax loop no SQL oracle can express. Also pins the classic greedy
  * overlap case, tie determinism, partition invariance, and the
  * end-to-end token-count invariants on real fixture data.
  */
class BpeSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Serial reference: word-freq dict → iterated weighted pair argmax
    * (count desc, left asc, right asc) + greedy merge pass. */
  private def serialTrain(corpus: Seq[String], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String, Long)] = {
    val wf = corpus.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    var dict: Seq[(Vector[String], Long)] = wf.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> f
    }
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        if (cnt < minPairCount) done = true
        else {
          merges += ((a, b, cnt))
          dict = dict.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> f
          }
        }
      }
      it += 1
    }
    merges.result()
  }

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide lower",
    "aaaa aab aaab bb",
  )

  test("train equals the serial reference, merge for merge — both paths") {
    val df = docs(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val want = serialTrain(corpus, 15)
    val driverPath = Bpe.train(df, "text", 15)
    val distributedPath = Bpe.train(df, "text", 15, maxDriverVocab = 0L)
    assert(driverPath == want)
    assert(distributedPath == want)
    assert(want.nonEmpty && want.size <= 15)
  }

  test("train is partition-invariant and deterministic across runs") {
    val df = docs(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val a = Bpe.train(df.repartition(7), "text", 12)
    val b = Bpe.train(df.coalesce(1), "text", 12)
    assert(a == b)
  }

  test("applyMerges: greedy left-to-right, no re-merge within a pass") {
    // "aaaa" under (a,a): [aa][aa][</w>] — NOT [aaa][a] or [aaaa]
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"))) ==
      Vector("aa", "aa", Bpe.EndOfWord))
    // second rule then pairs the merged units
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"), ("aa", "aa"))) ==
      Vector("aaaa", Bpe.EndOfWord))
    // rank order matters: (a,a) first consumes what (a,b) would have used
    assert(Bpe.applyMerges("aab", Seq(("a", "a"), ("a", "b"))) ==
      Vector("aa", "b", Bpe.EndOfWord))
    assert(Bpe.applyMerges("aab", Seq(("a", "b"), ("a", "a"))) ==
      Vector("a", "ab", Bpe.EndOfWord))
  }

  test("segmentVocab matches applyMerges per word type") {
    val s = spark
    import s.implicits._
    val df = docs(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val merges = Bpe.train(df, "text", 10).map(m => (m._1, m._2))
    val words = corpus.flatMap(_.split(" ")).distinct
    val seg = Bpe.segmentVocab(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w => assert(seg(w) == Bpe.applyMerges(w, merges), s"word $w") }
  }

  test("train property: equals the serial reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet forces heavy pair collisions and tie-breaks; repeated
    // chars ("aaa...") force the greedy-overlap path
    val word = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val gen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, word))
    val prop = Prop.forAll(gen) { words =>
      val corpus = words.grouped(3).map(_.mkString(" ")).toSeq
      val df = docs(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      Bpe.train(df, "text", 8) == serialTrain(corpus, 8)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenCounts: consistent totals and genuine compression on fixture data") {
    val df = Tables(spark, sf("sf0.001"), "documents")
    val merges = Bpe.train(df, "text", 40).map(m => (m._1, m._2))
    assert(merges.size == 40)
    val out = Bpe.tokenCounts(df, "doc_id", "text", merges).cache()
    val agg = out.agg(sum("n_words"), sum("n_tokens")).collect()(0)
    val (nw, nt) = (agg.getLong(0), agg.getLong(1))
    // every word is at least one token; 40 merges on a 31-word vocab must
    // compress well below the char-level baseline (chars + sentinel)
    assert(nt >= nw)
    val baseline = df.select(sum(size(split(col("text"), " ")) +
      length(regexp_replace(col("text"), " ", "")))).collect()(0).getLong(0)
    assert(nt < baseline * 2 / 3, s"tokens $nt vs char baseline $baseline")
    // chars_per_token is positive and finite everywhere
    assert(out.filter(col("chars_per_token") <= 0).count() == 0)
    out.unpersist()
  }
}
