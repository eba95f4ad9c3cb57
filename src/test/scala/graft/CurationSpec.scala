package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import java.sql.Date

/** Round-6 curation operators: decontamination flags exactly the docs that
  * share a benchmark n-gram, the stratified split hits exact per-stratum
  * proportions and is deterministic, top-ngram ranking is total-ordered,
  * and gap-fill interpolation reproduces hand-computed values.
  */
class CurationSpec extends SparkSuite {

  test("decontaminate: only docs sharing an n-gram with the benchmark are flagged") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),       // benchmark (id % 2 == 0 in this test)
      (1L, "x y a b c d z"),     // shares 4-gram "a b c d" -> contaminated
      (2L, "m n o p q"),         // benchmark
      (3L, "u v w x y"),         // no shared 4-gram
      (5L, "short doc"),         // < 4 words: zero grams, clean
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, "doc_id", "text", id => id % 2 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 3L, 5L)) // benchmark docs are not scored
    assert(out(1L) == ((4L, 1L, true)))   // 4 grams, 1 hit
    assert(out(3L)._2 == 0L && !out(3L)._3)
    assert(out(5L) == ((0L, 0L, false)))
  }

  test("decontaminate: a doc duplicating a benchmark doc hits on every gram") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "p q r s t u"), (1L, "p q r s t u")).toDF("doc_id", "text")
    val out = Curation.decontaminate(docs, "doc_id", "text", id => id % 2 === 0)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 3L))) // all 3 grams of doc 1 are benchmark grams
  }

  test("stratifiedSplit: exact per-stratum proportions, deterministic, disjoint") {
    val s = spark
    import s.implicits._
    val df = (1L to 230L).map(i => (i, if (i <= 200) "big" else "small")).toDF("id", "src")
    val out = Curation.stratifiedSplit(df, "id", "src", 0.8, 0.1).cache()
    try {
      val byStratum = out.groupBy("source", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // big: n=200 -> 160/20/20; small: n=30 -> 24/3/3
      assert(byStratum == Map(
        ("big", "train") -> 160L, ("big", "val") -> 20L, ("big", "test") -> 20L,
        ("small", "train") -> 24L, ("small", "val") -> 3L, ("small", "test") -> 3L))
      // deterministic: a second run assigns every row identically
      val again = Curation.stratifiedSplit(df, "id", "src", 0.8, 0.1)
        .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out.select("doc_id", "split").collect()
        .foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
    } finally out.unpersist()
  }

  test("stratifiedSplit: rejects degenerate fractions") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a")).toDF("id", "src")
    intercept[IllegalArgumentException](Curation.stratifiedSplit(df, "id", "src", 0.9, 0.1))
    intercept[IllegalArgumentException](Curation.stratifiedSplit(df, "id", "src", 0.0, 0.5))
  }

  test("topNgrams: counts occurrences (not distinct docs) and breaks ties on the gram") {
    val s = spark
    import s.implicits._
    val docs = Seq("a b a b", "a b z", "c d").toDF("text")
    // bigrams: "a b"x2 +1 = 3? doc1: (a b),(b a),(a b) -> "a b" twice
    val out = Curation.topNgrams(docs, "text", n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a b", 3L, 1L), ("b a", 1L, 2L), ("b z", 1L, 3L)))
  }

  test("interpolateDaily: hand-computed linear fill on an interior gap") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2.0), // day sum 12
      (1L, java.sql.Timestamp.valueOf("2024-01-04 09:00:00"), 18.0),
      (2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 5.0), // single-day key
    ).toDF("k", "ts", "v")
    val out = Curation.interpolateDaily(rows, "k", "ts", "v")
      .orderBy("key", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", true, 12.0),
      (1L, "2024-01-02", false, 14.0), // 12 + (18-12)*1/3
      (1L, "2024-01-03", false, 16.0),
      (1L, "2024-01-04", true, 18.0),
      (2L, "2024-02-01", true, 5.0)))
  }

  test("chunkDocs: window starts, overlap, and trailing-chunk length are exact") {
    val s = spark
    import s.implicits._
    // 7 words, chunkSize 4, overlap 2 -> stride 2 -> starts 1,3,5,7
    val docs = Seq((9L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, "doc_id", "text", 4, 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "w1 w2 w3 w4", 4L),
      (2L, "w3 w4 w5 w6", 4L),
      (3L, "w5 w6 w7", 3L),
      (4L, "w7", 1L)))
  }

  test("chunkDocs: rejects overlap >= chunkSize") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Curation.chunkDocs(docs, "doc_id", "text", 4, 4))
  }

  test("labelCentroids: hand-computed coordinate means, partition-invariant") {
    val s = spark
    import s.implicits._
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 6.0f), 0), // label 0: mean (2.0, 4.0)
      (3L, Seq(0.5f, 0.25f), 1),                           // label 1: itself
    ).toDF("vec_id", "embedding", "label")
    def run(parts: Int) = Curation.labelCentroids(embs.repartition(parts), "label", "embedding")
      .orderBy("label", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(1) == Seq((0L, 0L, 2.0), (0L, 1L, 4.0), (1L, 0L, 0.5), (1L, 1L, 0.25)))
    assert(run(1) == run(3))
  }

  test("chunkDocs property: every word covered, chunk count exact, overlap honored") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val gen = for {
      words <- Gen.choose(1, 60)
      chunk <- Gen.choose(2, 12)
      ov <- Gen.choose(0, chunk - 1)
    } yield (words, chunk, ov)
    val prop = Prop.forAll(gen) { case (words, chunk, ov) =>
      val stride = chunk - ov
      val text = (1 to words).map(i => s"w$i").mkString(" ")
      val out = Curation.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", chunk, ov)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getString(2).split(" ").toSeq, r.getLong(3)))
      val covered = out.flatMap(_._2).toSet
      val expectedChunks = (words - 1) / stride + 1
      out.length == expectedChunks &&
        covered == (1 to words).map(i => s"w$i").toSet &&           // total coverage
        out.forall { case (_, ws, n) => ws.length.toLong == n && n <= chunk } &&
        out.sliding(2).forall {                                     // overlap between neighbors
          case Array((_, a, _), (_, b, _)) =>
            a.length < chunk || a.takeRight(ov) == b.take(ov)
          case _ => true
        }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("stratifiedSplit property: exact floor proportions, disjoint, total") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(3, Gen.choose(1, 40))
    val prop = Prop.forAll(gen) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        (1 to n).map(i => (si * 1000L + i, s"s$si"))
      }
      val out = Curation.stratifiedSplit(rows.toDF("id", "src"), "id", "src", 0.6, 0.2)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getString(4)))
      val byStratum = out.groupBy(_._1)
      byStratum.forall { case (src, xs) =>
        val n = xs.length
        val train = xs.count(_._3 == "train")
        val vl = xs.count(_._3 == "val")
        train == math.floor(0.6 * n).toInt &&
          train + vl == math.floor((0.6 + 0.2) * n).toInt &&
          xs.map(_._2).distinct.length == n // every row appears exactly once
      } && out.length == rows.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("interpolateDaily: observed days pass through exactly (no fill applied)") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, java.sql.Timestamp.valueOf("2024-03-05 01:00:00"), 7.25),
      (1L, java.sql.Timestamp.valueOf("2024-03-06 01:00:00"), 0.5)).toDF("k", "ts", "v")
    val out = Curation.interpolateDaily(rows, "k", "ts", "v").orderBy("day").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(7.25, 0.5))
    assert(out.forall(_.getBoolean(2)))
  }

  test("dupSpans: cross-doc and within-doc repeats covered, overlaps counted once") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e"),         // shares "a b c" with doc 1 -> positions 1-3
      (1L, "x a b c y"),         // match at p0=2 -> positions 2-4
      (2L, "p q r p q r p q"),   // every 3-gram occurs twice -> full coverage
      (3L, "zz yy"),             // < n words: zero grams
      (4L, "u v w s t"),         // all grams unique
    ).toDF("doc_id", "text")
    val out = Curation.dupSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((0L, 5L, 3L, 0.6)))
    assert(out(1) == ((1L, 5L, 3L, 0.6)))
    // 6 overlapping duplicated occurrences cover 8 positions, not 18
    assert(out(2) == ((2L, 8L, 8L, 1.0)))
    assert(out(3) == ((3L, 2L, 0L, 0.0)))
    assert(out(4) == ((4L, 5L, 0L, 0.0)))
  }

  test("lineDedup property: equals a serial reference on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val segTokens = 3
    // tiny vocabulary maximizes cross-document segment collisions
    val word = Gen.oneOf("a", "b", "c")
    val doc = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val gen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, doc))
    def reference(docs: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
      val segsOf = docs.map { case (id, t) =>
        id -> t.split(" ", -1).grouped(segTokens).map(_.mkString(" ")).toVector
      }
      val seen = collection.mutable.Set[String]()
      segsOf.map { case (id, segs) =>
        val kept = segs.filter(g => seen.add(g)) // first occurrence wins, in (id, pos) order
        id -> ((kept.mkString(" "), segs.length.toLong, kept.length.toLong))
      }.toMap
    }
    val prop = Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Curation.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text", segTokens)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      got == reference(docs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("seqPack: hand-computed BFD placements, capacity-then-id tie-break") {
    val s = spark
    import s.implicits._
    // budget 10, tokens 7 6 4 3 2 2 in decreasing-size placement order:
    //   7 -> new seq0 (res 3); 6 -> no fit -> seq1 (res 4); 4 -> best fit
    //   seq1 (res 4) at offset 6; 3 -> seq0 (res 3) at offset 7; 2 -> no
    //   fit -> seq2; 2 -> seq2 at offset 2.
    val docs = Seq(
      (1L, "a a a a a a a"), (2L, "b b b b b b"), (3L, "c c c c"),
      (4L, "d d d"), (5L, "e e"), (6L, "f f"),
    ).map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis
      .seqPack(docs, "doc_id", "text", "source", 10L, 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 1L, 6L),
      (4L, 0L, 7L), (5L, 2L, 0L), (6L, 2L, 2L)))

    // equal residuals -> smallest sequence id wins: 6 6 4 4 leaves seq0 and
    // seq1 both at res 4; the first 4 must land in seq0, the second in seq1.
    val tie = Seq((1L, "a a a a a a"), (2L, "b b b b b b"),
      (3L, "c c c c"), (4L, "d d d d")).map { case (id, t) => (id, t, "s") }
      .toDF("doc_id", "text", "source")
    val gotTie = graft.operators.TextAnalysis
      .seqPack(tie, "doc_id", "text", "source", 10L, 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(gotTie == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 6L), (4L, 1L, 6L)))
  }

  test("seqPack: chunk boundaries, overflow docs, and partition invariance") {
    val s = spark
    import s.implicits._
    // chunkDocs = 2: ranked desc 9 8 2 2 cuts into chunks {9,8} and {2,2};
    // the 2s pack together in the second chunk's first local bin
    // (seq_id = 1*2 + 0 = 2) instead of topping up chunk 0's bins.
    val docs = Seq(
      (1L, ("x " * 9).trim), (2L, ("y " * 8).trim),
      (3L, "z z"), (4L, "w w"),
    ).map { case (id, t) => (id, t, "s") }.toDF("doc_id", "text", "source")
    val got = graft.operators.TextAnalysis
      .seqPack(docs, "doc_id", "text", "source", 10L, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 2L, 2L)))

    // an overflow doc (tokens > budget) gets a dedicated sequence whose
    // negative residual never fits again; fills elsewhere stay <= budget
    val over = Seq((1L, ("o " * 25).trim), (2L, "p p p p p"),
      (3L, "q q q q")).map { case (id, t) => (id, t, "s") }
      .toDF("doc_id", "text", "source")
    val gotOver = graft.operators.TextAnalysis
      .seqPack(over, "doc_id", "text", "source", 10L, 100)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(gotOver == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 1L, 5L)))

    // partition invariance + the packing invariant on a larger mixed corpus
    val big = (1L to 40L).map(i =>
      (i, ("t " * (1 + (i * 7 % 13)).toInt).trim, s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    def run(parts: Int) = graft.operators.TextAnalysis
      .seqPack(big.repartition(parts), "doc_id", "text", "source", 16L, 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val a = run(1)
    assert(a == run(7))
    // per-(source, seq) fill <= budget unless a single overflow doc
    a.groupBy(r => (r._2, r._4)).foreach { case (_, rows) =>
      val fill = rows.map(_._3).sum
      assert(fill <= 16L || rows.size == 1)
    }
  }

  test("dupSpans: partition-invariant and rejects n < 2") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "a b c d e f g"), (11L, "q a b c d z"), (12L, "c d e f g h"),
    ).toDF("doc_id", "text")
    def run(parts: Int) = Curation.dupSpans(docs.repartition(parts), "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(run(1) == run(4))
    intercept[IllegalArgumentException] {
      Curation.dupSpans(docs, "doc_id", "text", n = 1)
    }
  }
}
