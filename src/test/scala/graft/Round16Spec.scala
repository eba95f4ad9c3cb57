package graft

import graft.operators.{Analytics, Similarity, Sketches, TextAnalysis}
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

  test("countMin: estimates dominate exact counts, and are exact without collisions") {
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c") ++
      (1 to 30).map(i => s"x$i")).toDF("k")
    val exact = df.groupBy(col("k").as("key")).agg(count(lit(1)).as("exact"))
    // narrow sketch: collisions certain across 33 keys in 8 buckets
    val sk = Sketches.countMin(df, "k", depth = 3, width = 8)
    val est = Sketches.countMinEstimate(sk, exact.select("key"), "key", 3, 8)
      .join(exact, Seq("key")).collect()
    assert(est.nonEmpty && est.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("exact")))
    // wide sketch: 2^16 buckets for 33 keys — any single collision across
    // ALL 3 rows is effectively impossible, so every estimate is exact
    val wide = Sketches.countMinEstimate(
        Sketches.countMin(df, "k", depth = 3, width = 65536),
        exact.select("key"), "key", 3, 65536)
      .join(exact, Seq("key")).collect()
    assert(wide.forall(r => r.getAs[Long]("est") == r.getAs[Long]("exact")))
    // partition invariance: sketch content is a pure aggregate
    val sk1 = sk.orderBy("row", "bucket").collect().toSeq
    val sk7 = Sketches.countMin(df.repartition(7), "k", 3, 8)
      .orderBy("row", "bucket").collect().toSeq
    assert(sk1 == sk7)
  }

  test("bleuPairs: scalar replay golden, perfect pair = 1.0, disjoint = 0.0") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "s"), (2L, "the cat sat on a mat", "s"),
      (3L, "p q r t u v", "t"), (4L, "p q r t u v", "t"),
      (5L, "aa bb cc dd", "u"), (6L, "ee ff gg hh", "u"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.bleuPairs(docs, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    // (1,2): hand-counted clipped overlaps 5/3/2/1 of totals 6/5/4/3,
    // c = r = 6 so BP term is 0; scalar replay of the quantized math
    def lp(ov: Long, t: Long) = math.floor(math.log(ov.toDouble / t) * 1e6 + 0.5).toLong
    def bleu(lps: Seq[Long]) =
      math.floor(math.exp(lps.sum.toDouble / (lps.size * 1e6)) * 1e6 + 0.5) / 1e6
    val b2 = bleu(Seq(lp(5, 6), lp(3, 5)))
    val b4 = bleu(Seq(lp(5, 6), lp(3, 5), lp(2, 4), lp(1, 3)))
    assert(got(0) == ((1L, 2L, 5L, 3L, 2L, 1L, b2, b4)))
    assert(got(1) == ((3L, 4L, 6L, 5L, 4L, 3L, 1.0, 1.0)))
    assert(got(2) == ((5L, 6L, 0L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("bleuPairs: brevity penalty bites short candidates") {
    // candidate (4 tokens) is a perfect prefix of the reference (8):
    // precisions are all 1 so BLEU = BP = exp((4-8)/4) = exp(-1)
    val docs = Seq(
      (1L, "a b c d", "s"), (2L, "a b c d e f g h", "s"),
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.bleuPairs(docs, "doc_id", "text", "source").collect()(0)
    val expect = math.floor(math.exp(-1.0) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(6) == expect && r.getDouble(7) == expect)
  }

  test("kaplanMeier: Freireich 6-MP leukemia golden (textbook curve)") {
    // the classic 21-subject arm: deaths at 6,6,6,7,10,13,16,22,23;
    // censored at 6,9,10,11,17,19,20,25,32,32,34,35
    val subs = (Seq(6, 6, 6, 7, 10, 13, 16, 22, 23).map((_, 1)) ++
      Seq(6, 9, 10, 11, 17, 19, 20, 25, 32, 32, 34, 35).map((_, 0)))
      .toDF("t", "obs").select(col("t").cast("long").as("t"), col("obs"))
    val got = Analytics.kaplanMeier(subs).orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // textbook S(t): .857, .807, .753, .690, .627, .538, .448
    val expect = Seq(
      (6L, 21L, 3L, 0.857143), (7L, 17L, 1L, 0.806723),
      (10L, 15L, 1L, 0.752941), (13L, 12L, 1L, 0.690196),
      (16L, 11L, 1L, 0.627451), (22L, 7L, 1L, 0.537815),
      (23L, 6L, 1L, 0.448179))
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 2e-6, s"$g vs $e")
    }
  }

  test("kaplanMeier: saturated last step zeroes the curve; all-censored is empty") {
    val allDie = Seq((2L, 1), (2L, 1), (5L, 1)).toDF("t", "obs")
    val got = Analytics.kaplanMeier(allDie).orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val s2 = math.floor(math.exp(
      math.floor(math.log(1.0 / 3) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq((2L, 3L, 2L, s2), (5L, 1L, 1L, 0.0)))
    val none = Seq((4L, 0), (9L, 0)).toDF("t", "obs")
    assert(Analytics.kaplanMeier(none).collect().isEmpty)
  }

  test("jaro_winkler_micros: literature goldens, boost threshold, prefix cap") {
    import graft.functions.JaroWinklerFunctions.jwMicros
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = jwMicros(u(a), u(b))
    assert(jw("MARTHA", "MARHTA") == 961111)   // Winkler's own example
    assert(jw("DWAYNE", "DUANE") == 840000)
    assert(jw("DIXON", "DICKSONX") == 813333)
    // jaro = 2/3 < 0.7: the strict boost threshold must NOT fire despite
    // the 4-char common prefix
    assert(jw("abcdxxxx", "abcdyyyy") == 666667)
    // 6-char common prefix capped at 4: jaro 23/24, jw 0.975 exactly
    assert(jw("aaaaaabc", "aaaaaacb") == 975000)
    assert(jw("", "abc") == 0 && jw("", "") == 0 && jw("ab", "ba") == 0)
    assert(jw("same", "same") == 1000000)
    // symmetry on an asymmetric-length pair
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("jaro_winkler_micros: bitmask fast path equals the general path") {
    import graft.functions.JaroWinklerFunctions.jwMicros
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // force the general path with a 65-char twin of each string: padding
    // both sides with the same 50-char suffix keeps them comparable pairs
    val pad = "z" * 60
    val pairs = Seq(
      ("martha", "marhta"), ("red widget", "red widgit"),
      ("abcdxxxx", "abcdyyyy"), ("a", "b"), ("same", "same"),
      ("small ring", "small rings"), ("x" * 64, "x" * 63 + "y"),
    )
    pairs.foreach { case (a, b) =>
      val fast = jwMicros(u(a), u(b))
      val slow = jwMicros(u(a + pad), u(b + pad)) // both on the general path
      // the padded pair is a DIFFERENT input; equality is checked against
      // the general kernel directly instead
      val general = {
        val mth = graft.functions.JaroWinklerFunctions.getClass
          .getDeclaredMethods.find(_.getName.contains("jwMicrosGeneral")).get
        mth.setAccessible(true)
        mth.invoke(graft.functions.JaroWinklerFunctions, a, b)
          .asInstanceOf[Long]
      }
      assert(fast == general, s"($a,$b): fast $fast vs general $general")
      assert(slow >= 0) // padded variant exercises the >64 route
    }
    // non-ASCII routes to the general path and still scores
    assert(jwMicros(u("héllo"), u("hèllo")) > 0)
  }

  test("jaroWinklerJoin: finds planted near-duplicates, never the cross product") {
    val parts = Seq(
      (1L, "red widget"), (2L, "red widgit"), (3L, "red bolt"),
      (4L, "blue widget"), (5L, "blue widget"),
    ).toDF("p_partkey", "p_name")
    val got = graft.operators.Dedup
      .jaroWinklerJoin(parts, "p_partkey", "p_name", 900000L)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // (1,2) typo pair and (4,5) exact pair; (1,3)/(2,3) same block but low
    // score; (1,4) crosses blocks and must never be priced
    assert(got.toSeq == Seq((1L, 2L), (4L, 5L)))
  }

  test("bestStump: picks the perfect separator with deterministic tie-break") {
    // f0 separates classes perfectly (0s at 1..4, 1s at 11..14); f1 is
    // constant (zero-width grid -> all one bin -> no valid split)
    val rows = (Seq(1.0, 2.0, 3.0, 4.0).map((_, 0)) ++
      Seq(11.0, 12.0, 13.0, 14.0).map((_, 1)))
      .map { case (v, l) => (l, v, 5.0) }.toDF("label", "f0", "f1")
    val r = graft.operators.Ml.bestStump(rows, nf = 2, bins = 64).collect()(0)
    assert(r.getAs[Int]("feature") == 0)
    assert(r.getAs[Double]("gini") == 0.0)
    assert(r.getAs[Long]("nl") == 4 && r.getAs[Long]("posl") == 0)
    assert(r.getAs[Long]("nr") == 4 && r.getAs[Long]("posr") == 4)
    // lowest clean bin wins the tie: v=4 lands in bin 14 of the
    // [1,14]/64 grid, so threshold = 1 + 15*(13/64)
    assert(math.abs(r.getAs[Double]("threshold") - (1.0 + 15.0 * 13.0 / 64)) < 1e-12)
    // the split actually separates: everything <= threshold is class 0
    assert(4.0 <= r.getAs[Double]("threshold") && 11.0 > r.getAs[Double]("threshold"))
  }

  test("contingencyScores: 2x2 golden — chi2 = 20 exactly, MI via scalar replay") {
    // a: 30 of y=0, 10 of y=1; b: the mirror. All E = 20, so
    // chi2 = 4 * (10^2/20) = 20 (10 per cell, 20 per class)
    val rows = (Seq.fill(30)(("a", 0L)) ++ Seq.fill(10)(("a", 1L)) ++
      Seq.fill(10)(("b", 0L)) ++ Seq.fill(30)(("b", 1L))).toDF("x", "y")
    val got = graft.operators.Ml.contingencyScores(rows, col("x"), col("y"))
      .orderBy("x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def lr(o: Double) = math.floor(
      (math.log(o / 80) - math.log(40.0 / 80) - math.log(40.0 / 80)) * 1e6 + 0.5).toLong
    val mi = math.floor((30 * lr(30) + 10 * lr(10)).toDouble / 80).toLong / 1e6
    assert(got.toSeq == Seq(("a", 40L, 10.0, mi), ("b", 40L, 10.0, mi)))
    assert(mi > 0)
    // independence: uniform cells -> chi2 = 0 and MI = 0 (lr = ln 1 = 0)
    val ind = (Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("a", 1L)) ++
      Seq.fill(10)(("b", 0L)) ++ Seq.fill(10)(("b", 1L))).toDF("x", "y")
    val g2 = graft.operators.Ml.contingencyScores(ind, col("x"), col("y"))
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(g2.forall(_ == ((0.0, 0.0))))
  }

  test("changePoint: finds a planted level shift exactly") {
    // two flat segments -> within-segment SSE is 0 only at the true split
    val series = ((1 to 10).map(t => (t.toLong, 100L)) ++
      (11 to 20).map(t => (t.toLong, 500L))).toDF("t", "p")
    val r = Analytics.changePoint(series, "t", "p").collect()(0)
    assert(r.getLong(0) == 11L)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 500.0)
    // noisy variant: split stays at the boundary, cost now > 0
    val noisy = ((1 to 10).map(t => (t.toLong, 100L + (t % 3))) ++
      (11 to 20).map(t => (t.toLong, 500L + (t % 3)))).toDF("t", "p")
    val r2 = Analytics.changePoint(noisy, "t", "p").collect()(0)
    assert(r2.getLong(0) == 11L && r2.getDouble(1) > 0.0)
  }

  test("isotonicFit: PAV textbook pools, monotone output, weighted merge") {
    // frac sequence .2 .6 .4: the violator (.6,.4) pools to .5 -> fit .2 .5 .5
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L)).toDF("i", "n", "np")
    val got = graft.operators.Ml.isotonicFit(bins).orderBy("i").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 0.2), (1L, 0.5), (2L, 0.5)))
    // weighted: (.6 w=30) vs (.4 w=10) pools to (18+4)/40 = .55
    val wtd = Seq((0L, 30L, 18L), (1L, 10L, 4L)).toDF("i", "n", "np")
    val g2 = graft.operators.Ml.isotonicFit(wtd).orderBy("i").collect()
      .map(_.getDouble(3))
    assert(g2.toSeq == Seq(0.55, 0.55))
    // already-monotone input is a fixpoint
    val mono = Seq((0L, 5L, 1L), (1L, 5L, 2L), (2L, 5L, 4L)).toDF("i", "n", "np")
    val g3 = graft.operators.Ml.isotonicFit(mono).orderBy("i").collect()
      .map(_.getDouble(3))
    assert(g3.toSeq == Seq(0.2, 0.4, 0.8))
    // monotonicity invariant on a longer zigzag
    val zig = Seq((0L, 4L, 3L), (1L, 4L, 1L), (2L, 4L, 2L), (3L, 4L, 0L),
      (4L, 4L, 4L)).toDF("i", "n", "np")
    val g4 = graft.operators.Ml.isotonicFit(zig).orderBy("i").collect()
      .map(_.getDouble(3))
    assert(g4.sliding(2).forall(p => p(0) <= p(1)), g4.mkString(","))
  }

  test("viterbi: matches brute-force max-score path with the DP's tie rule") {
    import java.sql.Timestamp
    val M = Analytics.HmmModel
    def score(obs: Seq[String], path: Seq[Int]): Long = {
      val e0 = M.emit.getOrElse(obs.head, M.emitDefault)(path.head)
      path.indices.drop(1).foldLeft(M.pi(path.head) + e0) { (acc, i) =>
        acc + M.t(path(i - 1))(path(i)) +
          M.emit.getOrElse(obs(i), M.emitDefault)(path(i))
      }
    }
    def brute(obs: Seq[String]): Seq[Int] = {
      val paths = Seq.fill(obs.length)(Seq(0, 1))
        .foldLeft(Seq(Seq.empty[Int]))((acc, cs) => acc.flatMap(p => cs.map(p :+ _)))
      // DP backtrace prefers state 0 at the END first, then earlier:
      // among score ties, the reversed path lexicographically smallest
      val top = paths.map(_ -> 0L).map { case (p, _) => (p, score(obs, p)) }
      val mx = top.map(_._2).max
      top.filter(_._2 == mx).map(_._1).minBy(_.reverse.mkString)
    }
    val scenarios = Seq(
      Seq("view", "error", "error", "view"),
      Seq("error", "error", "error"),
      Seq("view", "click", "purchase", "view"),
      Seq("click", "error", "view", "error", "error", "click"),
      Seq("signup"),
    )
    val rows = scenarios.zipWithIndex.flatMap { case (obs, u) =>
      obs.zipWithIndex.map { case (o, i) =>
        (u.toLong, new Timestamp(86400000L + i * 60000L), (i + 1).toLong, o)
      }
    }
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.viterbi(df).orderBy("user_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2.toInt).toSeq }
    scenarios.zipWithIndex.foreach { case (obs, u) =>
      assert(got(u.toLong) == brute(obs), s"user $u obs $obs")
    }
    // arrival-order and partitioning invariance: decode sorts in-task
    val shuffled = scala.util.Random.shuffle(rows).toDF(
      "user_id", "ts", "event_id", "event_type").repartition(7)
    val got2 = Analytics.viterbi(shuffled).orderBy("user_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got1 = Analytics.viterbi(df).orderBy("user_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got1 == got2)
  }

  test("hrwOwner: minimal disruption — dropping a shard remaps only its keys") {
    import graft.operators.SkewLayout.hrwOwner
    val keys = (1L to 500L).toDF("k")
    val with8 = hrwOwner(keys, "k", 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shards 0..6 only = dropping shard 7 (the argmax over a prefix)
    val with7 = hrwOwner(keys, "k", 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = with8.filter { case (k, s) => with7(k) != s }
    // exactly the keys shard 7 owned moved; everyone else is untouched
    assert(moved.keySet == with8.filter(_._2 == 7L).keySet)
    assert(with8.count(_._2 == 7L) > 0) // the property was actually exercised
    // every shard owns something at n=500 (balance sanity)
    assert(with8.values.toSet == (0L to 7L).toSet)
    // map-side: no Exchange in the plan
    val plan = hrwOwner(keys, "k", 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("holt recurrence: hand-stepped fixed-point trajectory") {
    // y = [10, 14, 22]: l1=10 b1=4; step y=14: l=(14+10+4)/2=14,
    // b=(14-10+4)/2=4; step y=22: l=(22+14+4)/2=20, b=(20-14+4)/2=5
    var l = 10L; var b = 4L
    for (y <- Seq(14L, 22L)) {
      val l2 = (y + l + b) / 2; b = (l2 - l + b) / 2; l = l2
    }
    assert((l, b) == ((20L, 5L)))
    // negative trend truncates toward zero in BOTH engines (DuckDB //
    // semantics pinned at dev time: -7 // 2 = -3)
    assert(-7L / 2L == -3L)
  }

  test("dtw_band: hand-computed DP goldens, warp alignment, band sentinel") {
    import graft.functions.DtwBandFunctions.{dtwBand, Inf}
    import org.apache.spark.sql.catalyst.util.ArrayData
    def dtw(a: Seq[Long], b: Seq[Long]) =
      dtwBand(ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
    assert(dtw(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 0L)
    // warping absorbs the step shift entirely: [0,0,10] vs [0,10,10] -> 0
    assert(dtw(Seq(0L, 0L, 10L), Seq(0L, 10L, 10L)) == 0L)
    // hand-stepped 2x2: D22 = |5-2| + min(1,2,4) = 4
    assert(dtw(Seq(1L, 5L), Seq(2L, 2L)) == 4L)
    // length gap beyond the radius: the band cannot connect the corners
    assert(dtw(Seq(1L, 2L, 3L), Seq.fill(8)(1L)) == Inf)
    // symmetry (cost is |a-b|, band is symmetric for equal lengths)
    assert(dtw(Seq(3L, 1L, 4L, 1L, 5L), Seq(2L, 7L, 1L, 8L, 2L)) ==
      dtw(Seq(2L, 7L, 1L, 8L, 2L), Seq(3L, 1L, 4L, 1L, 5L)))
  }

  test("randomProjection: no shuffle in the plan (map-side only)") {
    val emb = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Similarity.randomProjection(emb, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be map-side:\n$plan")
  }
}
