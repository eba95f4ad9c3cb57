package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the public dedup/similarity APIs: empty and
  * single-row corpora must yield empty/singleton results, never throw —
  * partitioned pipelines routinely hand operators empty blocks.
  */
class EdgeCaseSpec extends SparkSuite {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def vecs(rows: (Long, Array[Float], Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("dedup family: empty corpus yields empty results") {
    val empty = docs()
    assert(Dedup.exactDedup(empty, "doc_id", "text").count() == 0)
    assert(Dedup.minHashPairs(empty, "doc_id", "text", "source").count() == 0)
    assert(Dedup.simHashPairs(empty, "doc_id", "text", "source", 3).count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text", "source").count() == 0)
    assert(Dedup.containmentPairs(empty, "doc_id", "text", "source").count() == 0)
    assert(Dedup.editDistancePairs(empty, "doc_id", "text", "source").count() == 0)
    assert(Dedup.editDistancePairs(empty, "doc_id", "text", "source",
      maxDist = Some(8)).count() == 0)
    assert(Dedup.nearDupClusters(empty, "doc_id", "text", "source", 3).count() == 0)
    assert(Dedup.rankedJaccardTopK(empty, "doc_id", "text", 10).count() == 0)
  }

  test("continuation-4 operators: empty and degenerate corpora never throw") {
    val empty = docs()
    assert(Dedup.incrementalDedup(empty, "doc_id", "text",
      col("doc_id") % 2 === 0).count() == 0)
    assert(TextAnalysis.knScore(empty, "doc_id", "text", lit(true)).count() == 0)
    assert(graft.operators.Bpe.train(empty, "text", 5).isEmpty)
    assert(graft.operators.Bpe.train(empty, "text", 5, maxDriverVocab = 0L).isEmpty)
    // one doc: batch side alone, no candidates; KN trains on itself
    val one = docs((7L, "only one document here", "src")).drop("source")
    val inc = Dedup.incrementalDedup(one, "doc_id", "text", lit(true)).collect()
    assert(inc.length == 1 && !inc(0).getBoolean(1))
    val kn = TextAnalysis.knScore(one, "doc_id", "text", lit(true)).collect()
    assert(kn.length == 1 && kn(0).getLong(3) == 1L)
    // empty train slice: every bigram routes through the OOV tier, scores finite
    val two = docs((1L, "a b c", "s"), (2L, "c b a", "s")).drop("source")
    val cold = TextAnalysis.knScore(two, "doc_id", "text", lit(false)).collect()
    assert(cold.length == 2 && cold.forall(r => !r.isNullAt(2)))
    // single-word corpus: BPE merges only with the sentinel, never loops
    val tiny = docs((1L, "aa aa", "s")).drop("source")
    val m = graft.operators.Bpe.train(tiny, "text", 10)
    assert(m.nonEmpty && m.size <= 10)
  }

  test("dedup family: single document yields no pairs, one singleton cluster") {
    val one = docs((7L, "only one document here", "src"))
    assert(Dedup.minHashPairs(one, "doc_id", "text", "source").count() == 0)
    assert(Dedup.simHashPairs(one, "doc_id", "text", "source", 3).count() == 0)
    assert(Dedup.ngramJaccardPairs(one, "doc_id", "text", "source").count() == 0)
    val cl = Dedup.nearDupClusters(one, "doc_id", "text", "source", 3).collect()
    assert(cl.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((7L, 7L, 1L)))
    val ex = Dedup.exactDedup(one, "doc_id", "text").collect()
    assert(ex.head.getLong(1) == 7L && !ex.head.getBoolean(2))
  }

  test("prefixFilterJaccardPairs: equals the quadratic definition, all thresholds") {
    // mix of exact dups, a near-dup, and unrelated docs — and a candidate
    // the SIZE filter must reject (a strict subset shingle set)
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta", "a"),
      (2L, "alpha beta gamma delta epsilon zeta", "b"),       // exact dup of 1
      (3L, "alpha beta gamma delta epsilon eta", "a"),        // near-dup of 1
      (4L, "one two three four five six seven", "b"),
      (5L, "alpha beta gamma", "a"),                          // subset of 1
      (6L, "x", "a"),                                         // no bigrams at all
    )
    def brute(tau: Double): Set[(Long, Long)] = {
      val s = spark
      import s.implicits._
      val sets = d.select(col("doc_id"),
        array_distinct(expr(
          "filter(zip_with(split(text,' '), slice(split(text,' '), 2, size(split(text,' '))), (a,b) -> concat(a,' ',b)), x -> x IS NOT NULL)"
        )).as("ts"))
      // distinct column names per side: a bare as("a")/as("b") self-join
      // resolves both doc_ids to one side (trivially-false predicate)
      sets.toDF("ida", "tsa").crossJoin(sets.toDF("idb", "tsb"))
        .filter(col("ida") < col("idb") && size(col("tsa")) > 0 && size(col("tsb")) > 0)
        .withColumn("i", size(array_intersect(col("tsa"), col("tsb"))))
        .withColumn("j", col("i").cast("double") / (size(col("tsa")) + size(col("tsb")) - col("i")))
        .filter(col("j") >= tau)
        .select(col("ida"), col("idb"))
        .as[(Long, Long)].collect().toSet
    }
    for (tau <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.prefixFilterJaccardPairs(d, "doc_id", "text", tau)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(tau), s"tau=$tau")
    }
    // the exact-dup pair survives at tau = 1.0
    assert(Dedup.prefixFilterJaccardPairs(d, "doc_id", "text", 1.0).count() == 1)
    // empty corpus: no pairs, no throw
    assert(Dedup.prefixFilterJaccardPairs(docs(), "doc_id", "text", 0.5).count() == 0)
  }

  test("clusterPairs: empty edge set leaves every node a singleton") {
    val s = spark
    import s.implicits._
    val ids = Seq(1L, 2L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(ids, noPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("clusterPairs: edge endpoints outside the node frame are dropped") {
    val s = spark
    import s.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    // 99 is not a node: the (2,99) edge must not surface 99 in the output
    // nor connect anything through it
    val pairs = Seq((1L, 2L), (2L, 99L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(ids, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L)))
  }

  test("signLshTopK: non-64-dim vectors take lshBucket's null-dot bucket (0)") {
    val s = spark
    import s.implicits._
    val short = vecs((1L, Array(0.5f, -0.2f, 0.9f), 0L), (2L, Array(0.4f, -0.1f, 0.8f), 0L))
    // the public column helper: zip_with pads the 3-dim vector with nulls,
    // the dot is null, no sign bit fires → bucket 0
    val q = expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))")
    assert(short.select(Similarity.lshBucket(q).as("b")).collect().forall(_.getLong(0) == 0L))
    // the primitive kernel must agree: both land in bucket 0 together and
    // find each other as rank-1 neighbors
    val got = Similarity.signLshTopK(short, "vec_id", "embedding", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (2L, 1L, 1)))
  }

  test("signature function builders validate arity and coerce element types") {
    val s = spark
    graft.functions.MinHashSig.register(s)
    graft.functions.SimHash16.register(s)
    // non-array input and wrong arity fail at analysis, not mid-execution
    intercept[Exception](s.sql("SELECT minhash_sig(5)").collect())
    intercept[Exception](s.sql("SELECT simhash16(named_struct('a', 1))").collect())
    intercept[Exception](s.sql("SELECT minhash_sig(array('a'), array('b'))").collect())
    intercept[Exception](s.sql("SELECT simhash16()").collect())
    // numeric arrays coerce elementwise to string
    val a = s.sql("SELECT simhash16(array(1, 2)) AS h, minhash_sig(array(1, 2)) AS m").collect().head
    val b = s.sql("SELECT simhash16(array('1', '2')) AS h, minhash_sig(array('1', '2')) AS m").collect().head
    assert(a.getLong(0) == b.getLong(0))
    assert(a.getSeq[String](1) == b.getSeq[String](1))
  }

  test("property: bitset Jaccard kernel matches a naive set-based reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val doc = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
    val prop = Prop.forAll(corpus) { texts =>
      val df = docs(texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t, "b") }: _*)
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", "source").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // naive reference: distinct word-bigram sets, inter/union, skip 0
      def grams(t: String): Set[String] = {
        val ws = t.split(" ")
        ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }.toSet
      }
      val exp = (for {
        i <- texts.indices
        j <- (i + 1) until texts.length
        ga = grams(texts(i)); gb = grams(texts(j))
        inter = (ga & gb).size
        if inter > 0
      } yield ((i + 1).toLong, (j + 1).toLong) -> inter.toDouble / (ga | gb).size).toMap
      got == exp
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: native SimHash16 expression matches the hex-char vote definition") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    graft.functions.SimHash16.register(spark)
    val word = Gen.oneOf((1 to 20).map(i => s"tok$i") ++ Seq("über", "naïve", "句子"))
    val wordsGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, word)).map(_.distinct)
    def reference(ws: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](16)
      ws.foreach { w =>
        md.reset()
        val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (0 until 16).foreach { j =>
          votes(j) += (if ("89abcdef".contains(hex.charAt(j))) 1 else -1)
        }
      }
      (0 until 16).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }
    val prop = Prop.forAll(wordsGen) { ws =>
      val s = spark
      import s.implicits._
      val got = Seq(Tuple1(ws)).toDF("ws")
        .selectExpr("simhash16(ws) AS sig").head().getLong(0)
      got == reference(ws)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: clusterPairs equals a union-find reference on random edge sets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    val n = 12
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
      .map(_.filter { case (a, b) => a != b }.take(15))
    val prop = Prop.forAll(edgeGen) { edges =>
      val ids = (1L to n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      // both strategies: the single-task endgame (default cutoff — these
      // fixtures always fall under it) and the distributed propagation
      // rounds (cutoff 0)
      val got = Dedup.clusterPairs(ids, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotDist = Dedup.clusterPairs(ids, pairs, localCutoff = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val exp = (1L to n.toLong).map(i => i -> find(i)).toMap
      got == exp && gotDist == exp
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("similarity: empty corpus yields empty; single vector has no neighbors") {
    val empty = vecs()
    assert(Similarity.bruteForceTopK(empty, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.nearDupPairs(empty, "vec_id", "embedding", 0.5).count() == 0)
    assert(Similarity.pqTopK(empty, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.ivfPqTopK(empty, "vec_id", "embedding", 3,
      shortlist = 5, nlist = 4, nprobe = 2, codes = 4, lloydRounds = 1).count() == 0)
    val one = vecs((1L, Array.fill(64)(0.5f), 0L))
    assert(Similarity.bruteForceTopK(one, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.signLshTopK(one, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.nearDupPairs(one, "vec_id", "embedding", 0.5).count() == 0)
    // one vector: it IS the codebook/centroid; still no self-neighbor
    assert(Similarity.ivfPqTopK(one, "vec_id", "embedding", 3,
      shortlist = 5, nlist = 4, nprobe = 2, codes = 4, lloydRounds = 1).count() == 0)
    // a model trained on an EMPTY frame serving nonempty queries: no
    // cells to probe -> empty result, not an index-out-of-bounds
    val emptyModel = Similarity.ivfPqModel(empty, "vec_id", "embedding",
      nlist = 4, codes = 4, lloydRounds = 1, normalize = true)
    assert(Similarity.ivfPqQueryTopK(
      Similarity.ivfPqEncode(empty, "vec_id", "embedding", emptyModel),
      empty, one, "vec_id", "embedding", 3, emptyModel,
      shortlist = 5, nprobe = 2).count() == 0)
  }

  test("minHashPairs maxBandBucket: oversized band buckets pruned, small ones intact") {
    // 5 identical docs share every band -> bucket of 5; the distinct pair
    // (10, 11) lives in buckets of <= 2
    val df = docs(
      (1L, "alpha beta gamma delta", "src"), (2L, "alpha beta gamma delta", "src"),
      (3L, "alpha beta gamma delta", "src"), (4L, "alpha beta gamma delta", "src"),
      (5L, "alpha beta gamma delta", "src"),
      (10L, "unrelated words entirely different", "src"),
      (11L, "unrelated words entirely different", "src"),
    )
    val exact = Dedup.minHashPairs(df, "doc_id", "text", "source")
    assert(exact.count() == 11) // C(5,2) + 1
    val capped = Dedup.minHashPairs(df, "doc_id", "text", "source", maxBandBucket = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 11L)))
  }

  test("nearDupClusters: signature collapse equals clustering the full pair listing") {
    // the rep-collapse shortcut (union-find over {member→rep} ∪ {rep-rep})
    // must label EXACTLY like min-label propagation over every hamming-≤h
    // pair — including chains that cross signature groups (A~B, B~C, A≁C)
    val corpus = Tables(spark, sf("sf0.001"), "documents")
    val full = Dedup.clusterPairs(
        corpus.select(col("doc_id")),
        Dedup.simHashPairs(corpus, "doc_id", "text", "source", 3))
      .select("doc_id", "canonical_id", "cluster_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val collapsed = Dedup.nearDupClusters(corpus, "doc_id", "text", "source", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collapsed == full)
    // no vacuous pass: the fixture must actually contain a multi-doc cluster
    assert(full.exists(_._3 > 1))
  }

  test("dedupKeep: exactly one survivor per cluster, and it's the best-quality member") {
    val s = spark
    import s.implicits._
    // a and b are near-dups (1-word delta); c is distinct; quality = n_chars
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "src", 49L),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "src", 51L),
      (3L, "completely different text about unrelated matters entirely", "src", 59L),
    ).toDF("doc_id", "text", "source", "n_chars")
    val kept = Dedup.dedupKeep(df, "doc_id", "text", "source", "n_chars", 3)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // one keep per canonical_id
    val perCluster = kept.groupBy(_._2).map { case (_, g) => g.count(_._4) }
    assert(perCluster.forall(_ == 1))
    // every doc labeled, keeps cover all clusters
    assert(kept.length == 3)
    // docs 1 and 2 MUST cluster (1-word delta) or the policy below is
    // never exercised — no vacuous pass
    val clustered = kept.filter(_._3 > 1)
    assert(clustered.nonEmpty, "near-dup docs 1/2 failed to cluster")
    // in the near-dup cluster the longer doc (id 2) survives
    assert(kept.find(_._1 == 2L).exists(_._4))
    assert(!kept.find(_._1 == 1L).exists(_._4))
  }

  test("dedupKeep + domainQuota: FRACTIONAL quality scores rank, not truncate") {
    val s = spark
    import s.implicits._
    // model scores in [0,1): under the old long cast every score truncated
    // to 0 and the survivor degraded to lowest-id-wins — doc 1 (score 0.2)
    // would beat doc 2 (score 0.9)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "src", 0.2),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "src", 0.9),
      (3L, "completely different text about unrelated matters entirely", "src", 0.5),
    ).toDF("doc_id", "text", "source", "score")
    val kept = Dedup.dedupKeep(df, "doc_id", "text", "source", "score", 3)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(kept.filter(_._3 > 1).nonEmpty, "near-dup docs 1/2 failed to cluster")
    assert(kept.find(_._1 == 2L).exists(_._4), "highest fractional score must survive")
    assert(!kept.find(_._1 == 1L).exists(_._4))
    // domainQuota with quota 2: the two highest scores (2, 3) are kept and
    // src_rank follows the fractional ordering
    val quota = TextAnalysis.domainQuota(df, "doc_id", "source", "score", 2)
      .as[(Long, String, Double, Long, Boolean)].collect().sortBy(_._1)
    assert(quota.map(r => r._1 -> r._4).toMap == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    assert(quota.filter(_._5).map(_._1).toSet == Set(2L, 3L))
  }

  test("repetitionStats: degenerate docs — single word, all-repeated, all-distinct") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "solo"),                    // 1 word: no bigrams → dup_bigram 0.0
      (2L, "rep rep rep rep"),         // all same: dup_word 0.75, top 1.0
      (3L, "all words here differ"),   // all distinct: dup fractions 0
    ).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 1L, 0.0, 0.0, 1.0)))
    assert(m(2L) == ((2L, 4L, 0.75, 0.666667, 1.0))) // 2/3 rounded at 1e-6
    assert(m(3L) == ((3L, 4L, 0.0, 0.0, 0.25)))
  }

  test("shardPack: offsets stay under budget and shards are contiguous per source") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e", "x"), (2L, "a b c", "x"), (3L, "a b c d", "x"),
      (4L, "a", "y"), (5L, "a b", "y"),
    ).toDF("doc_id", "text", "source")
    val packed = graft.operators.TextAnalysis.shardPack(df, "doc_id", "text", "source", 6L)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    // budget 6, source x token runs: 5, 3, 4 → cum_before 0, 5, 8 → shards 0, 0, 1
    assert(packed.filter(_._2 == "x").map(p => (p._4, p._5)).toSeq ==
      Seq((0L, 0L), (0L, 5L), (1L, 2L)))
    // source y independent: cum 0, 1 → both shard 0
    assert(packed.filter(_._2 == "y").map(_._4).toSeq == Seq(0L, 0L))
    assert(packed.forall(p => p._5 >= 0 && p._5 < 6))
  }

  test("lmScore: hand-computed corpus bigram frequencies, single word scores zero") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // corpus bigram counts: "a b" ×3, "b a" ×1, "b c" ×1
    assert(out(0) == ((0L, 3L, 2.333333))) // (3+1+3)/3, rounded half-up at 1e-6
    assert(out(1) == ((1L, 2L, 2.0)))      // (3+1)/2
    assert(out(2) == ((2L, 0L, 0.0)))      // no bigrams
  }

  test("rakeKeywords golden: stopword-delimited phrases, deg/freq micros, rank order") {
    // stop = {the} (most frequent); islands: [cat sat] [dog ran] [cat];
    // freq: cat 2, sat/dog/ran 1; deg: cat 3, sat/dog/ran 2 →
    // word scores (micros): cat 1.5e6, others 2e6 → phrase scores:
    // "dog ran" 4e6 > "cat sat" 3.5e6 > "cat" 1.5e6
    val d = docs((1L, "the cat sat the dog ran the cat", "s")).drop("source")
    val got = TextAnalysis.rakeKeywords(d, "doc_id", "text", nStop = 1)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .sortBy(_._5)
    assert(got.toSeq == Seq(
      ("dog ran", 2L, 4000000L, 1L, 1),
      ("cat sat", 2L, 3500000L, 1L, 2),
      ("cat", 1L, 1500000L, 1L, 3)))
    // empty corpus and all-stopword text degrade to empty, never throw
    assert(TextAnalysis.rakeKeywords(docs().drop("source"), "doc_id", "text").count() == 0)
    val allStop = docs((2L, "a a a", "s")).drop("source")
    assert(TextAnalysis.rakeKeywords(allStop, "doc_id", "text", nStop = 1).count() == 0)
    // runs longer than maxLen are dropped, not truncated
    val longRun = docs((3L, "z w1 w2 w3 w4 z", "s")).drop("source")
    val kept = TextAnalysis.rakeKeywords(longRun, "doc_id", "text", nStop = 1, maxLen = 3)
      .collect()
    assert(kept.isEmpty, "a 4-word run must be dropped at maxLen=3")
  }
}
