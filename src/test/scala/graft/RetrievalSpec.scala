package graft

import graft.operators.Retrieval
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the hybrid-RRF fusion semantics and the DSIR importance-weight
  * direction on hand-built corpora (the DuckDB oracle hash-checks the full
  * pipelines end-to-end at sf0.01; these tests pin the properties a hash
  * can't explain: fusion arithmetic, self-exclusion, weight signs,
  * selection count, and plan shape).
  */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  private def embDf(rows: (Long, Seq[Float])*) =
    rows.toSeq.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")

  test("hybridRrf: RRF of a doc ranked on both legs beats single-leg docs") {
    // doc 0 is the query. doc 1 is lexically identical AND embedding-close
    // (top of both legs); doc 2 shares no tokens but is embedding-close;
    // doc 3 is lexically close but embedding-far.
    val docs = docsDf(
      (0L, "alpha beta gamma", "en"),
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon zeta", "en"),
      (3L, "alpha beta eta", "en"))
    val emb = embDf(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.95f, 0.05f)), (3L, Seq(0f, 1f)))
    val out = Retrieval.hybridRrf(docs, emb, col("doc_id") === 0, topPerLeg = 2, topOut = 3,
        maxDfFrac = None) // exact BM25: this test pins the fusion arithmetic
      .collect()
    assert(out.forall(_.getLong(0) == 0L), "only the query doc emits rows")
    assert(!out.exists(_.getLong(2) == 0L), "self-match excluded")
    // doc 1: lex rank 1 + dense rank 2 (doc 2's vector is nearer the query,
    // so it takes dense rank 1 but never appears lexically); docs 2/3 are
    // single-leg and fuse below it.
    val byRank = out.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getDouble(3)))
    assert(byRank.head._1 == 1L, s"both-legs doc must fuse to rank 1: ${byRank.toSeq}")
    assert(byRank.head._2 > byRank(1)._2)
    // exact integer RRF: floor(1e6/61) + floor(1e6/62), in micros
    assert(math.abs(byRank.head._2 - (math.floor(1e6 / 61) + math.floor(1e6 / 62)) / 1e6) < 1e-9)
  }

  test("hybridRrf: corpus is never shuffled before dense scoring (broadcast query side)") {
    val docs = docsDf((0L, "a b", "en"), (1L, "a c", "en"), (2L, "b c", "en"))
    val emb = embDf((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)))
    val plan = Retrieval.hybridRrf(docs, emb, col("doc_id") === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"dense leg must broadcast the query side:\n$plan")
  }

  test("hybridRrf: maxDfFrac prunes universal terms before the posting fan-out") {
    // 'the' appears in every doc (df=4/4); doc 1 shares ONLY 'the' with the
    // query, doc 2 shares the rare term. Uncapped, both doc 1 and doc 2
    // appear on the lexical list; capped at 0.9, 'the' is pruned from the
    // term dictionary and doc 1 loses its lexical rank entirely.
    val docs = docsDf(
      (0L, "the rare", "en"),
      (1L, "the junk", "en"),
      (2L, "rare junk the", "en"),
      (3L, "the junk junk", "en"))
    val emb = embDf(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0.5f, 0.5f)), (3L, Seq(-1f, 0f)))
    def lexRanks(cap: Option[Double]) =
      Retrieval.hybridRrf(docs, emb, col("doc_id") === 0, topPerLeg = 10, topOut = 4,
        maxDfFrac = cap)
        .collect().map(r => r.getLong(2) -> !r.isNullAt(4)).toMap
    val uncapped = lexRanks(None)
    val capped = lexRanks(Some(0.9))
    assert(uncapped(1L), "doc 1 reaches the lexical list via 'the' when uncapped")
    assert(capped.get(1L).forall(!_), "df-capped: doc 1 has no lexical rank")
    assert(capped(2L), "rare-term doc keeps its lexical rank under the cap")
  }

  test("hybridRrf: default maxDfFrac=0.5 prunes over-half-corpus terms; None restores exact BM25") {
    // 'the' has df 4/4 — the DEFAULT production path must prune it (doc 1
    // is reachable only through 'the' and loses its lexical rank), while
    // an explicit None keeps textbook BM25 (doc 1 ranked). Same fixture
    // as the explicit-cap test, exercised through the default argument.
    val docs = docsDf(
      (0L, "the rare", "en"),
      (1L, "the junk", "en"),
      (2L, "rare junk the", "en"),
      (3L, "the junk junk", "en"))
    val emb = embDf(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0.5f, 0.5f)), (3L, Seq(-1f, 0f)))
    val default = Retrieval.hybridRrf(docs, emb, col("doc_id") === 0,
        topPerLeg = 10, topOut = 4)
      .collect().map(r => r.getLong(2) -> !r.isNullAt(4)).toMap
    val exact = Retrieval.hybridRrf(docs, emb, col("doc_id") === 0,
        topPerLeg = 10, topOut = 4, maxDfFrac = None)
      .collect().map(r => r.getLong(2) -> !r.isNullAt(4)).toMap
    assert(default.get(1L).forall(!_), "default prunes the universal term")
    assert(exact(1L), "explicit None restores the exact-BM25 lexical rank")
    assert(default(2L), "rare-term doc keeps its lexical rank under the default")
  }

  test("hybridRrf: maxQueryTerms keeps only the query's rarest terms in the fan-out") {
    // Query terms by rarity: 'rare' (df 2) < 'mid' (df 3) < 'the' (df 4).
    // With a 1-term budget only 'rare' scores, so doc 2 (reachable only
    // via 'mid') loses its lexical rank; with the budget lifted (None, df
    // cap also off) it keeps it. Deterministic rarest-first: df asc, term.
    val docs = docsDf(
      (0L, "rare mid the", "en"),
      (1L, "rare the mid", "en"),
      (2L, "mid junk the", "en"),
      (3L, "junk junk the", "en"))
    val emb = embDf(
      (0L, Seq(1f, 0f)), (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
    def lexRanked(t: Option[Int]) =
      Retrieval.hybridRrf(docs, emb, col("doc_id") === 0, topPerLeg = 10, topOut = 4,
        maxDfFrac = None, maxQueryTerms = t)
        .collect().map(r => r.getLong(2) -> !r.isNullAt(4)).toMap
    val capped = lexRanked(Some(1))
    val exact = lexRanked(None)
    assert(capped(1L), "doc sharing the rarest term keeps its lexical rank under the budget")
    assert(capped.get(2L).forall(!_), s"budget=1: mid-term-only doc has no lexical rank: $capped")
    assert(exact(2L), "no budget: the mid-frequency term still scores")
  }

  test("hybridRrf denseLsh: dense ranks only ever pair same-bucket vectors") {
    // Property on the real sf0.001 fixture: every output row with a dense
    // rank must connect two vectors in the SAME sign-LSH bucket (the
    // exact leg would also admit cross-bucket neighbors). Buckets are
    // recomputed here via the public Similarity column helpers.
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    val out = operators.Retrieval.hybridRrf(docs, emb,
      col("doc_id") % 100 === 0, denseLsh = true)
    val buckets = emb.select(col("vec_id"),
      operators.Similarity.lshBucket(
        operators.Retrieval.quantized(col("embedding")))
        .as("bkt"))
    val denseRows = out.where(col("r_dense").isNotNull)
      .join(buckets.select(col("vec_id").as("query_id"), col("bkt").as("qb")), "query_id")
      .join(buckets.select(col("vec_id").as("doc_id"), col("bkt").as("db")), "doc_id")
    assert(denseRows.count() > 0, "fixture must produce some dense-leg ranks")
    assert(denseRows.where(col("qb") =!= col("db")).count() == 0,
      "a dense rank must never cross sign-LSH buckets")
  }

  test("importanceWeights: target-like docs weigh higher; selection is exact-k") {
    // Target (lang=en) docs use 'good'; others use 'bad'. A doc full of
    // 'good' tokens must out-weigh a doc full of 'bad' tokens.
    val docs = docsDf(
      (0L, "good good good", "en"),
      (1L, "good good bad", "en"),
      (2L, "bad bad bad", "zh"),
      (3L, "bad bad good", "zh"),
      (4L, "good bad good", "en"))
    val out = Retrieval.importanceWeights(docs, col("lang") === "en", keep = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    val w = out.map(t => t._1 -> t._2).toMap
    assert(w(0L) > w(2L), s"all-target-token doc must out-weigh all-other: $w")
    assert(w(0L) > w(1L) && w(1L) > w(2L))
    assert(out.count(_._3) == 2, "exactly keep=2 selected")
    // docs 1 and 4 tie (identical token bags); the id tie-break keeps doc 1.
    assert(w(1L) == w(4L))
    assert(out.filter(_._3).map(_._1).toSet == Set(0L, 1L),
      s"highest-weight docs selected, ties broken by id: ${out.toSeq}")
  }

  test("leakFreeSplit: near-twins land in one split, extremes cover the ranges") {
    val s = spark
    import s.implicits._
    // docs 0/1 are near-identical (one word differs) in the same source →
    // one cluster → one split. 2 and 3 are unrelated singletons.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "src0"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota", "src0"),
      (2L, "completely different words entirely here now", "src0"),
      (3L, "unrelated content again something else whole", "src1"))
      .toDF("doc_id", "text", "source")
    val out = Retrieval.leakFreeSplit(docs, 0.8, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byDoc = out.map(t => t._1 -> t._3).toMap
    assert(out.map(_._3).forall(Set("train", "val", "test")))
    val twins = out.filter(t => t._1 <= 1L)
    assert(twins.map(_._2).distinct.size == 1, s"twins share a cluster: ${out.toSeq}")
    assert(twins.map(_._3).distinct.size == 1, s"twins share a split: ${out.toSeq}")
    // degenerate fractions pin the threshold arithmetic
    val allTrain = Retrieval.leakFreeSplit(docs, 1.0, 0.0)
      .select("split").collect().map(_.getString(0))
    assert(allTrain.forall(_ == "train"))
    val allTest = Retrieval.leakFreeSplit(docs, 0.0, 0.0)
      .select("split").collect().map(_.getString(0))
    assert(allTest.forall(_ == "test"))
  }

  test("contrastiveTriples: positives are canonicals, negatives never share the cluster") {
    val s = spark
    import s.implicits._
    // two near-twin pairs + two singletons; every anchor must draw its
    // negative from OUTSIDE its own cluster even with a tiny pool
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "src0"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota", "src0"),
      (2L, "one two three four five six seven eight", "src0"),
      (3L, "one two three four five six seven eight", "src0"),
      (4L, "completely different words entirely here now", "src0"),
      (5L, "unrelated content again something else whole", "src0"))
      .toDF("doc_id", "text", "source")
    val triples = Retrieval.contrastiveTriples(docs, poolSize = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // anchors = the non-canonical twin of each pair
    assert(triples.map(_._1).toSet == Set(1L, 3L), triples.toSeq.toString)
    val byAnchor = triples.map(t => t._1 -> t).toMap
    assert(byAnchor(1L)._2 == 0L && byAnchor(3L)._2 == 2L, "positive = canonical")
    assert(!Set(0L, 1L).contains(byAnchor(1L)._3), "negative outside anchor 1's cluster")
    assert(!Set(2L, 3L).contains(byAnchor(3L)._3), "negative outside anchor 3's cluster")
  }

  test("rankingMetrics: hand-computed nDCG/MRR goldens, edge cases") {
    val s = spark
    import s.implicits._
    // Independent scalar replay of the quantized position weight.
    def w(p: Long): Long =
      math.floor(1e6 * math.log(2.0) / math.log(p + 1.0) + 0.5).toLong
    assert(w(1) == 1000000L) // ln2/ln2 = 1 exactly
    // q1: rels by rank [0, 2, 1] -> DCG = 3·w(2) + 1·w(3);
    //     ideal order [2, 1, 0] -> IDCG = 3·w(1) + 1·w(2); first rel rank 2.
    // q2: all irrelevant -> everything 0.
    // q3: single perfect hit at rank 1 -> nDCG 1, MRR 1.
    val ranked = Seq(
      (1L, 1L, 0L), (1L, 2L, 2L), (1L, 3L, 1L),
      (2L, 1L, 0L), (2L, 2L, 0L),
      (3L, 1L, 3L),
    ).toDF("query_id", "rank", "rel")
    val got = Retrieval.rankingMetrics(ranked).orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val dcg1 = 3 * w(2) + 1 * w(3)
    val idcg1 = 3 * w(1) + 1 * w(2)
    val ndcg1 = (dcg1 * 1000000L / idcg1).toDouble / 1e6
    assert(got(0) == ((1L, dcg1, idcg1, ndcg1, 0.5)))
    assert(got(1) == ((2L, 0L, 0L, 0.0, 0.0)))
    assert(got(2) == ((3L, 7 * w(1), 7 * w(1), 1.0, 1.0)))
    // a perfectly-ordered list always scores nDCG 1; swapping two graded
    // ranks strictly lowers it
    val perfect = Seq((9L, 1L, 2L), (9L, 2L, 1L), (9L, 3L, 0L))
      .toDF("query_id", "rank", "rel")
    val swapped = Seq((9L, 1L, 1L), (9L, 2L, 2L), (9L, 3L, 0L))
      .toDF("query_id", "rank", "rel")
    val np = Retrieval.rankingMetrics(perfect).collect()(0).getDouble(3)
    val ns = Retrieval.rankingMetrics(swapped).collect()(0).getDouble(3)
    assert(np == 1.0 && ns < 1.0, s"perfect=$np swapped=$ns")
  }

  test("importanceWeights: no unpartitioned window in the plan") {
    val docs = docsDf((0L, "a b", "en"), (1L, "b c", "zh"))
    val plan = Retrieval.importanceWeights(docs, col("lang") === "en", keep = 1)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition()"),
      s"selection must be TakeOrdered + broadcast membership, not a global window:\n$plan")
    val phys = Retrieval.importanceWeights(docs, col("lang") === "en", keep = 1)
      .queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$phys")
  }
}
