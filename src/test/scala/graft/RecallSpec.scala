package graft

import org.apache.spark.sql.functions._

/** Recall floors for the ANN production shapes against exact ground truth
  * on the committed z5k Zipf fixture (VERDICT r10 #3): the approximate
  * operators are hash-green on their OWN contracts (bucket-gated / ADC),
  * so without these floors a future "faster" change could silently trade
  * recall away. Floors sit ~10-15% under the round-11 measured values
  * (PLANS.md table) — headroom for tie-break jitter, not for regressions:
  *   hybrid_lsh@20 0.824, pq_shortlist50_c256@10 0.826,
  *   pq_norm_lloyd4_c256@10 0.410, multiprobe@10 0.430 vs lsh@10 0.144.
  * recallVs itself is pinned by construction cases first, so a floor
  * can't pass because the metric broke.
  */
class RecallSpec extends SparkSuite {

  // the z5k fixture is deterministic (hash-derived, no RNG) and
  // gitignored — generate it on first use, same as Bench's zipf block
  private lazy val fixture = {
    val dir = "/root/repo/bench/fixtures/z5k"
    if (!new java.io.File(s"$dir/documents.parquet").exists())
      MakeZipf.generate(spark, dir, 5000L)
    dir
  }
  private lazy val docs = Tables(spark, fixture, "documents")
  private lazy val emb = Tables(spark, fixture, "embeddings")
  private lazy val exact10 = operators.Similarity
    .bruteForceTopK(emb, "vec_id", "embedding", 10)
    .localCheckpoint(false)

  private def recall(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame,
      q: String = "query_id", n: String = "neighbor_id"): Double =
    operators.Similarity.recallVs(exact, approx, q, n).collect()(0).getDouble(1)

  test("recallVs: construction cases") {
    val s = spark
    import s.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("q", "n")
    // full overlap -> 1.0; missing one of q=1's two -> (0.5 + 1.0)/2
    assert(recall(exact, exact, "q", "n") == 1.0)
    val partial = Seq((1L, 10L), (2L, 20L)).toDF("q", "n")
    assert(math.abs(recall(exact, partial, "q", "n") - 0.75) < 1e-12)
    // a query approx answered for which exact has no row must not count
    val extra = partial.union(Seq((9L, 90L)).toDF("q", "n"))
    assert(math.abs(recall(exact, extra, "q", "n") - 0.75) < 1e-12)
    // a query approx SKIPPED counts 0, not dropped: per-query recalls are
    // (q=1 -> 0/2, q=2 -> 1/1), mean 0.5 — NOT the global hit fraction 1/3
    val skipped = Seq((2L, 20L)).toDF("q", "n")
    assert(math.abs(recall(exact, skipped, "q", "n") - 0.5) < 1e-12)
  }

  test("hybrid denseLsh keeps recall@20 >= 0.75 of the exact-dense hybrid") {
    val qp = col("doc_id") % 100 === 0
    val exactH = operators.Retrieval.hybridRrf(docs, emb, qp, topOut = 20)
    val lshH = operators.Retrieval.hybridRrf(docs, emb, qp, topOut = 20,
      denseLsh = true)
    val r = recall(exactH, lshH, "query_id", "doc_id")
    assert(r >= 0.75, f"hybrid_lsh recall@20 $r%.3f fell below the 0.75 floor")
  }

  test("PQ shortlist-50 (normalized, lloyd4, 256 codes) finds >= 0.7 of exact top-10") {
    val r = recall(exact10, operators.Similarity.pqTopK(
      emb, "vec_id", "embedding", 50,
      normalize = true, lloydRounds = 4, codes = 256))
    assert(r >= 0.7, f"pq shortlist recall@10 $r%.3f fell below the 0.7 floor")
  }

  test("PQ direct top-10 (normalized, lloyd4, 256 codes) holds >= 0.3; raw ADC >= 0.08") {
    val tuned = recall(exact10, operators.Similarity.pqTopK(
      emb, "vec_id", "embedding", 10,
      normalize = true, lloydRounds = 4, codes = 256))
    assert(tuned >= 0.3, f"tuned pq recall@10 $tuned%.3f fell below the 0.3 floor")
    val raw = recall(exact10,
      operators.Similarity.pqTopK(emb, "vec_id", "embedding", 10))
    assert(raw >= 0.08, f"raw pq recall@10 $raw%.3f fell below the 0.08 floor")
  }

  test("ivfPqTopK degenerates to EXACT bruteForceTopK when nothing is pruned") {
    // nprobe = nlist (every cell probed) and shortlist >= corpus: the ADC
    // stage retrieves everything and the exact rerank must then reproduce
    // bruteForceTopK row for row — rank, neighbor, and rounded cosine.
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "embeddings")
    val exact = operators.Similarity.bruteForceTopK(e, "vec_id", "embedding", 3)
    val ivf = operators.Similarity.ivfPqTopK(e, "vec_id", "embedding", 3,
      shortlist = 1000, nlist = 4, nprobe = 4, codes = 8, lloydRounds = 1,
      normalize = false)
    assert(ivf.exceptAll(exact).count() == 0 && exact.exceptAll(ivf).count() == 0,
      "exhaustive IVF-PQ (+ exact rerank) must equal the brute-force ranking")
  }

  test("split index/query API reproduces the monolithic ivfPqTopK exactly") {
    // the production shape: train once, persist the (cell, vec_id, codes)
    // index, serve queries later — must equal the self-join convenience
    // form row for row (same model, same parameters)
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "embeddings")
    val mono = operators.Similarity.ivfPqTopK(e, "vec_id", "embedding", 3,
      shortlist = 20, nlist = 8, nprobe = 3, codes = 16, lloydRounds = 2)
    val m = operators.Similarity.ivfPqModel(e, "vec_id", "embedding",
      nlist = 8, codes = 16, lloydRounds = 2, normalize = true)
    // round-trip the index through parquet — the persistable contract
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    operators.Similarity.ivfPqEncode(e, "vec_id", "embedding", m)
      .write.mode("overwrite").parquet(idxDir)
    val split = operators.Similarity.ivfPqQueryTopK(
      spark.read.parquet(idxDir), e, e, "vec_id", "embedding", 3, m,
      shortlist = 20, nprobe = 3)
    assert(split.exceptAll(mono).count() == 0 && mono.exceptAll(split).count() == 0,
      "persisted-index serving must equal the monolithic form")
  }

  test("adaptive probing: ratio 0 and a vacuous ratio are bit-identical; tight ratios stay recall-sane") {
    // probeRatio is the serve knob that cuts the replication COUNT (the
    // binding term, PLANS.md round 13). Contracts: (a) the default 0 and
    // a ratio large enough to admit every cell must EQUAL the exact-
    // nprobe serve row for row; (b) a tight ratio returns a valid top-k
    // frame (correct shape, no out-of-corpus ids, per-query rank 1..k')
    // whose recall against exact-nprobe stays above a fixture floor;
    // (c) the nearest cell is always probed, so every query still gets
    // answers.
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = Tables(s, dir, "embeddings")
    def serve(ratio: Double) = operators.Similarity.ivfPqTopK(
      e, "vec_id", "embedding", 3, shortlist = 20, nlist = 8, nprobe = 3,
      codes = 16, lloydRounds = 2, probeRatio = ratio)
    val exact = serve(0.0).localCheckpoint(false)
    val vacuous = serve(1e9)
    assert(vacuous.exceptAll(exact).count() == 0 &&
      exact.exceptAll(vacuous).count() == 0,
      "a ratio admitting every cell must equal the exact-nprobe serve")
    val tight = serve(1.05).localCheckpoint(false)
    val qs = exact.select("query_id").distinct().count()
    assert(tight.select("query_id").distinct().count() == qs,
      "every query must still be answered (nearest cell always probed)")
    val overlap = tight.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count().toDouble
    assert(overlap / (qs * 3) >= 0.6,
      s"tight-ratio recall vs exact-nprobe fell below the fixture floor: ${overlap / (qs * 3)}")
    val badRatio = intercept[IllegalArgumentException](serve(0.5))
    assert(badRatio.getMessage.contains("probeRatio"))
  }

  test("filtered ANN: a predicate-filtered index serves exactly the filtered corpus") {
    // the production shape for metadata-filtered vector search: the index
    // is a plain DataFrame, so search-within-a-subset is .filter() on it —
    // no re-encode, no retrain. Contract: serving over index.filter(pred)
    // equals serving over an index freshly ENCODED from corpus.filter(pred)
    // (encode is per-row, so the two are the same set of rows), and no
    // neighbor from outside the predicate can appear.
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val e = Tables(s, dir, "embeddings").localCheckpoint(false)
    val m = operators.Similarity.ivfPqModel(e, "vec_id", "embedding",
      nlist = 8, codes = 16, lloydRounds = 2, normalize = true)
    val idx = operators.Similarity.ivfPqEncode(e, "vec_id", "embedding", m)
    val pred = org.apache.spark.sql.functions.col("vec_id") % 3 === 0
    val viaFilter = operators.Similarity.ivfPqQueryTopK(
      idx.filter(org.apache.spark.sql.functions.col("vec_id") % 3 === 0),
      e, e, "vec_id", "embedding", 3, m, shortlist = 20, nprobe = 3)
    val viaEncode = operators.Similarity.ivfPqQueryTopK(
      operators.Similarity.ivfPqEncode(e.filter(pred), "vec_id", "embedding", m),
      e, e, "vec_id", "embedding", 3, m, shortlist = 20, nprobe = 3)
    assert(viaFilter.exceptAll(viaEncode).count() == 0 &&
      viaEncode.exceptAll(viaFilter).count() == 0,
      "filtering the index must equal encoding the filtered corpus")
    assert(viaFilter.filter(org.apache.spark.sql.functions
      .col("neighbor_id") % 3 =!= 0).count() == 0,
      "no neighbor from outside the predicate may appear")
    assert(viaFilter.count() > 0, "the filtered search must still return rows")
  }

  test("IVF-PQ (nprobe 8/64, shortlist 50) recall@10 >= 0.55 on z5k") {
    val r = recall(exact10, operators.Similarity.ivfPqTopK(
      emb, "vec_id", "embedding", 10,
      shortlist = 50, nlist = 64, nprobe = 8, codes = 256, lloydRounds = 4))
    assert(r >= 0.55, f"ivfpq recall@10 $r%.3f fell below the 0.55 floor")
  }

  test("multi-probe LSH recall@10 >= 0.35 and beats single-bucket LSH") {
    val multi = recall(exact10, operators.Similarity
      .signLshTopKMultiProbe(emb, "vec_id", "embedding", 10))
    val single = recall(exact10, operators.Similarity
      .signLshTopK(emb, "vec_id", "embedding", 10))
    assert(multi >= 0.35, f"multiprobe recall@10 $multi%.3f fell below the 0.35 floor")
    assert(multi > single,
      f"multi-probe ($multi%.3f) must beat single-bucket ($single%.3f)")
  }
}
