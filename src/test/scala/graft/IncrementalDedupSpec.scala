package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of [[Dedup.incrementalDedup]] beyond the oracle hash: the
  * one-sided admission rule (snapshot docs are never flagged, batch docs
  * defer to smaller ids), brute-force agreement on a corpus whose dups
  * are exact twins (so LSH recall is total and the reference needs no
  * banding), and partition invariance.
  */
class IncrementalDedupSpec extends SparkSuite {

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // batch = even ids. 0 duplicates snapshot doc 1; 4 duplicates batch
  // doc 2 (both in batch, larger defers to smaller); 6 is unique; 8
  // near-duplicates snapshot doc 3 (one word APPENDED to 21 — shingle
  // sets 20 vs 21, jaccard 20/21 ≈ 0.952).
  private val corpus = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota",
    3L -> "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20",
    5L -> "completely different snapshot content lives here",
    0L -> "alpha beta gamma delta epsilon zeta eta theta iota",
    2L -> "red orange yellow green blue indigo violet",
    4L -> "red orange yellow green blue indigo violet",
    6L -> "nothing matches this batch document at all",
    8L -> "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20 tail",
  )

  private def run(df: DataFrame) =
    Dedup.incrementalDedup(df, "doc_id", "text", col("doc_id") % 2 === 0)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq

  test("flags batch docs against snapshot and earlier batch; smallest id wins") {
    val out = run(docs(corpus: _*))
    assert(out == Seq(
      (0L, true, 1L),  // exact twin of snapshot doc 1
      (2L, false, -1L), // first of the batch pair — nothing earlier matches
      (4L, true, 2L),  // exact twin of batch doc 2 (2 < 4)
      (6L, false, -1L),
      (8L, true, 3L),  // near-dup of snapshot doc 3 at shingle jaccard 20/21
    ))
  }

  test("snapshot docs never appear in the output") {
    val out = run(docs(corpus: _*))
    assert(out.map(_._1).forall(_ % 2 == 0))
    assert(out.size == corpus.count(_._1 % 2 == 0))
  }

  test("partition-invariant") {
    val base = run(docs(corpus: _*))
    val shuffled = run(docs(corpus.reverse: _*).repartition(7))
    assert(shuffled == base)
  }

  test("maxBandBucket: generous cap is exact, tight cap drops banded recall") {
    val base = run(docs(corpus: _*))
    val generous = Dedup.incrementalDedup(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0, maxBandBucket = Some(100))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq
    assert(generous == base)
    // cap 1 prunes every shared bucket — nothing can be flagged, but
    // every batch doc still reports (the output contract is unchanged)
    val tight = Dedup.incrementalDedup(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0, maxBandBucket = Some(1))
      .collect()
    assert(tight.length == corpus.count(_._1 % 2 == 0))
    assert(tight.forall(!_.getBoolean(1)))
  }

  test("maxBandBucket middle case: band-0 bucket pruned, surviving band-1 collision still flags") {
    // The regression shape: a pair that collides in BOTH bands (exact
    // twins), whose band-0 bucket is oversized because near-twin variants
    // share the band-0 key — pruning drops the band-0 rows, the pair's
    // only surviving candidate comes from band 1, and that candidate has
    // EQUAL band-0 keys. The unconditional double-hit filter used to
    // discard it; capped mode must use positional distinct instead.
    graft.functions.MinHashSig.register(spark)
    val base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val s = spark
    import s.implicits._
    // Deterministic search: appended-word near-twins whose band-0 key
    // matches the base but whose band-1 key differs (per-slot change
    // prob ≈ 1/22, so ~14% of variants qualify).
    val shingleExpr = "array_distinct(filter(zip_with(split(text, ' '), " +
      "slice(split(text, ' '), 2, size(split(text, ' '))), " +
      "(a, b) -> concat(a, ' ', b)), g -> g IS NOT NULL))"
    val sigs = (base +: (0 until 60).map(i => s"$base x$i")).toDF("text")
      .withColumn("sig", expr(s"minhash_sig($shingleExpr)"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Any](1).map(_.toString))
      .toMap
    def band(t: String, b: Int) = sigs(t).slice(4 * b, 4 * b + 4).mkString
    val variants = sigs.keys.filter(t => t != base &&
      band(t, 0) == band(base, 0) && band(t, 1) != band(base, 1)).toSeq.sorted
    assert(variants.size >= 3, "fixture search found too few band-partial twins")
    // snapshot: base (id 1) + three band-0-sharing variants; batch: exact
    // twin of base (id 0). Band-0 bucket = {0,1,3,5,7} (5 > cap 4) →
    // pruned; band-1 bucket = {0,1} survives.
    val corpus = docs(Seq(1L -> base, 3L -> variants(0), 5L -> variants(1),
      7L -> variants(2), 0L -> base): _*)
    val out = Dedup.incrementalDedup(corpus, "doc_id", "text",
        col("doc_id") % 2 === 0, maxBandBucket = Some(4))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L && out(0).getBoolean(1) && out(0).getLong(2) == 1L)
  }

  test("jaccard is the exact shingle-set value for the reported dup_of") {
    val row = Dedup.incrementalDedup(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0)
      .filter(col("doc_id") === 8L).collect()(0)
    assert(row.getDouble(3) == 20.0 / 21.0)
  }
}
