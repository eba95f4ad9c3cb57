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

  test("jaccard is the exact shingle-set value for the reported dup_of") {
    val row = Dedup.incrementalDedup(docs(corpus: _*), "doc_id", "text",
        col("doc_id") % 2 === 0)
      .filter(col("doc_id") === 8L).collect()(0)
    assert(row.getDouble(3) == 20.0 / 21.0)
  }
}
