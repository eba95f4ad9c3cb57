package graft

import graft.operators.{Dedup, Similarity}

/** The sub-tiling scaffolds must be pure execution-shape changes: forcing
  * pathologically small tiles (every block/bucket split into many cells)
  * must produce byte-identical results to a single-tile run. This is the
  * invariant that lets MaxTileRows bound task heap at 100 TB without
  * touching semantics.
  */
class TilingSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private def docs = Tables(spark, dir, "documents")
  private def embs = Tables(spark, dir, "embeddings")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("ngram Jaccard pairs: 4-row tiles == single tile") {
    val tiled = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", maxTileRows = 4L)
    val whole = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    assert(tiled.count() > 0)
  }

  test("containment pairs: 4-row tiles == single tile") {
    val tiled = Dedup.containmentPairs(docs, "doc_id", "text", "source", maxTileRows = 4L)
    val whole = Dedup.containmentPairs(docs, "doc_id", "text", "source", maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
  }

  test("minhash LSH pairs: 4-row candidate tiles == single tile") {
    val tiled = Dedup.minHashPairs(docs, "doc_id", "text", "source", maxTileRows = 4L)
    val whole = Dedup.minHashPairs(docs, "doc_id", "text", "source", maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    assert(tiled.count() > 0)
  }

  test("edit-distance pairs: 4-row tiles == single tile (declarative tiling)") {
    val tiled = Dedup.editDistancePairs(docs, "doc_id", "text", "source", maxTileRows = 4L)
    val whole = Dedup.editDistancePairs(docs, "doc_id", "text", "source", maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    assert(tiled.count() > 0)
  }

  test("brute-force top-k: 16-row tiles == single tile (ranks included)") {
    val tiled = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 5, maxTileRows = 16L)
    val whole = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 5, maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    assert(tiled.count() > 0)
  }

  test("embedding near-dup pairs: 16-row tiles == single tile") {
    val tiled = Similarity.nearDupPairs(embs, "vec_id", "embedding", 0.8, maxTileRows = 16L)
    val whole = Similarity.nearDupPairs(embs, "vec_id", "embedding", 0.8, maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
  }

  test("multi-probe LSH (two-sided scan): 16-row tiles == single tile") {
    val tiled = Similarity.signLshTopKMultiProbe(embs, "vec_id", "embedding", 3, maxTileRows = 16L)
    val whole = Similarity.signLshTopKMultiProbe(embs, "vec_id", "embedding", 3, maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    assert(tiled.count() > 0)
  }

  test("PQ ADC top-k: 16-row tiles == single tile, full result surface") {
    val tiled = Similarity.pqTopK(embs, "vec_id", "embedding", 3, maxTileRows = 16L)
    val whole = Similarity.pqTopK(embs, "vec_id", "embedding", 3, maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    // every length-64 vector gets its full k neighbors (n >> k here)
    assert(whole.count() == embs.count() * 3)
    // ADC is nonnegative and ranks ascend with it per query
    val byQ = whole.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getLong(3)).toSeq == sorted.map(_.getLong(3)).sorted.toSeq)
      assert(sorted.head.getLong(3) >= 0L)
    }
  }

  test("semantic dedup: 16-row tiles == single tile, and the greedy policy holds") {
    val tiled = Similarity.semanticDedup(embs, "vec_id", "embedding", 8, 0.4, maxTileRows = 16L)
    val whole = Similarity.semanticDedup(embs, "vec_id", "embedding", 8, 0.4, maxTileRows = Long.MaxValue / 2)
    assert(canon(tiled) == canon(whole))
    // one output row per input vector, and both outcomes occur at this τ
    assert(whole.count() == embs.count())
    val kept = whole.filter("kept = 1").count()
    assert(kept > 0 && kept < embs.count())
    // policy: a vec is dropped iff SOME lower-id cluster-mate is within the
    // ball — check against an independently computed pair list
    val rows = whole.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = rows.map(r => r._1 -> r._2).toMap
    val closePred = Similarity
      .nearDupPairs(embs, "vec_id", "embedding", 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => byId(a) == byId(b) }
      .map(_._2).toSet
    rows.foreach { case (id, _, k) => assert((k == 0L) == closePred.contains(id)) }
  }

  test("materialize=persist strategy is result-identical to localCheckpoint") {
    // the dynamic-allocation escape hatch (full lineage kept, caller
    // unpersists) must be a pure execution-strategy change
    val whole = canon(Similarity.bruteForceTopK(embs, "vec_id", "embedding", 5))
    spark.conf.set("spark.graft.materialize", "persist")
    try {
      val persisted = canon(Similarity.bruteForceTopK(embs, "vec_id", "embedding", 5))
      assert(persisted == whole)
    } finally {
      spark.conf.unset("spark.graft.materialize")
      spark.catalog.clearCache() // the caller-managed unpersist the mode requires
    }
  }

  test("multi-probe LSH: recall vs exact top-1 is at least the single-bucket recall") {
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter("rank = 1").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = top1(Similarity.bruteForceTopK(embs, "vec_id", "embedding", 1))
    val single = top1(Similarity.signLshTopK(embs, "vec_id", "embedding", 1))
    val multi = top1(Similarity.signLshTopKMultiProbe(embs, "vec_id", "embedding", 1))
    def recall(m: Map[Long, Long]) =
      exact.count { case (q, n) => m.get(q).contains(n) }.toDouble / exact.size
    assert(recall(multi) >= recall(single))
    // probing one-flip neighbors must find at least as many queries' top-1
    assert(multi.size >= single.size)
  }
}
