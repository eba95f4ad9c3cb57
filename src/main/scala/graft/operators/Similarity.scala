package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Public DataFrame-level API ([[bruteForceTopK]], [[bucketedTopK]],
  * [[signLshTopK]], [[nearDupPairs]]) over any (id, vector[, bucket]) frame;
  * the verify queries below delegate to it against the `embeddings` fixture.
  *
  * Embeddings are quantized to integers (×1000, round-half-up — the int16
  * quantization standard for ANN at scale): dot products and norms become
  * exact integer arithmetic, so results are bit-identical across engines and
  * partitionings (a float dot product would differ in the low bits by
  * summation order). Cosine is then derived in double from the exact
  * integers.
  *
  * Scale notes (100 TB): brute-force broadcasts the corpus matrix and scans
  * the query side with a primitive kernel (no pair materialization — at
  * scale the corpus is broadcast in blocks). The bucketed variants shuffle
  * each vector exactly once on the bucket id (a precomputed coarse-quantizer
  * cell for IVF, sign bits of hyperplane dots for LSH) and run the same
  * kernel per bucket.
  */
object Similarity {

  /** transform(vec, x -> round-half-up(x*1000) as bigint) */
  private def quantized(vecCol: String): Column =
    transform(col(vecCol), x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long"))

  private val quantizedSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"

  /** Exact integer dot product of two quantized vector columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Quantize + norm: (idCol, vecCol, ...) → (__id, q, nrm[, __bucket]). */
  private def prepare(df: DataFrame, idCol: String, vecCol: String,
      bucketCol: Option[String] = None): DataFrame = {
    val base = df
      .withColumn("q", quantized(vecCol))
      .withColumn("nrm", dot(col("q"), col("q")))
      .withColumn("__id", col(idCol).cast("long"))
    bucketCol match {
      case Some(b) => base.select(col("__id"), col("q"), col("nrm"), col(b).cast("long").as("__bucket"))
      case None => base.select("__id", "q", "nrm")
    }
  }

  private def collectCorpus(p: DataFrame): Array[(Long, Long, Array[Long])] =
    p.select("__id", "nrm", "q").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray)
    }.sortBy(_._1)

  /** Tight-loop top-k kernel over primitive arrays: for one query vector,
    * scan a corpus slice and keep the best `k` by (cos desc, neighbor_id
    * asc). Exact integer dots; shared by all variants.
    */
  private[operators] def topKScan(
      qid: Long, qn: Long, qv: Array[Long],
      corpus: Array[(Long, Long, Array[Long])],
      k: Int,
  ): Seq[(Long, Long, Int, Double)] = {
    val top = new Array[(Long, Double)](k)
    var filled = 0
    var i = 0
    while (i < corpus.length) {
      val (nid, nn, nv) = corpus(i)
      if (nid != qid) {
        var dot = 0L
        var j = 0
        while (j < qv.length) { dot += qv(j) * nv(j); j += 1 }
        val cos = dot.toDouble / (math.sqrt(qn.toDouble) * math.sqrt(nn.toDouble))
        var pos = filled
        while (pos > 0 && {
          val (pid, pcos) = top(pos - 1)
          pcos < cos || (pcos == cos && pid > nid)
        }) pos -= 1
        if (pos < k) {
          var m = math.min(filled, k - 1)
          while (m > pos) { top(m) = top(m - 1); m -= 1 }
          top(pos) = (nid, cos)
          if (filled < k) filled += 1
        }
      }
      i += 1
    }
    (0 until filled).map { r =>
      (qid, top(r)._1, r + 1, math.floor(top(r)._2 * 1e6 + 0.5) / 1e6)
    }
  }

  /** Brute-force exact cosine top-k per vector: broadcast corpus + kernel
    * scan. Output: (query_id, neighbor_id, rank, cos).
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val p = prepare(df, idCol, vecCol)
    val bc = s.sparkContext.broadcast(collectCorpus(p))
    // spread the query-side scan: the O(|queries|·|corpus|·dim) kernel must
    // not inherit the file scan's partitioning (one task on a one-file input)
    p.repartition(s.sparkContext.defaultParallelism).as[(Long, Array[Long], Long)]
      .flatMap { case (qid, qv, qn) => topKScan(qid, qn, qv, bc.value, k) }
      .toDF("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  /** IVF-style top-k within precomputed coarse buckets: one shuffle on the
    * bucket id, kernel per bucket.
    */
  def bucketedTopK(df: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, k: Int): DataFrame =
    topKPerBucket(prepare(df, idCol, vecCol, Some(bucketCol))
      .select("__bucket", "__id", "nrm", "q"), k)

  /** Shared bucket kernel: one shuffle on the bucket id, top-k scan within
    * each bucket. Input columns: (__bucket, __id, nrm, q).
    */
  private def topKPerBucket(prepared: DataFrame, k: Int): DataFrame = {
    val s = prepared.sparkSession
    import s.implicits._
    prepared.as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val b = it.map { case (_, id, n, q) => (id, n, q) }.toArray.sortBy(_._1)
        b.iterator.flatMap { case (qid, qn, qv) => topKScan(qid, qn, qv, b, k) }
      }
      .toDF("query_id", "neighbor_id", "rank", "cos")
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: integer weights
    * in [-3, 3] from a fixed mixing formula, materialized as array literals
    * on both engines so the bucket assignment is exact integer math.
    */
  private val NumPlanes = 8
  private val Dim = 64
  private def planeWeight(p: Int, d: Int): Int = ((p * 131 + d * 37 + 17) % 7) - 3
  private def planeArray(p: Int): Column =
    array((0 until Dim).map(d => lit(planeWeight(p, d).toLong)): _*)
  private def planeSqlList(p: Int): String =
    (0 until Dim).map(d => planeWeight(p, d).toString).mkString("[", ", ", "]")

  /** Sign-LSH bucket id column for a quantized vector column. */
  def lshBucket(q: Column): Column =
    (0 until NumPlanes).map { pl =>
      when(dot(q, planeArray(pl)) > 0, lit(1L << pl)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-LSH top-k: bucket by hyperplane sign bits, kernel per bucket.
    *
    * The bucket bits are computed in one primitive pass over the quantized
    * vector rather than via [[lshBucket]]'s 8 column-level `aggregate`
    * lambdas — higher-order functions are interpreted per element, which is
    * 8·dim interpreted evals per row in the hot path; the integer math (and
    * thus the bucket id and every result) is identical, including for
    * vectors whose length differs from Dim: there `lshBucket`'s zip_with
    * pads with nulls, the dot is null, no `when` fires, and the bucket is
    * 0 — the kernel short-circuits to bucket 0 for the same inputs rather
    * than computing a partial dot over the shared prefix.
    */
  def signLshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val planes: Array[Array[Long]] =
      Array.tabulate(NumPlanes, Dim)((p, d) => planeWeight(p, d).toLong)
    val prepared = prepare(df, idCol, vecCol)
      .as[(Long, Array[Long], Long)]
      .map { case (id, q, nrm) =>
        var bucket = 0L
        if (q.length == Dim) {
          var pl = 0
          while (pl < NumPlanes) {
            val w = planes(pl)
            var dot = 0L
            var d = 0
            while (d < Dim) { dot += q(d) * w(d); d += 1 }
            if (dot > 0) bucket |= 1L << pl
            pl += 1
          }
        }
        (bucket, id, nrm, q)
      }
      .toDF("__bucket", "__id", "nrm", "q")
    topKPerBucket(prepared, k)
  }

  /** Embedding-cosine near-dup pairs (unordered, each computed once):
    * all pairs with cosine >= threshold. Output: (vec_a, vec_b, cos).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val p = prepare(df, idCol, vecCol)
    val bc = s.sparkContext.broadcast(collectCorpus(p))
    p.repartition(s.sparkContext.defaultParallelism).as[(Long, Array[Long], Long)]
      .flatMap { case (qid, qv, qn) =>
        val all = bc.value
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < all.length) {
          val (nid, nn, nv) = all(i)
          if (nid > qid) {
            var dot = 0L
            var j = 0
            while (j < qv.length) { dot += qv(j) * nv(j); j += 1 }
            val cos = dot.toDouble / (math.sqrt(qn.toDouble) * math.sqrt(nn.toDouble))
            if (cos >= threshold)
              out += ((qid, nid, math.floor(cos * 1e6 + 0.5) / 1e6))
          }
          i += 1
        }
        out
      }
      .toDF("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  // ---- verify queries ------------------------------------------------------

  // DuckDB list_dot_product returns double — exact here because every term
  // and partial sum of the quantized values stays far below 2^53.
  private def oracleFor(joinCond: String): String =
    s"""WITH prep AS (
       |  SELECT vec_id, label, $quantizedSql AS q FROM embeddings
       |),
       |normed AS (
       |  SELECT vec_id, label, q, list_dot_product(q, q) AS nrm FROM prep
       |),
       |pairs AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    list_dot_product(a.q, b.q) / (sqrt(a.nrm) * sqrt(b.nrm)) AS cos
       |  FROM normed a JOIN normed b ON $joinCond
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM pairs
       |)
       |SELECT query_id, neighbor_id, rank, floor(cos * 1e6 + 0.5) / 1e6 AS cos
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    // Brute-force cosine top-3 per vector — the ANN correctness baseline.
    GraftQuery(
      "q_similarity_cosine",
      (s, dir) => bruteForceTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding", 3),
      Some(oracleFor("a.vec_id <> b.vec_id")),
    ),

    // IVF-style bucketed variant using the label column as the coarse cell.
    GraftQuery(
      "q_similarity_bucketed",
      (s, dir) => bucketedTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding", "label", 3),
      Some(oracleFor("a.label = b.label AND a.vec_id <> b.vec_id")),
    ),

    // Sign-LSH bucketed variant: 8 integer hyperplanes → sign-bit bucket.
    GraftQuery(
      "q_similarity_lsh",
      (s, dir) => signLshTopK(Tables(s, dir, "embeddings"), "vec_id", "embedding", 3),
      Some(s"""WITH prep AS (
              |  SELECT vec_id, $quantizedSql AS q FROM embeddings
              |),
              |normed AS (
              |  SELECT vec_id, q, list_dot_product(q, q) AS nrm,
              |${(0 until NumPlanes).map(pl => s"    (CASE WHEN list_dot_product(q, ${planeSqlList(pl)}) > 0 THEN ${1L << pl} ELSE 0 END)").mkString(" +\n")}
              |    AS bucket
              |  FROM prep
              |),
              |pairs AS (
              |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
              |    list_dot_product(a.q, b.q) / (sqrt(a.nrm) * sqrt(b.nrm)) AS cos
              |  FROM normed a JOIN normed b
              |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
              |),
              |ranked AS (
              |  SELECT query_id, neighbor_id, cos,
              |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              |  FROM pairs
              |)
              |SELECT query_id, neighbor_id, rank, floor(cos * 1e6 + 0.5) / 1e6 AS cos
              |FROM ranked WHERE rank <= 3
              |ORDER BY query_id, rank""".stripMargin),
    ),

    // Embedding-cosine near-dup: threshold 0.4 ≈ the far tail of this
    // corpus's cosine distribution (max ≈ 0.51); production near-dup sits
    // at 0.9+ with LSH/IVF blocking ahead of the scan.
    GraftQuery(
      "q_dedup_embedding",
      (s, dir) => nearDupPairs(Tables(s, dir, "embeddings"), "vec_id", "embedding", 0.4),
      Some(s"""WITH prep AS (
              |  SELECT vec_id, $quantizedSql AS q FROM embeddings
              |),
              |normed AS (
              |  SELECT vec_id, q, list_dot_product(q, q) AS nrm FROM prep
              |)
              |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |  floor(list_dot_product(a.q, b.q) / (sqrt(a.nrm) * sqrt(b.nrm)) * 1e6 + 0.5) / 1e6 AS cos
              |FROM normed a JOIN normed b ON a.vec_id < b.vec_id
              |WHERE list_dot_product(a.q, b.q) / (sqrt(a.nrm) * sqrt(b.nrm)) >= 0.4
              |ORDER BY vec_a, vec_b""".stripMargin),
    ),
  )
}
