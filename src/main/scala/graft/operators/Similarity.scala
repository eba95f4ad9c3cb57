package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (`Array[Float]`, 64-dim).
  *
  * Embeddings are quantized to integers (×1000, round-half-up — the int16
  * quantization standard for ANN at scale): dot products and norms become
  * exact integer arithmetic, so results are bit-identical across engines and
  * partitionings (a float dot product would differ in the low bits by
  * summation order). Cosine is then derived in double from the exact
  * integers.
  *
  * Scale notes (100 TB): brute-force is the correctness baseline — O(n²)
  * pairs is fine at verify scale and intentionally capped there. The scale
  * path is the bucketed (IVF-style) variant: an equi-join on the coarse
  * cluster id (here the `label` column as the pre-computed coarse quantizer)
  * cuts candidates by the bucket count and hash-partitions cleanly; the
  * top-k window then runs per-bucket. Swap `label` for any learned/LSH
  * bucket id without touching the plan shape.
  */
object Similarity {

  /** transform(embedding, x -> round-half-up(x*1000) as bigint) */
  private def quantized: Column =
    transform(col("embedding"), x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long"))

  private val quantizedSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"

  /** Exact integer dot product of two quantized vectors. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def cosExpr: Column =
    (dot(col("a.q"), col("b.q")).cast("double") /
      (sqrt(col("a.nrm").cast("double")) * sqrt(col("b.nrm").cast("double"))))

  private def prepared(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .withColumn("q", quantized)
      .withColumn("nrm", dot(col("q"), col("q")))
      .select("vec_id", "label", "q", "nrm")

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

  /** Tight-loop top-k kernel over primitive arrays: for one query vector,
    * scan a corpus slice and keep the best `k` by (cos desc, neighbor_id
    * asc). Exact integer dots; shared by the broadcast brute-force and the
    * per-bucket variants.
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

  private def topK(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (floor(col("cos") * lit(1e6) + lit(0.5)) / lit(1e6)).as("cos"))
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

  val queries: Seq[GraftQuery] = Seq(

    // Sign-LSH bucketed ANN — the second scale path (vs the IVF/label one):
    // bucket = sign bits of 8 hyperplane dots (exact integer math on the
    // quantized vectors), candidates restricted to the same bucket, top-3
    // by cosine within the bucket. One shuffle on the bucket id; recall
    // trades off against bucket count exactly as in production sign-LSH.
    GraftQuery(
      "q_similarity_lsh",
      (s, dir) => {
        val p = prepared(s, dir)
        val bucket = (0 until NumPlanes).map { pl =>
          when(dot(col("q"), planeArray(pl)) > 0, lit(1L << pl)).otherwise(lit(0L))
        }.reduce(_ + _)
        val bucketed = p.withColumn("bucket", bucket)
        import s.implicits._
        bucketed.select("bucket", "vec_id", "nrm", "q").as[(Long, Long, Long, Array[Long])]
          .groupByKey(_._1)
          .flatMapGroups { (_, it) =>
            val b = it.map { case (_, id, n, q) => (id, n, q) }.toArray.sortBy(_._1)
            b.iterator.flatMap { case (qid, qn, qv) => topKScan(qid, qn, qv, b, 3) }
          }
          .toDF("query_id", "neighbor_id", "rank", "cos")
          .orderBy("query_id", "rank")
      },
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

    // Brute-force cosine top-3 per vector — the ANN correctness baseline.
    // Physical strategy: broadcast the (small) corpus matrix and scan the
    // query side with a primitive-array kernel — the MLlib-style design for
    // dense brute-force KNN. No pair materialization, no shuffle of pairs:
    // a crossJoin + zip_with formulation is ~50× slower because Catalyst
    // evaluates higher-order lambdas interpreted, per pair. At 100 TB the
    // same shape holds with the query set broadcast in blocks.
    GraftQuery(
      "q_similarity_cosine",
      (s, dir) => {
        val p = prepared(s, dir)
        val corpus = p.select("vec_id", "nrm", "q").collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray)
        }.sortBy(_._1)
        val bc = s.sparkContext.broadcast(corpus)
        import s.implicits._
        p.select("vec_id", "nrm", "q").as[(Long, Long, Array[Long])]
          .flatMap { case (qid, qn, qv) => topKScan(qid, qn, qv, bc.value, 3) }
          .toDF("query_id", "neighbor_id", "rank", "cos")
          .orderBy("query_id", "rank")
      },
      Some(oracleFor("a.vec_id <> b.vec_id")),
    ),

    // Embedding-cosine near-dup (the dedup-by-embedding variant): all pairs
    // above a similarity threshold, via the same broadcast-corpus kernel
    // scanning only ids greater than the query id (each unordered pair
    // computed once). Threshold 0.4 ≈ the far tail of this corpus's cosine
    // distribution (max ≈ 0.51); production near-dup would sit at 0.9+ with
    // LSH/IVF blocking ahead of the scan.
    GraftQuery(
      "q_dedup_embedding",
      (s, dir) => {
        val p = prepared(s, dir)
        val corpus = p.select("vec_id", "nrm", "q").collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray)
        }.sortBy(_._1)
        val bc = s.sparkContext.broadcast(corpus)
        import s.implicits._
        p.select("vec_id", "nrm", "q").as[(Long, Long, Array[Long])]
          .flatMap { case (qid, qn, qv) =>
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
                if (cos >= 0.4)
                  out += ((qid, nid, math.floor(cos * 1e6 + 0.5) / 1e6))
              }
              i += 1
            }
            out
          }
          .toDF("vec_a", "vec_b", "cos")
          .orderBy("vec_a", "vec_b")
      },
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

    // IVF-style bucketed variant — the 100 TB scale path: shuffle once on
    // the coarse bucket id (here `label`, standing in for a learned/LSH
    // coarse quantizer), then run the same top-k kernel within each bucket.
    // Candidates drop by the bucket count and the shuffle moves each vector
    // exactly once; buckets too large for one task would be sub-blocked the
    // same way.
    GraftQuery(
      "q_similarity_bucketed",
      (s, dir) => {
        import s.implicits._
        val p = prepared(s, dir)
        p.select("label", "vec_id", "nrm", "q").as[(Int, Long, Long, Array[Long])]
          .groupByKey(_._1)
          .flatMapGroups { (_, it) =>
            val bucket = it.map { case (_, id, n, q) => (id, n, q) }.toArray.sortBy(_._1)
            bucket.iterator.flatMap { case (qid, qn, qv) => topKScan(qid, qn, qv, bucket, 3) }
          }
          .toDF("query_id", "neighbor_id", "rank", "cos")
          .orderBy("query_id", "rank")
      },
      Some(oracleFor("a.label = b.label AND a.vec_id <> b.vec_id")),
    ),
  )
}
