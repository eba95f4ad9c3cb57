package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the large-scale training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket
  * join), SimHash hamming pairs, and n-gram Jaccard.
  *
  * Cross-engine determinism: hashes are md5 hex strings (identical in Spark
  * and DuckDB); MinHash minima are taken lexicographically over the
  * fixed-width hex strings, which equals numeric order. Jaccard ratios are
  * exact-integer divisions.
  *
  * Scale notes (100 TB): everything is shuffle-bounded by (a) distinct
  * tokens per doc (bounded by doc length), (b) candidate pairs AFTER
  * LSH-band/bucket blocking — never the raw doc×doc cross product. The
  * band join is an equi-join on the band signature so it hash-partitions;
  * same-source blocking stands in for the band-bucket partitioning where the
  * verify-scale data would otherwise make every pair a candidate (31-word
  * vocab ⇒ near-total overlap).
  */
object Dedup {

  private val NumHashes = 8

  /** Distinct words per doc — the shingle base for set-similarity ops. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      explode(array_distinct(split(col("text"), " "))).as("w"))

  private val tokensSql =
    "SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents"

  val queries: Seq[GraftQuery] = Seq(

    // Exact dedup: hash-groupBy on raw content; canonical id = min doc_id of
    // the hash group (one shuffle on the 32-char key, not the document body).
    GraftQuery(
      "q_dedup_exact",
      (s, dir) => {
        val keyed = Tables(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("k"))
        val w = Window.partitionBy("k")
        keyed
          .withColumn("canonical_id", min("doc_id").over(w))
          .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
          .select("doc_id", "canonical_id", "is_dup")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  min(doc_id) OVER (PARTITION BY k) AS canonical_id,
             |  doc_id <> min(doc_id) OVER (PARTITION BY k) AS is_dup
             |FROM (SELECT doc_id, md5(text) AS k FROM documents)
             |ORDER BY doc_id""".stripMargin),
    ),

    // MinHash + LSH: 8 hash functions (seeded md5), 2 bands of 4 → candidate
    // pairs from an equi-join on the band signature, then exact Jaccard
    // verification on the candidates only. Top-100 most similar pairs.
    GraftQuery(
      "q_dedup_minhash",
      (s, dir) => {
        val t = tokens(Tables(s, dir, "documents"))
        // 8 hash functions from ONE md5 per token: 4-hex-char digest slices
        // (independent-enough bits, 8× fewer digest computations — the
        // standard one-hash-many-slices sketch trick), aggregated in a
        // single pass by the custom TypedImperativeAggregate (map-side
        // partials shuffle 8 short strings per key, not the token stream)
        graft.functions.MinHashSketch.register(s)
        val sigs = t.groupBy("doc_id", "source").agg(expr("minhash_sketch(w)").as("sig"))
          .withColumn("band0", concat((0 until 4).map(i => col("sig").getItem(i)): _*))
          .withColumn("band1", concat((4 until 8).map(i => col("sig").getItem(i)): _*))
        import s.implicits._
        // candidates: equal band signature within a source shard. The extra
        // source key bounds band-bucket size (this synthetic corpus has a
        // 31-word vocab, so bare band groups degenerate toward all-pairs);
        // at scale this is exactly sharded dedup — band join partitions by
        // (shard, band). Candidates carry the source so verification can
        // co-locate with the per-source token sets.
        def bandPairsSrc(band: String) = sigs.as("a")
          .join(sigs.as("b"),
            col("a.source") === col("b.source") && col(s"a.$band") === col(s"b.$band"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.source").as("source"),
            col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        val cands = bandPairsSrc("band0").union(bandPairsSrc("band1")).distinct()
          .as[(String, Long, Long)]
        // exact Jaccard on candidates: cogroup candidate pairs with the
        // source's token sets and intersect in a kernel (the token
        // equi-join + re-aggregate formulation shuffles |cands|·|tokens|
        // rows; this shuffles each side once)
        val docSets = Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            array_distinct(split(col("text"), " ")).as("ws"))
          .as[(String, Long, Seq[String])]
        cands.groupByKey(_._1)
          .cogroup(docSets.groupByKey(_._1)) { (_, candIt, setIt) =>
            val sets = setIt.map { case (_, id, ws) => id -> ws.toSet }.toMap
            candIt.map { case (_, a, b) =>
              val (ga, gb) = (sets(a), sets(b))
              val inter = if (ga.size <= gb.size) ga.count(gb.contains) else gb.count(ga.contains)
              (a, b, inter.toDouble / (ga.size + gb.size - inter))
            }
          }
          .toDF("doc_a", "doc_b", "jaccard")
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(100)
      },
      Some(s"""WITH t AS ($tokensSql),
              |sigs AS (
              |  SELECT doc_id, source,
              |${(0 until NumHashes).map(i => s"    min(substr(md5(w), ${i * 4 + 1}, 4)) AS h$i").mkString(",\n")}
              |  FROM t GROUP BY doc_id, source
              |),
              |banded AS (
              |  SELECT doc_id, source, h0||h1||h2||h3 AS band0, h4||h5||h6||h7 AS band1 FROM sigs
              |),
              |cands AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM banded a JOIN banded b
              |    ON a.source = b.source AND a.band0 = b.band0 AND a.doc_id < b.doc_id
              |  UNION
              |  SELECT DISTINCT a.doc_id, b.doc_id
              |  FROM banded a JOIN banded b
              |    ON a.source = b.source AND a.band1 = b.band1 AND a.doc_id < b.doc_id
              |),
              |sizes AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS inter
              |  FROM cands c
              |  JOIN t ta ON ta.doc_id = c.doc_a
              |  JOIN t tb ON tb.doc_id = c.doc_b AND tb.w = ta.w
              |  GROUP BY c.doc_a, c.doc_b
              |)
              |SELECT i.doc_a, i.doc_b,
              |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
              |FROM inter i
              |JOIN sizes sa ON sa.doc_id = i.doc_a
              |JOIN sizes sb ON sb.doc_id = i.doc_b
              |ORDER BY jaccard DESC, i.doc_a, i.doc_b LIMIT 100""".stripMargin),
    ),

    // SimHash: 16-bit signature from per-word md5 nibble high-bits; near-dup
    // pairs = hamming(sig_a, sig_b) <= 3 within a source block (xor +
    // bit_count). At 100 TB the block is the LSH band partition; here the
    // source column provides equivalent blocking.
    GraftQuery(
      "q_dedup_simhash",
      (s, dir) => {
        // one md5 per token, hoisted out of the 16 vote aggregates; one
        // aggregation pass with a vote column per bit (16 aggs) instead of a
        // 16× row explosion — same shuffle key, 1/16th the shuffled rows
        val t = tokens(Tables(s, dir, "documents"))
          .withColumn("h", md5(col("w")))
        val voteAggs = (0 until 16).map { j =>
          sum(when(expr(s"substring(h, ${j + 1}, 1)")
            .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as(s"v$j")
        }
        val bitSum = (0 until 16).map { j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        val sigs = t.groupBy("doc_id", "source").agg(voteAggs.head, voteAggs.tail: _*)
          .withColumn("simhash", bitSum)
          .select("doc_id", "source", "simhash")
        sigs.as("a").join(sigs.as("b"),
            col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
          .withColumn("hamming", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
          .filter(col("hamming") <= 3)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.simhash").as("sim_a"), col("hamming"))
          .orderBy("hamming", "doc_a", "doc_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, source, md5(w) AS h FROM ($tokensSql)),
              |votes AS (
              |  SELECT doc_id, source,
              |${(0 until 16).map(j => s"    sum(CASE WHEN substr(h, ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$j").mkString(",\n")}
              |  FROM t GROUP BY doc_id, source
              |),
              |sigs AS (
              |  SELECT doc_id, source,
              |    ${(0 until 16).map(j => s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")} AS simhash
              |  FROM votes
              |)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sim_a,
              |  bit_count(xor(a.simhash, b.simhash)) AS hamming
              |FROM sigs a JOIN sigs b
              |  ON a.source = b.source AND a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
              |ORDER BY hamming, doc_a, doc_b""".stripMargin),
    ),

    // Fuzzy matching: Levenshtein edit distance on a fixed-length prefix,
    // blocked on (source, length bucket) — similar-length candidates only,
    // the standard fuzzy-match blocking (strings differing in length by L
    // have distance >= L anyway). Prefix cap bounds the O(len²) DP per
    // pair; without the length blocking this is 622k pairs (20s) at sf0.1,
    // with it ~60k.
    GraftQuery(
      "q_edit_distance",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), expr("n_chars div 50").as("lenb"),
            substring(col("text"), 1, 60).as("head"))
        d.as("a").join(d.as("b"),
            col("a.source") === col("b.source") && col("a.lenb") === col("b.lenb") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            levenshtein(col("a.head"), col("b.head")).as("dist"))
          .orderBy(col("dist"), col("doc_a"), col("doc_b"))
          .limit(100)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source, n_chars // 50 AS lenb,
             |    substr(text, 1, 60) AS head
             |  FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  levenshtein(a.head, b.head) AS dist
             |FROM d a JOIN d b
             |  ON a.source = b.source AND a.lenb = b.lenb AND a.doc_id < b.doc_id
             |ORDER BY dist, doc_a, doc_b LIMIT 100""".stripMargin),
    ),

    // n-gram (word-bigram) Jaccard near-dup within source blocks; top 100.
    // Physical strategy: one shuffle on the block key, then a per-block
    // set-intersection kernel — the explode + token self-join formulation
    // shuffles |docs|·|grams| rows and re-aggregates, ~4× slower here and
    // strictly worse at scale (the block kernel touches each doc's gram set
    // once; oversized blocks would be sub-tiled the same way).
    GraftQuery(
      "q_ngram_jaccard",
      (s, dir) => {
        import s.implicits._
        val grams = Tables(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .select(col("doc_id"), col("source"),
            array_distinct(expr(
              "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )).as("gs"))
          .as[(Long, String, Seq[String])]
        grams.groupByKey(_._2)
          .flatMapGroups { (_, it) =>
            val docs = it.map { case (id, _, gs) => (id, gs.toSet) }.toArray.sortBy(_._1)
            for {
              i <- docs.indices.iterator
              j <- Iterator.range(i + 1, docs.length)
            } yield {
              val (a, ga) = docs(i)
              val (b, gb) = docs(j)
              val inter = if (ga.size <= gb.size) ga.count(gb.contains) else gb.count(ga.contains)
              (a, b, inter.toDouble / (ga.size + gb.size - inter))
            }
          }
          .toDF("doc_a", "doc_b", "jaccard")
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(100)
      },
      Some("""WITH g AS (
             |  SELECT doc_id, source, unnest(gs) AS g FROM (
             |    SELECT doc_id, source,
             |      list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS gs
             |    FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents)
             |  )
             |),
             |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
             |inter AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
             |  FROM g a JOIN g b
             |    ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id
             |)
             |SELECT i.doc_a, i.doc_b,
             |  CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.doc_a
             |JOIN sizes sb ON sb.doc_id = i.doc_b
             |ORDER BY jaccard DESC, i.doc_a, i.doc_b LIMIT 100""".stripMargin),
    ),
  )
}
