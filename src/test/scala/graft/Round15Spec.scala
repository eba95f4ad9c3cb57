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

  test("interval coverage golden: overlap merges, gap splits, zero-length inert") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("iv").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: [0,10] ∪ [5,15] merge → 15 s; [100,101] separate island
    // user 2: [0,0] zero-length (value < 1 floors to 0) → island of 0 us
    Seq(
      (1L, ts(0), 1L, "a", 10.9, "{}"),
      (2L, ts(5), 1L, "a", 10.0, "{}"),
      (3L, ts(100), 1L, "a", 1.0, "{}"),
      (4L, ts(0), 2L, "a", 0.7, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("q_interval_coverage")(s, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 16000000L, 2L), (2L, 0L, 1L)))
  }

  test("critical path golden: the heaviest chain wins, not the longest") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cpth").toString
    // baskets shaped so the co-purchase DAG (a<b, w = shared parts >= 3)
    // is 1→2 (w=3), 2→4 (w=4), 1→3 (w=5): crit(4) = 3+4 = 7 via the
    // 2-edge chain, crit(3) = 5 via the single heavy edge
    def basket(oid: Long, cust: Long, parts: Seq[Long]) =
      parts.map(p => (oid, p, cust))
    val rows =
      basket(1, 1, Seq(101, 102, 103, 201, 202, 203, 204, 205)) ++
      basket(2, 2, Seq(101, 102, 103, 301, 302, 303, 304)) ++
      basket(3, 3, Seq(201, 202, 203, 204, 205)) ++
      basket(4, 4, Seq(301, 302, 303, 304))
    rows.map { case (o, p, c) => (o, p, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    rows.map(_._1).distinct.map(o => (o, o, "F", 1.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = SparkEntry.queries("q_critical_path")(s, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 3L, 3L -> 5L, 4L -> 7L))
  }

  test("naive bayes on the fixture: one prediction per doc, scores negative") {
    val got = SparkEntry.queries("q_naive_bayes")(spark, dir).collect()
    val nDocs = Tables(spark, dir, "documents").count()
    assert(got.length == nDocs)
    assert(got.forall(_.getLong(2) < 0L), "log-likelihood micros must be negative")
  }
}
