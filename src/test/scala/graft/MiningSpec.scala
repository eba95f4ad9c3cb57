package graft

import graft.operators.Mining

/** Market-basket mining: hand-computed goldens for frequent pairs,
  * association-rule confidence/lift micros, and item-kNN ranking, via the
  * registered queries over a synthetic parquet fixture (the queries read
  * tables by name, so the fixture is written as a lineitem parquet).
  */
class MiningSpec extends SparkSuite {

  /** Writes a minimal lineitem table holding the given (order, part)
    * pairs and returns the dir. Only the two key columns matter to the
    * Mining queries, but Tables() reads the real schema — so the fixture
    * carries every column the loader touches.
    */
  private def fixture(pairs: Seq[(Long, Long)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mining").toString
    pairs.zipWithIndex.map { case ((o, p), i) =>
      (o, p, 1L, i + 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  // baskets: o1 = {1,2,3}, o2 = {1,2}, o3 = {1,2,4}, o4 = {3,4}
  // item supports: 1→3, 2→3, 3→2, 4→2
  // pair supports: (1,2)→3, (1,3)→1, (2,3)→1, (1,4)→1, (2,4)→1, (3,4)→1
  // → only (1,2) is frequent at MinSup=2
  private val basketPairs = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 4L),
    (4L, 3L), (4L, 4L))

  test("freq_itemsets golden: only the thrice-co-bought pair survives MinSup=2") {
    val dir = fixture(basketPairs)
    val got = SparkEntry.queries("q_freq_itemsets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L)))
  }

  test("assoc_rules golden: confidence and lift micros are exact integers") {
    val dir = fixture(basketPairs)
    val got = SparkEntry.queries("q_assoc_rules")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // N = 4 baskets. conf(1→2) = 3/3 = 1e6; conf(2→1) = 3/3 = 1e6;
    // lift both ways = 3·4/(3·3) = 4/3 → 1333333 (floor)
    assert(got == Seq(
      (1L, 2L, 3L, 1000000L, 1333333L),
      (2L, 1L, 3L, 1000000L, 1333333L)))
  }

  test("item_knn golden: squared-cosine picos and deterministic tie-break") {
    // o1..o3 = {1,2}; o4 = {1,3}; o5 = {1,3}; o6 = {2,3}; o7 = {2,3}
    // supports: 1→5, 2→5, 3→4; pairs: (1,2)→3, (1,3)→2, (2,3)→2
    // cos²(1,2) = 9/25 → 360000000000; cos²(1,3) = 4/20 → 200000000000;
    // cos²(2,3) = 4/20 → 200000000000
    val dir = fixture(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L), (5L, 1L), (5L, 3L),
      (6L, 2L), (6L, 3L), (7L, 2L), (7L, 3L)))
    val got = SparkEntry.queries("q_item_knn")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 360000000000L, 1), (1L, 3L, 200000000000L, 2),
      (2L, 1L, 360000000000L, 1), (2L, 3L, 200000000000L, 2),
      // item 3's two neighbors tie at 2e11 → order by neighbor id
      (3L, 1L, 200000000000L, 1), (3L, 2L, 200000000000L, 2)))
  }

  test("apriori prune is result-invisible: unpruned brute force agrees") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    val pairs = Seq.fill(400)((rnd.nextInt(40).toLong + 1, rnd.nextInt(25).toLong + 1)).distinct
    val dir = fixture(pairs)
    val got = SparkEntry.queries("q_freq_itemsets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force without the item-frequency prune
    val byOrder = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val counts = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    byOrder.values.foreach { items =>
      for (a <- items; b <- items if a < b)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
    }
    val want = counts.filter(_._2 >= Mining.MinSup)
      .map { case ((a, b), c) => (a, b, c) }.toSet
    assert(got == want)
  }
}
