package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** k-core peel and local clustering coefficient: hand-computed golden
  * cases, a serial-reference equivalence on a randomized graph, hygiene
  * (self-loops, duplicates, nulls), and the q_kcore oracle-unroll safety
  * margin (the DuckDB oracle unrolls a FIXED number of peel rounds, so the
  * fixture's convergence depth must sit under it).
  */
class GraphOpsSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  /** Serial reference: peel to the k-core, returning (members with core
    * degree, rounds-to-fixpoint including the confirming round).
    */
  private def serialKCore(es: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int) = {
    var edges = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var rounds = 0
    var done = edges.isEmpty
    while (!done) {
      val deg = edges.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter { case (a, b) => keep(a) && keep(b) }
      rounds += 1
      done = next.size == edges.size
      edges = next
    }
    val coreDeg = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    (coreDeg, rounds)
  }

  test("k-core golden: K4 with a chain tail — tail peels, clique survives") {
    // K4 on 1-4, tail 4-5-6-7: 3-core = K4 exactly; the whole tail is
    // sub-k from the start, so it peels in one round (the multi-round
    // CASCADE case is the k=2 path test below)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val es = k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = Graph.kCore(edgeDf(es), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val (ref, rounds) = serialKCore(es, 3)
    assert(ref == got && rounds == 2, s"rounds=$rounds")
  }

  test("k-core of a path at k=2 is empty (peels one layer per round)") {
    val es = (1L until 12L).map(i => (i, i + 1))
    assert(Graph.kCore(edgeDf(es), 2).count() == 0L)
    assert(serialKCore(es, 2)._1.isEmpty)
  }

  test("k-core hygiene: self-loops, duplicate and reversed edges, nulls") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), // one undirected edge, three spellings
      (2L, 3L), (3L, 1L),           // closes the triangle
      (1L, 1L),                     // self-loop: dropped
      (null, 5L), (5L, null),       // nulls: dropped
    ).toDF("src", "dst")
    val got = Graph.kCore(df, 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k-core: randomized serial equivalence, three seeds, both strategies") {
    // localCutoff = 0 forces the all-distributed blocked peel; the default
    // takes the single-task endgame — both must equal the serial reference
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(160)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      for (k <- Seq(2, 3, 4)) {
        val ref = serialKCore(es, k)._1
        val local = Graph.kCore(edgeDf(es), k).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(local == ref, s"seed=$seed k=$k (local endgame)")
        val dist = Graph.kCore(edgeDf(es), k, localCutoff = 0L).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(dist == ref, s"seed=$seed k=$k (distributed)")
      }
    }
  }

  test("k-core: distributed blocked peel converges on a deep cascade (caterpillar)") {
    // a 2-regular path peels one layer per END per round — a long cascade
    // that exercises MANY blocks of the distributed loop (the fixtures
    // above fall under the local-endgame cutoff after round 0, so this
    // pins the block loop's fixpoint logic specifically)
    val es = (1L until 30L).map(i => (i, i + 1))
    assert(Graph.kCore(edgeDf(es), 2, localCutoff = 0L).count() == 0L)
    // and a cycle (its own 2-core) survives the same deep-block path
    val cyc = es ++ Seq((30L, 1L))
    val got = Graph.kCore(edgeDf(cyc), 2, localCutoff = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 30L).map(_ -> 2L).toMap)
  }

  test("q_kcore oracle unroll covers the fixture's peel depth with margin") {
    // the DuckDB oracle unrolls KcoreOracleRounds peel rounds; the driver
    // verifies at sf0.01 (probed depth 2) and the battery at sf0.001 —
    // compute the sf0.001 depth with the serial reference on the REAL
    // copurchase edges and require honest headroom (sf0.1's deepest probed
    // cascade was 23; the unroll is 32)
    val cp = Tables(spark, sf("sf0.001"), "orders")
      .join(Tables(spark, sf("sf0.001"), "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
    val es = Graph.copurchaseEdges(cp.localCheckpoint(false), minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (ref, rounds) = serialKCore(es, 3)
    assert(rounds + 8 <= 32, s"sf0.001 peel depth $rounds too close to the unroll")
    // and the distributed result matches the reference on the same edges
    val got = Graph.kCore(edgeDf(es), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("clustering coefficient golden: K4 + pendant") {
    // K4 on 1-4 plus pendant 5 attached to node 1
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = Graph.clusteringCoefficient(edgeDf(k4 ++ Seq((1L, 5L)))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // node 1: deg 4, tri 3 → 2e6·3/12 = 500000; nodes 2-4: deg 3, tri 3
    // → 2e6·3/6 = 1000000; pendant: deg 1 → 0 by convention
    assert(got(1L) == ((4L, 3L, 500000L)))
    for (n <- 2L to 4L) assert(got(n) == ((3L, 3L, 1000000L)), s"node $n")
    assert(got(5L) == ((1L, 0L, 0L)))
  }

  test("clustering coefficient: triangle-free graph is all zero") {
    val star = (2L to 6L).map(i => (1L, i))
    val got = Graph.clusteringCoefficient(edgeDf(star)).collect()
    assert(got.length == 6 && got.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("clustering coefficient agrees with triangles() and the formula") {
    val rnd = new scala.util.Random(5)
    val es = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val cc = Graph.clusteringCoefficient(edgeDf(es)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tri = Graph.triangles(edgeDf(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(cc.nonEmpty)
    cc.foreach { case (n, d, t, c) =>
      assert(d == deg(n) && t == tri(n), s"node $n")
      val want = if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L
      assert(c == want, s"node $n coef")
    }
  }
}
