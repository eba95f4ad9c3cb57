package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Strongly connected components and bounded-round weighted shortest
  * paths: definition-based serial references (mutual-reachability SCC,
  * full-relaxation Bellman-Ford), BOTH execution strategies on every
  * scenario (single-task endgame vs forced-distributed coloring/frontier
  * rounds), and the shared edge hygiene (self-loops, duplicates,
  * direction matters).
  */
class SccSsspSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  private def wEdgeDf(es: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst", "w")
  }

  private def seedDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.toDF("id")
  }

  /** SCC from the definition: reach sets per node (BFS), scc_id = min
    * mutually-reachable node — the same contract the DuckDB closure
    * oracle checks at fixture scale.
    */
  private def serialScc(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = es.filter(x => x._1 != x._2).distinct
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val adj = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def reach(s: Long): Set[Long] = {
      val seen = scala.collection.mutable.HashSet(s)
      var fr: Seq[Long] = Seq(s)
      while (fr.nonEmpty)
        fr = fr.flatMap(u => adj.getOrElse(u, Nil)).filter(seen.add)
      seen.toSet
    }
    val r = nodes.map(n => n -> reach(n)).toMap
    nodes.map(v => v -> (r(v).filter(u => r(u).contains(v)) + v).min).toMap
  }

  /** Runs BOTH strategies (Tarjan endgame and forced-distributed
    * coloring rounds) and asserts agreement.
    */
  private def sccMap(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val local = Graph.scc(edgeDf(es)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.scc(edgeDf(es).repartition(7), localCutoff = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "Tarjan endgame diverged from distributed coloring rounds")
    local
  }

  test("scc golden: two cycles joined by a one-way bridge stay separate") {
    // 1→2→3→1 and 10→11→10, bridged 3→10: mutual reachability never
    // crosses the bridge
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L), (3L, 10L))
    assert(sccMap(es) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("scc: a DAG is all singletons (trim/coloring must not merge)") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L), (5L, 4L))
    assert(sccMap(es) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("scc: direction matters — the undirected-connected pair is not an SCC") {
    val es = Seq((1L, 2L), (3L, 2L))
    assert(sccMap(es) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("scc matches the mutual-reachability definition on random digraphs") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val es = Seq.fill(120 + trial * 40)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(x => x._1 != x._2)
      assert(sccMap(es) == serialScc(es), s"trial $trial")
    }
  }

  test("scc hygiene: self-loops and duplicate edges are inert") {
    val es = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L))
    assert(sccMap(es) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("scc: functional graph (hash successors) — cycle cores found exactly") {
    // the q_scc shape in miniature: node → 1 + (node*7 + 3) mod 20
    val es = (1L to 20L).flatMap(v =>
      Seq((v, 1 + (v * 7 + 3) % 20), (v, 1 + (v * 13 + 5) % 20)))
    assert(sccMap(es) == serialScc(es))
  }

  /** Full-relaxation Bellman-Ford, k synchronous rounds — the textbook
    * form the oracle unrolls; the operator's frontier optimization must
    * match it exactly.
    */
  private def serialSssp(seeds: Seq[Long], es: Seq[(Long, Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val e = es.filter(x => x._1 != x._2 && x._3 >= 0)
      .groupBy(x => (x._1, x._2)).map { case ((s, d), xs) => (s, d, xs.map(_._3).min) }
    var dist: Map[Long, Long] = seeds.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val cand = e.toSeq.flatMap { case (s, d, w) => dist.get(s).map(x => d -> (x + w)) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      dist = (dist.keySet ++ cand.keySet).map { k =>
        k -> math.min(dist.getOrElse(k, Long.MaxValue), cand.getOrElse(k, Long.MaxValue))
      }.toMap
    }
    dist
  }

  private def ssspMap(seeds: Seq[Long], es: Seq[(Long, Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val local = Graph.sssp(seedDf(seeds), wEdgeDf(es), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Graph.sssp(seedDf(seeds), wEdgeDf(es).repartition(5), rounds,
        localCutoff = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "sssp endgame diverged from distributed frontier rounds")
    local
  }

  test("sssp golden: cheaper two-hop path beats the direct edge") {
    // 1→3 costs 10 direct but 1→2→3 costs 3; within 1 round only the
    // direct edge exists
    val es = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 10L))
    assert(ssspMap(Seq(1L), es, 1) == Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(ssspMap(Seq(1L), es, 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 3L))
  }

  test("sssp: multi-seed min, parallel edges collapse to min weight") {
    val es = Seq((1L, 5L, 7L), (1L, 5L, 2L), (9L, 5L, 3L), (5L, 6L, 1L))
    assert(ssspMap(Seq(1L, 9L), es, 2) ==
      Map(1L -> 0L, 9L -> 0L, 5L -> 2L, 6L -> 3L))
  }

  test("sssp matches full-relaxation Bellman-Ford on random weighted graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val es = Seq.fill(200)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong,
        (rnd.nextInt(9) + 1).toLong)).filter(x => x._1 != x._2)
      val seeds = Seq(0L, 1L, 2L)
      val rounds = 1 + trial
      assert(ssspMap(seeds, es, rounds) == serialSssp(seeds, es, rounds),
        s"trial $trial rounds $rounds")
    }
  }

  test("sssp: unreached nodes are absent, zero-weight edges allowed") {
    val es = Seq((1L, 2L, 0L), (3L, 4L, 5L))
    assert(ssspMap(Seq(1L), es, 3) == Map(1L -> 0L, 2L -> 0L))
  }
}
