package graft

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Star-contraction connected components: must equal a local union-find on
  * every graph shape (chains, cliques, random sparse, isolated nodes), must
  * converge in far fewer rounds than the graph diameter (the algorithm's
  * reason to exist — the 40-round cap vs a 500-hop chain is the pin), must
  * agree with [[Dedup.clusterPairs]] where propagation's iteration budget
  * suffices, and must enforce the same edge-hygiene contract (self-loops,
  * duplicates, reversed duplicates, stray endpoints).
  */
class StarCcSpec extends SparkSuite {

  private def localCc(n: Seq[Long], e: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    e.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  /** Runs BOTH execution strategies — all-distributed star contraction
    * (localCutoff = 0) and the single-task union-find endgame (default
    * cutoff, which these fixtures always fall under) — and asserts they
    * agree, so every scenario in this suite pins the local ≡ distributed
    * equivalence as well as the expected labels.
    */
  private def run(n: Seq[Long], e: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val nodes = n.toDF("id")
    val edges = if (e.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else e.toDF("src", "dst")
    val distributed = Graph.connectedComponents(nodes, edges, localCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Graph.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == distributed,
      "single-task union-find endgame diverged from distributed star contraction")
    distributed
  }

  test("500-hop chain with shuffled ids: far past propagation's 50-round cap") {
    // a path graph whose consecutive node ids are NOT ordered along the
    // path (shuffled labels), so the component min sits mid-chain and label
    // propagation would need ~250 rounds; star contraction's 40-round cap
    // must hold with room to spare
    val ids = new Random(7).shuffle((0L until 500L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(ids, edges)
    assert(got.values.toSet == Set(0L), "single component labeled by min id")
    assert(got.size == 500)
  }

  test("random sparse graphs match a local union-find (3 seeds)") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val n = (0L until 300L).toVector
      val edges = Vector.fill(260)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
        .filter { case (a, b) => a != b }
      assert(run(n, edges) == localCc(n, edges), s"seed=$seed")
    }
  }

  test("cliques, isolated nodes, duplicate + reversed + self-loop edges") {
    val n = (0L until 20L) ++ Seq(100L, 101L) // 100/101 isolated
    val clique1 = for (a <- 0L until 6L; b <- (a + 1) until 6L) yield (a, b)
    val clique2 = for (a <- 10L until 16L; b <- (a + 1) until 16L) yield (a, b)
    val noise = Seq((3L, 1L), (1L, 3L), (5L, 5L), (0L, 1L), (0L, 1L))
    val got = run(n, clique1 ++ clique2 ++ noise)
    assert((0L until 6L).forall(got(_) == 0L))
    assert((10L until 16L).forall(got(_) == 10L))
    assert((6L until 10L).forall(i => got(i) == i), "edge-free nodes are singletons")
    assert(got(100L) == 100L && got(101L) == 101L)
  }

  test("edge endpoints absent from nodes are dropped (covering contract)") {
    // 999 is not in the node frame: the 1–999 and 999–2 edges must not
    // leak 999 into the output NOR connect 1 and 2 through it
    val got = run(Seq(1L, 2L), Seq((1L, 999L), (999L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("agrees with clusterPairs where propagation's budget suffices") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val nodes = (0L until 200L).toVector
    val edges = Vector.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val star = run(nodes, edges)
    val prop = Dedup.clusterPairs(
        nodes.toDF("doc_id"), edges.toDF("doc_a", "doc_b"))
      .select("doc_id", "canonical_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("empty edge set: every node its own component, no iteration") {
    val got = run(Seq(5L, 6L, 7L), Seq.empty)
    assert(got == Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }
}
