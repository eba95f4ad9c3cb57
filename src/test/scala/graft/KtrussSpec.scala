package graft

import graft.operators.Graph

/** k-truss: brute-force iterated common-neighbor peel reference, BOTH
  * strategies on every scenario (serial endgame vs distributed support
  * peel), cascade goldens, and edge hygiene.
  */
class KtrussSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  private def serial(es: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var edges = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    var sup = Map.empty[(Long, Long), Long]
    var converged = false
    while (!converged) {
      val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
      sup = edges.iterator.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong
      }.toMap
      val keep = edges.filter(e => sup(e) >= k - 2)
      converged = keep.size == edges.size
      edges = keep
    }
    edges.iterator.map(e => e -> sup(e)).toMap
  }

  private def trussMap(es: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    def run(cutoff: Long) =
      Graph.ktruss(edgeDf(es), k, localCutoff = cutoff).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val local = run(1L << 20)
    val dist = run(0L)
    assert(local == dist, "serial endgame diverged from distributed support peel")
    local
  }

  test("ktruss golden: a K4 is a 4-truss; its pendant triangle peels away") {
    // K4 on {1,2,3,4} + triangle {4,5,6}: at k=4 every K4 edge has
    // support 2; the pendant triangle's edges have support 1 and peel,
    // which does NOT cascade into the K4
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    val got = trussMap(es, 4)
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got.values.forall(_ == 2L))
    assert(got == serial(es, 4))
  }

  test("ktruss cascade: removing one weak edge unravels a chain of triangles") {
    // triangle strip 1-2-3, 2-3-4, 3-4-5: interior edges (2,3),(3,4) have
    // support 2, the rest support 1 — at k=4 the boundary edges peel
    // first and the strip unravels completely (multi-round cascade)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L))
    assert(trussMap(es, 4).isEmpty)
    // at k=3 (support ≥ 1) the whole strip survives
    val k3 = trussMap(es, 3)
    assert(k3.keySet.size == 7)
    assert(k3 == serial(es, 3))
  }

  test("ktruss matches the serial peel on random graphs, any partitioning") {
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 3) {
      val es = Seq.fill(120 + 40 * trial)(
        (rnd.nextInt(22).toLong, rnd.nextInt(22).toLong)).filter(x => x._1 != x._2)
      val ref = serial(es, 4)
      assert(trussMap(es, 4) == ref, s"trial $trial")
      val s = spark
      import s.implicits._
      val got = Graph.ktruss(es.toDF("src", "dst").repartition(7), 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == ref, s"trial $trial repartitioned")
    }
  }

  test("ktruss hygiene: self-loops and duplicate/reversed edges are inert") {
    val es = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 3L))
    val got = trussMap(es, 3)
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("ktrussPeelRounds counts the passes including the no-change one") {
    // already a truss at k=3 → 1 round (the proving pass)
    assert(Graph.ktrussPeelRounds(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 3) == 1)
    // the strip at k=4 needs multiple passes before the empty fixpoint
    assert(Graph.ktrussPeelRounds(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (3L, 5L), (4L, 5L)), 4) >= 2)
  }
}
