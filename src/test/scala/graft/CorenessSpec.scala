package graft

import graft.operators.Graph

/** Core decomposition: a brute-force iterated-peel reference (the
  * definition, not Matula–Beck), BOTH strategies on every scenario
  * (serial bucket peel vs iterated distributed k-cores), the maxK cap
  * contract, and edge hygiene.
  */
class CorenessSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  /** coreness(v) = max k ≤ maxK with v in the k-core, by definition:
    * for each k, delete sub-k-degree nodes to a fixpoint.
    */
  private def serialCoreness(es: Seq[(Long, Long)], maxK: Int): Map[Long, Int] = {
    val und = es.filter(x => x._1 != x._2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val nodes = und.flatMap(x => Seq(x._1, x._2)).distinct
    def kcore(k: Int): Set[Long] = {
      var live = nodes.toSet
      var e = und
      var changed = true
      while (changed) {
        val deg = e.flatMap(x => Seq(x._1, x._2)).groupBy(identity)
          .map { case (n, xs) => n -> xs.size }
        val keep = live.filter(n => deg.getOrElse(n, 0) >= k)
        changed = keep.size != live.size
        live = keep
        e = und.filter(x => live(x._1) && live(x._2))
      }
      live
    }
    nodes.map(n => n -> (1 to maxK).filter(kcore(_).contains(n)).max).toMap
  }

  /** All THREE strategies on every scenario: the Matula–Beck endgame,
    * the h-index fixpoint (the production distributed path), and the
    * superseded iterated-kCore form it replaced (kept as the A/B
    * baseline — if it ever disagrees, one of the two distributed
    * derivations is wrong).
    */
  private def corMap(es: Seq[(Long, Long)], maxK: Int): Map[Long, Int] = {
    val local = Graph.coreness(edgeDf(es), maxK).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dist = Graph.coreness(edgeDf(es).repartition(7), maxK, localCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(local == dist, "Matula–Beck endgame diverged from the h-index fixpoint")
    val iter = Graph.corenessIterated(edgeDf(es), maxK)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(iter == dist, "iterated k-cores diverged from the h-index fixpoint")
    local
  }

  test("coreness golden: clique-with-tail tiers, and the maxK cap") {
    // K4 on {1,2,3,4} (core 3) with a tail 4—5—6 (core 1)
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    assert(corMap(es, 4) == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3, 5L -> 1, 6L -> 1))
    // cap below the true core number reports the cap
    assert(corMap(es, 2) == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 1, 6L -> 1))
  }

  test("coreness matches the iterated-peel definition on random graphs") {
    val rnd = new scala.util.Random(59)
    for (trial <- 1 to 3) {
      val es = Seq.fill(140 + 30 * trial)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).filter(x => x._1 != x._2)
      assert(corMap(es, 6) == serialCoreness(es, 6), s"trial $trial")
    }
  }

  test("coreness hygiene: self-loops and duplicates are inert; a path is all ones") {
    val es = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 4L))
    assert(corMap(es, 4) == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1))
  }
}
