package graft

import graft.operators.Graph

/** Minimum spanning forest: an independent Prim reference (cut property
  * stepped under the same strict (w, a, b) order), BOTH strategies on
  * every scenario (Kruskal endgame vs forced Borůvka rounds), structural
  * invariants (edge count = n − components, acyclic), and parallel-edge /
  * self-loop hygiene.
  */
class MsfSpec extends SparkSuite {

  private def wdf(es: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("a", "b", "w")
  }

  /** Prim from each component seed: repeatedly add the minimum (w, a, b)
    * edge crossing the visited cut — deliberately NOT Kruskal, so it
    * shares no structure with the endgame it checks.
    */
  private def serialMsf(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = es.filter(x => x._1 != x._2)
      .map { case (x, y, w) => (math.min(x, y), math.max(x, y), w) }
      .groupBy(x => (x._1, x._2)).map { case ((a, b), xs) => (a, b, xs.map(_._3).min) }
      .toSeq
    val nodes = canon.flatMap(x => Seq(x._1, x._2)).distinct.sorted
    val visited = scala.collection.mutable.HashSet.empty[Long]
    val out = scala.collection.mutable.HashSet.empty[(Long, Long, Long)]
    nodes.foreach { seed =>
      if (!visited(seed)) {
        visited += seed
        var grown = true
        while (grown) {
          val crossing = canon.filter(e =>
            visited(e._1) ^ visited(e._2))
          if (crossing.isEmpty) grown = false
          else {
            val pick = crossing.minBy { case (a, b, w) => (w, a, b) }
            out += pick
            visited += (if (visited(pick._1)) pick._2 else pick._1)
          }
        }
      }
    }
    out.toSet
  }

  private def msfSet(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val local = Graph.msf(wdf(es)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = Graph.msf(wdf(es).repartition(7), localCutoff = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(local == dist, "Kruskal endgame diverged from Borůvka rounds")
    local
  }

  test("msf golden: square with a heavy diagonal keeps the three cheap sides") {
    val es = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (1L, 4L, 5L), (1L, 3L, 9L))
    assert(msfSet(es) == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L)))
  }

  test("msf: equal weights break ties by (a, b) — deterministic forest") {
    // triangle, all weight 7: order picks (1,2) then (1,3); (2,3) closes
    // a cycle and is excluded
    val es = Seq((1L, 2L, 7L), (2L, 3L, 7L), (1L, 3L, 7L))
    assert(msfSet(es) == Set((1L, 2L, 7L), (1L, 3L, 7L)))
  }

  test("msf: two components yield two trees; no bridge is invented") {
    val es = Seq((1L, 2L, 3L), (2L, 3L, 1L), (10L, 11L, 2L))
    assert(msfSet(es) == Set((1L, 2L, 3L), (2L, 3L, 1L), (10L, 11L, 2L)))
  }

  test("msf hygiene: self-loops dropped, parallel edges collapse to min weight") {
    val es = Seq((1L, 1L, 0L), (1L, 2L, 9L), (2L, 1L, 4L), (1L, 2L, 6L))
    assert(msfSet(es) == Set((1L, 2L, 4L)))
  }

  test("msf matches the Prim reference on random weighted graphs") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val es = Seq.fill(180)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
        (rnd.nextInt(20) + 1).toLong)).filter(x => x._1 != x._2)
      val got = msfSet(es)
      val ref = serialMsf(es)
      assert(got == ref, s"trial $trial")
      // structural invariant: |forest| = n − #components
      val nodes = es.flatMap(x => Seq(x._1, x._2)).distinct.size
      val comps = {
        // union-find over the REFERENCE forest to count components
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) x = parent(x)
          x
        }
        ref.foreach { case (a, b, _) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(ra) = rb
        }
        es.flatMap(x => Seq(x._1, x._2)).distinct.map(find).distinct.size
      }
      assert(got.size == nodes - comps, s"trial $trial edge count")
    }
  }
}
