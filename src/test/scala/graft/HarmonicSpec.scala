package graft

import graft.operators.Graph

/** Harmonic centrality: serial multi-source BFS reference, BOTH
  * strategies on every scenario (tagged single-task endgame vs
  * distributed tagged frontier rounds), pivot determinism, and the
  * hop-cap contract.
  */
class HarmonicSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  private def serial(es: Seq[(Long, Long)], nSources: Int,
      maxHops: Int): Map[Long, (Long, Long)] = {
    val und = es.filter(x => x._1 != x._2)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = und.map(_._1).distinct.sorted
    val seeds = nodes.take(nSources)
    val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    seeds.foreach { s =>
      val dist = scala.collection.mutable.HashMap(s -> 0)
      var frontier = Seq(s)
      var h = 1
      while (h <= maxHops && frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Nil))
          .filterNot(dist.contains).distinct
        frontier.foreach(dist.update(_, h))
        h += 1
      }
      dist.foreach { case (n, d) =>
        if (d > 0) {
          val (hm, c) = acc.getOrElse(n, (0L, 0L))
          acc(n) = (hm + 1000000L / d, c + 1)
        }
      }
    }
    acc.toMap
  }

  private def harm(es: Seq[(Long, Long)], nSources: Int,
      maxHops: Int): Map[Long, (Long, Long)] = {
    def run(cutoff: Long) =
      Graph.harmonicCentrality(edgeDf(es), nSources, maxHops, localCutoff = cutoff)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val local = run(1L << 20)
    val dist = run(0L)
    assert(local == dist, "tagged-BFS endgame diverged from distributed rounds")
    local
  }

  test("harmonic golden: path graph from the two lowest pivots") {
    // path 1—2—3—4, pivots {1,2}, maxHops 2:
    //   from 1: d(2)=1, d(3)=2 → 2 gets 1e6, 3 gets 5e5
    //   from 2: d(1)=1, d(3)=1, d(4)=2 → 1e6, 1e6, 5e5
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val got = harm(es, 2, 2)
    assert(got == Map(
      1L -> ((1000000L, 1L)), 2L -> ((1000000L, 1L)),
      3L -> ((1500000L, 2L)), 4L -> ((500000L, 1L))))
    assert(got == serial(es, 2, 2))
  }

  test("harmonic: the hop cap truncates, it doesn't round") {
    // path 1—2—3—4—5, pivot {1}, maxHops 2: node 4 and 5 unreached
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = harm(es, 1, 2)
    assert(got == Map(2L -> ((1000000L, 1L)), 3L -> ((500000L, 1L))))
  }

  test("harmonic: serial equivalence on random graphs, any partitioning") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val es = Seq.fill(150 + 40 * trial)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(x => x._1 != x._2)
      val ref = serial(es, 4, 5)
      assert(harm(es, 4, 5) == ref, s"trial $trial")
      val s = spark
      import s.implicits._
      val got = Graph.harmonicCentrality(
        es.toDF("src", "dst").repartition(9), 4, 5)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == ref, s"trial $trial repartitioned")
    }
  }

  test("harmonic: disconnected pivots only score their own component") {
    // pivots are the two lowest ids 1,2 (same component); isolated pair 50—51
    val es = Seq((1L, 2L), (2L, 3L), (50L, 51L))
    val got = harm(es, 2, 3)
    assert(!got.contains(50L) && !got.contains(51L),
      "nodes unreached by every pivot must be absent")
    assert(got(3L) == ((1500000L, 2L)))
  }
}
