package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance and synchronous label propagation:
  * hand-computed golden cases, serial-reference equivalence on randomized
  * graphs, the determinism/invariance contracts (repartition must not move
  * a single hop or label), and the edge hygiene shared with the other
  * graph operators (self-loops, duplicates, direction).
  */
class FrontierOpsSpec extends SparkSuite {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  private def seedDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.toDF("id")
  }

  private def serialBfs(es: Seq[(Long, Long)], seeds: Seq[Long], cap: Int): Map[Long, Int] = {
    val und = es.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = und.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0).toMap
    var frontier = seeds.distinct
    for (h <- 1 to cap) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    dist
  }

  private def serialLpa(es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2) }
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (u, nbrs) =>
        val cnt = nbrs.map(lab).groupBy(identity).map { case (l, xs) => l -> xs.size }
        val mx = cnt.values.max
        u -> cnt.collect { case (l, c) if c == mx => l }.min
      }
    }
    lab
  }

  /** Both runners execute BOTH strategies — the all-distributed rounds
    * (localCutoff = 0) and the single-task endgame (default cutoff, which
    * these fixtures always fall under) — and assert agreement, so every
    * scenario pins the local ≡ distributed equivalence too.
    */
  private def bfsMap(seeds: Seq[Long], es: Seq[(Long, Long)], cap: Int): Map[Long, Int] = {
    val dist = Graph.bfsHops(seedDf(seeds), edgeDf(es), cap, localCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val local = Graph.bfsHops(seedDf(seeds), edgeDf(es), cap).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(local == dist, "single-task BFS endgame diverged from distributed rounds")
    dist
  }

  private def lpaMap(es: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val dist = Graph.labelPropagation(edgeDf(es), rounds, localCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Graph.labelPropagation(edgeDf(es), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "single-task LPA endgame diverged from distributed rounds")
    dist
  }

  test("bfs golden: chain with cap — hops count up, nodes past the cap absent") {
    val es = (1L until 10L).map(i => (i, i + 1)) // 1-2-...-10
    val got = bfsMap(Seq(1L), es, 4)
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("bfs is multi-source min and undirected") {
    // seeds at both ends of the chain: middle node takes the nearer end;
    // edges were given ascending, so reaching 10 from seed 10 needs the
    // reversed direction
    val es = (1L until 10L).map(i => (i, i + 1))
    val got = bfsMap(Seq(1L, 10L), es, 9)
    assert(got(5L) == 4 && got(6L) == 4 && got(9L) == 1 && got(10L) == 0)
    assert(got == serialBfs(es, Seq(1L, 10L), 9))
  }

  test("bfs: isolated seed is hop 0; early exit past the eccentricity is correct") {
    val es = Seq((1L, 2L), (2L, 3L))
    val got = bfsMap(Seq(1L, 99L), es, 40) // 40 rounds offered, 2 needed
    assert(got == Map(1L -> 0, 99L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfs hygiene: self-loops and duplicate/reversed edges don't distort hops") {
    val es = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    assert(bfsMap(Seq(1L), es, 5) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfs matches the serial reference on a seeded random graph, any partitioning") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val seeds = Seq(0L, 17L, 41L)
    val ref = serialBfs(es, seeds, 3)
    assert(bfsMap(seeds, es, 3) == ref)
    val got17 = Graph.bfsHops(seedDf(seeds).repartition(17), edgeDf(es).repartition(13), 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got17 == ref)
  }

  test("lpa golden: two 4-cliques with one bridge split into two communities") {
    def clique(ns: Seq[Long]) = for {
      a <- ns; b <- ns if a < b
    } yield (a, b)
    val es = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) ++ Seq((4L, 5L))
    val got = lpaMap(es, 4)
    assert(got == serialLpa(es, 4))
    assert(Seq(1L, 2L, 3L, 4L).map(got).toSet == Set(1L))
    assert(Seq(5L, 6L, 7L, 8L).map(got).toSet == Set(5L))
  }

  test("lpa tie-break is the minimum label (star adopts min leaf; leaves adopt hub)") {
    // hub 10 with leaves 11..14: round 1 hub → min leaf 11, leaves → 10;
    // round 2 hub sees all-10 → 10, leaves see 11 → 11 (2-periodic swap,
    // the classic synchronous-LPA oscillation the FIXED round count pins)
    val es = Seq(11L, 12L, 13L, 14L).map(l => (10L, l))
    val r1 = lpaMap(es, 1)
    assert(r1 == Map(10L -> 11L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L))
    assert(lpaMap(es, 2) == serialLpa(es, 2))
  }

  test("lpa matches the serial reference on seeded random graphs, any partitioning") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
      val ref = serialLpa(es, 4)
      assert(lpaMap(es, 4) == ref, s"seed=$seed")
      val got11 = Graph.labelPropagation(edgeDf(es).repartition(11), 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got11 == ref, s"seed=$seed repartitioned")
    }
  }

  private def serialPpr(es: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      scale: Long = Graph.Scale): Map[Long, Long] = {
    val e = es.distinct
    val nodes = (e.flatMap(x => Seq(x._1, x._2)) ++ seeds).distinct
    val od = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var pr: Map[Long, Long] = nodes.map(n => n -> (if (seeds(n)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val m = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => pr(s) / od(s) }.sum
      }
      pr = nodes.map(n =>
        n -> ((if (seeds(n)) scale * 15 / 100 else 0L) + 85 * m.getOrElse(n, 0L) / 100)).toMap
    }
    pr
  }

  private def pprMap(es: Seq[(Long, Long)], seeds: Seq[Long], iters: Int): Map[Long, Long] =
    Graph.personalizedPageRank(edgeDf(es), seedDf(seeds), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ppr golden: hand-computed two rounds on a seeded path") {
    // path 1-2-3 (bidirectional edges fed explicitly), seed {1}, S = scale:
    //   pr0 = (S, 0, 0); od = (1, 2, 1)
    //   r1:  1 → 0.15S;          2 → 0.85·S;        3 → 0
    //   r2:  1 → 0.15S + 0.85·(0.85S/2) = 0.51125S
    //        2 → 0.85·0.15S = 0.1275S   (teleport only reaches seeds)
    //        3 → 0.85·(0.85S/2) = 0.36125S
    // (rank ORDER oscillates with round parity on a path — only the exact
    // values are a stable contract)
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val got = pprMap(es, Seq(1L), 2)
    assert(got == serialPpr(es, Set(1L), 2))
    assert(got == Map(1L -> 511250000000L, 2L -> 127500000000L, 3L -> 361250000000L))
  }

  test("ppr: isolated seed keeps exactly the teleport mass; unreachable node is 0") {
    val es = Seq((1L, 2L), (2L, 1L))
    val got = pprMap(es, Seq(1L, 99L), 3)
    assert(got(99L) == Graph.Scale * 15 / 100)
    val got2 = pprMap(es ++ Seq((5L, 6L), (6L, 5L)), Seq(1L), 3)
    assert(got2(5L) == 0L && got2(6L) == 0L)
  }

  test("ppr with every node seeded equals plain pageRank (same rounds)") {
    val rnd = new scala.util.Random(11)
    val es = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val allNodes = es.flatMap(x => Seq(x._1, x._2)).distinct
    val ppr = pprMap(es, allNodes, 4)
    val pr = Graph.pageRank(edgeDf(es), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("ppr matches the serial reference on a seeded random graph, any partitioning") {
    val rnd = new scala.util.Random(5)
    val es = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val seeds = Seq(0L, 7L, 13L)
    val ref = serialPpr(es, seeds.toSet, 4)
    assert(pprMap(es, seeds, 4) == ref)
    val got = Graph.personalizedPageRank(
        edgeDf(es).repartition(13), seedDf(seeds).repartition(5), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  private def serialWpr(es: Seq[(Long, Long, Long)], iters: Int,
      scale: Long = Graph.Scale): Map[Long, Long] = {
    val e = es.filter(_._3 > 0).groupBy(x => (x._1, x._2))
      .map { case ((s, d), xs) => (s, d, xs.map(_._3).sum) }.toSeq
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val tw = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    var pr: Map[Long, Long] = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val m = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _, w) =>
          val t = tw(s); (pr(s) / t) * w + ((pr(s) % t) * w) / t
        }.sum
      }
      pr = nodes.map(n => n -> (scale * 15 / 100 + 85 * m.getOrElse(n, 0L) / 100)).toMap
    }
    pr
  }

  private def wprMap(es: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.weightedPageRank(es.toDF("src", "dst", "w"), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted pagerank golden: mass splits by weight, one hand-computed round") {
    // 1 →(w=4)→ 2, 1 →(w=1)→ 3: tw(1) = 5, S = scale
    //   r1(2) = 0.15S + 0.85·(S·4/5) = 0.15S + 0.68S = 0.83S
    //   r1(3) = 0.15S + 0.85·(S/5)   = 0.15S + 0.17S = 0.32S
    //   r1(1) = 0.15S (no in-edges)
    val got = wprMap(Seq((1L, 2L, 4L), (1L, 3L, 1L)), 1)
    assert(got == Map(1L -> 150000000000L, 2L -> 830000000000L, 3L -> 320000000000L))
    assert(got == serialWpr(Seq((1L, 2L, 4L), (1L, 3L, 1L)), 1))
  }

  test("weighted pagerank with uniform weights equals plain pageRank") {
    // with w = 1 the two-term split degenerates to r div od exactly
    // ((r mod od)·1 div od = 0), so the rounds are bit-identical
    val rnd = new scala.util.Random(3)
    val es = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val wpr = wprMap(es.map { case (a, b) => (a, b, 1L) }, 4)
    val pr = Graph.pageRank(edgeDf(es), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wpr == pr)
  }

  test("weighted pagerank: parallel edges sum; serial reference; partition invariance") {
    // duplicate (1,2) rows must behave as one w=5 edge
    assert(wprMap(Seq((1L, 2L, 2L), (1L, 2L, 3L), (1L, 3L, 5L)), 2) ==
      serialWpr(Seq((1L, 2L, 5L), (1L, 3L, 5L)), 2))
    val rnd = new scala.util.Random(17)
    val es = Seq.fill(250)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
      (rnd.nextInt(9) + 1).toLong)).filter(x => x._1 != x._2)
    val ref = serialWpr(es, 4)
    assert(wprMap(es, 4) == ref)
    val s = spark
    import s.implicits._
    val got = Graph.weightedPageRank(es.toDF("src", "dst", "w").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  private def serialHits(es: Seq[(Long, Long)], iters: Int,
      scale: Long = Graph.HitsScale): Map[Long, (Long, Long)] = {
    val e = es.distinct
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    var h: Map[Long, Long] = nodes.map(_ -> scale).toMap
    var a: Map[Long, Long] = nodes.map(_ -> 0L).toMap
    // BigInt on the SUM as well as the product, like the operator: at
    // scale ≥ 1e18 the raw sum alone passes Long.Max at in-degree 10
    val zero = BigInt(0)
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, in) => d -> in.map(x => BigInt(h(x._1))).sum }
      val am = (if (ar.isEmpty) zero else ar.values.max).max(BigInt(1))
      a = nodes.map(n => n -> (ar.getOrElse(n, zero) * scale / am).toLong).toMap
      val hr = e.groupBy(_._1).map { case (s, out) => s -> out.map(x => BigInt(a(x._2))).sum }
      val hm = (if (hr.isEmpty) zero else hr.values.max).max(BigInt(1))
      h = nodes.map(n => n -> (hr.getOrElse(n, zero) * scale / hm).toLong).toMap
    }
    nodes.map(n => n -> ((h(n), a(n)))).toMap
  }

  /** Runs BOTH strategies (all-distributed rounds and the single-task
    * endgame these fixtures fall under) and asserts agreement.
    */
  private def hitsMap(es: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val dist = Graph.hits(edgeDf(es), iters, localCutoff = 0L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val local = Graph.hits(edgeDf(es), iters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(local == dist, "single-task HITS endgame diverged from distributed rounds")
    dist
  }

  test("hits golden: hand-computed round on a tiny bipartite graph") {
    // 1→A, 1→B, 2→A (A=101, B=102), S = 1e12; after round 1:
    //   auth raw (A: 2S, B: S), max 2S → a(A)=S, a(B)=S/2
    //   hub raw (1: 1.5S, 2: S), max 1.5S → h(1)=S, h(2)=floor(S²/1.5S)
    val es = Seq((1L, 101L), (1L, 102L), (2L, 101L))
    val got = hitsMap(es, 1)
    assert(got == Map(
      1L -> ((1000000000000L, 0L)), 2L -> ((666666666666L, 0L)),
      101L -> ((0L, 1000000000000L)), 102L -> ((0L, 500000000000L))))
    assert(got == serialHits(es, 1))
  }

  test("hits: a hub whose raw·scale passes Long.Max normalizes exactly") {
    // 16 leaves all pointing at one center: auth raw(center) = 16·1e12,
    // and the normalization multiplies that by scale again — 1.6e25,
    // three orders past Long.Max. The old BIGINT arithmetic wrapped
    // here; the DECIMAL(38,0) intermediate must hold exactly.
    val es = (1L to 16L).map(l => (l, 100L))
    val got = hitsMap(es, 2)
    assert(got == serialHits(es, 2))
    assert(got(100L)._2 == Graph.HitsScale && got(1L)._1 == Graph.HitsScale)
  }

  test("hits: a raw SUM that passes Long.Max is exact in both strategies") {
    // 10 leaves → one center at scale 1e18: auth raw(center) = 10·1e18 =
    // 1e19 > Long.Max BEFORE the ×scale step. The r14 fix widened only
    // the product — a plain BIGINT sum throws under ANSI on the
    // distributed path and wraps silently in a Long-accumulating
    // endgame; this pins the widened sum (DECIMAL(38,0) distributed,
    // BigInt endgame; ADVICE r15).
    val sc = 1000000000000000000L
    val es = (1L to 10L).map(l => (l, 100L)) ++ Seq((100L, 200L))
    def run(cutoff: Long): Map[Long, (Long, Long)] =
      Graph.hits(edgeDf(es), 2, scale = sc, localCutoff = cutoff).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val dist = run(0L)
    val local = run(1L << 20)
    assert(local == dist, "endgame diverged from distributed rounds past Long.Max")
    assert(dist == serialHits(es, 2, sc))
    assert(dist(100L)._2 == sc, "the star center must normalize to the scale max")
  }

  test("hits: serial-reference equivalence on a random graph, any partitioning") {
    val rnd = new scala.util.Random(29)
    val es = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (x, y) => x != y }
    val ref = serialHits(es, 3)
    assert(hitsMap(es, 3) == ref)
    val got = Graph.hits(edgeDf(es).repartition(11), 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == ref)
  }

  test("hits roles: pure sources have auth 0, pure sinks hub 0, top scores hit the scale") {
    val es = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 101L))
    val got = hitsMap(es, 3)
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 0L), "a pure source gained authority")
    assert(Seq(101L, 102L).forall(got(_)._1 == 0L), "a pure sink gained hubness")
    assert(got(101L)._2 == Graph.HitsScale, "the dominant authority must sit at the scale max")
    assert(got.values.map(_._1).max == Graph.HitsScale, "some hub must sit at the scale max")
  }

  private def serialModularity(es: Seq[(Long, Long)],
      labels: Map[Long, Long]): Map[Long, (Long, Long, Long, Long)] = {
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val m = und.size.toLong
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    labels.values.toSeq.distinct.map { c =>
      val members = labels.collect { case (n, l) if l == c => n }.toSet
      val mIn = und.count { case (a, b) => members(a) && members(b) }.toLong
      val dTot = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      val q = (BigInt(1000000) * mIn / m - BigInt(1000000) * dTot * dTot / (BigInt(4) * m * m)).toLong
      c -> ((members.size.toLong, mIn, dTot, q))
    }.toMap
  }

  private def modMap(es: Seq[(Long, Long)], labels: Map[Long, Long]): Map[Long, (Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Graph.modularity(edgeDf(es),
        labels.toSeq.toDF("node", "label"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("modularity golden: two bridged triangles score high; one blob scores zero") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val es = tri1 ++ tri2 ++ Seq((3L, 4L))
    val twoComms = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = modMap(es, twoComms)
    assert(got == serialModularity(es, twoComms))
    // m = 7; each community: m_in = 3, d_tot = 7 →
    // q = 1e6·3/7 − 1e6·49/196 = 428571 − 250000 = 178571
    assert(got(1L) == ((3L, 3L, 7L, 178571L)) && got(4L) == ((3L, 3L, 7L, 178571L)))
    // the trivial all-one-community partition scores exactly 0:
    // 1e6·m/m − 1e6·(2m)²/(4m²)
    val one = modMap(es, (1L to 6L).map(_ -> 1L).toMap)
    assert(one == Map(1L -> ((6L, 7L, 14L, 0L))))
  }

  test("modularity of the LPA partition matches the serial formula on a random graph") {
    val rnd = new scala.util.Random(23)
    val es = Seq.fill(250)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val labels = lpaMap(es, 4)
    assert(modMap(es, labels) == serialModularity(es, labels))
  }

  private def serialConductance(es: Seq[(Long, Long)],
      labels: Map[Long, Long]): Map[Long, (Long, Long, Long, Option[Long])] = {
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val volAll = 2L * und.size
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    labels.values.toSeq.distinct.map { c =>
      val members = labels.collect { case (n, l) if l == c => n }.toSet
      val cut = und.count { case (a, b) => members(a) ^ members(b) }.toLong
      val vol = members.toSeq.map(n => deg.getOrElse(n, 0L)).sum
      val denom = math.min(vol, volAll - vol)
      val phi = if (denom > 0) Some((BigInt(1000000) * cut / denom).toLong) else None
      c -> ((members.size.toLong, cut, vol, phi))
    }.toMap
  }

  private def condMap(es: Seq[(Long, Long)],
      labels: Map[Long, Long]): Map[Long, (Long, Long, Long, Option[Long])] = {
    val s = spark
    import s.implicits._
    Graph.conductance(edgeDf(es), labels.toSeq.toDF("node", "label"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
  }

  test("conductance golden: bridged triangles cut once each; whole graph abstains") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val es = tri1 ++ tri2 ++ Seq((3L, 4L))
    val twoComms = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = condMap(es, twoComms)
    assert(got == serialConductance(es, twoComms))
    // each side: cut 1, vol 7, min(7, 14−7) = 7 → ⌊1e6/7⌋ = 142857
    assert(got(1L) == ((3L, 1L, 7L, Some(142857L))))
    assert(got(4L) == ((3L, 1L, 7L, Some(142857L))))
    // the all-one-community partition has min-side volume 0 → null
    val one = condMap(es, (1L to 6L).map(_ -> 1L).toMap)
    assert(one == Map(1L -> ((6L, 0L, 14L, None))))
  }

  test("conductance of the LPA partition matches the serial formula on a random graph") {
    val rnd = new scala.util.Random(37)
    val es = Seq.fill(250)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val labels = lpaMap(es, 4)
    assert(condMap(es, labels) == serialConductance(es, labels))
  }

  test("modularity: a community with d_tot ≥ 4e6 stays exact (decimal intermediate)") {
    // Two stars: 4e6 and 1e6 leaves, one community each. The big
    // community's null-model numerator is 1e6·(8e6)² = 6.4e19 — past
    // Long.Max, where the old BIGINT form wrapped silently to 86597-ish
    // micros instead of 640000. The DECIMAL(38,0) intermediate must
    // reproduce the BigInt value exactly.
    val s = spark
    val starA = s.range(1L, 4000001L).select(lit(0L).as("src"), col("id").as("dst"))
    val starB = s.range(10000001L, 11000001L)
      .select(lit(10000000L).as("src"), col("id").as("dst"))
    val labels = s.range(0L, 4000001L).select(col("id").as("node"), lit(0L).as("label"))
      .union(s.range(10000000L, 11000001L).select(col("id").as("node"), lit(1L).as("label")))
    val got = Graph.modularity(starA.union(starB), labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val m = 5000000L
    def q(mIn: Long, dTot: Long): Long =
      (BigInt(1000000) * mIn / m - BigInt(1000000) * dTot * dTot / (BigInt(4) * m * m)).toLong
    assert(q(4000000L, 8000000L) == 160000L && q(1000000L, 2000000L) == 160000L)
    assert(got == Map(
      0L -> ((4000001L, 4000000L, 8000000L, 160000L)),
      1L -> ((1000001L, 1000000L, 2000000L, 160000L))))
  }

  test("lpa hygiene: self-loops and duplicate edges don't add votes") {
    // duplicate (1,2) must not double 2's vote at node 1: with nbrs
    // {2 (dup), 3}, a doubled vote would elect 2 over the true tie-min
    val es = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 3L), (1L, 1L))
    val got = lpaMap(es, 1)
    assert(got(1L) == 2L) // tie between labels 2 and 3 → min = 2
    assert(got == serialLpa(es, 1))
  }
}
