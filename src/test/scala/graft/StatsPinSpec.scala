package graft

import graft.operators.Graph
import org.apache.spark.sql.DataFrame

/** Regression pin for the round-15 planner-statistics finding:
  * localCheckpoint preserves origin-plan statistics, and an iterative
  * loop whose round-carried frame re-enters the next plan through ≥ 2
  * multiplicative join paths SQUARES the preserved sizeInBytes every
  * round (digits measured doubling 133 → 569,354 by round 15 before the
  * fix, with driver planning time growing ×2.7/round). [[Graph.pinFresh]]
  * resets the stats at each loop's carry point; this spec asserts the
  * reset STAYS in place by bounding the output plan's sizeInBytes after
  * many forced-distributed rounds — without the pins these blow past any
  * fixed bound immediately.
  */
class StatsPinSpec extends SparkSuite {

  // The bound discriminates the failure mode, not a precise size: a
  // healthy multi-phase op accumulates a few hundred digits of Long.Max
  // factors linearly (scc's outer trim/color/peel assembly measures ~183),
  // while a dropped pin doubles digits PER ROUND and blows past any
  // fixed bound within ~12 rounds (measured 569k digits by round 15).
  private val Bound = BigInt(10).pow(2000)

  private def digitsOf(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toString.length

  private def randomEdges(n: Int, m: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(x => x._1 != x._2)
  }

  private def df(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("src", "dst")
  }

  test("h-index coreness output stats stay bounded across many rounds") {
    // a path graph maximizes the convergence tail (one hop per round)
    val path = (1L to 60L).sliding(2).map(p => (p.head, p.last)).toSeq
    val out = Graph.hIndexCoreness(
      df(path).selectExpr("least(src,dst) AS a", "greatest(src,dst) AS b"), 4)
    assert(out.collect().forall(_.getInt(1) == 1), "a path is all core-1")
    assert(digitsOf(out) < 2000, s"stats digits = ${digitsOf(out)}")
  }

  test("scc / sssp / msf / cc / hits outputs keep bounded stats when forced distributed") {
    val es = randomEdges(40, 160, 7)
    val checks: Seq[(String, DataFrame)] = Seq(
      "scc" -> Graph.scc(df(es), localCutoff = 0L),
      "sssp" -> Graph.sssp(df(Seq((1L, 1L))).selectExpr("src AS id"),
        df(es).selectExpr("src", "dst", "1 AS w"), rounds = 10, localCutoff = 0L),
      "msf" -> Graph.msf(df(es).selectExpr("src AS a", "dst AS b", "1 AS w"),
        localCutoff = 0L),
      "cc" -> Graph.connectedComponents(
        df(es).selectExpr("src AS id").distinct(), df(es), localCutoff = 0L),
      "hits" -> Graph.hits(df(es), iters = 6, localCutoff = 0L),
    )
    checks.foreach { case (name, out) =>
      assert(out.count() > 0, s"$name empty")
      val d = digitsOf(out)
      assert(out.queryExecution.optimizedPlan.stats.sizeInBytes < Bound,
        s"$name output stats have $d digits — a pinFresh was dropped")
    }
  }
}
