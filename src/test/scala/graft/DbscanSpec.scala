package graft

import graft.operators.Similarity

/** DBSCAN role assignment and the deterministic border tie-break, on a
  * constructed geometry (the sf fixtures never produce a border point whose
  * core neighbors sit in two different clusters, so the oracle cannot pin
  * that branch — this spec does). All margins are ≥2% so the ×1000 integer
  * quantization (~0.1% error) cannot flip a threshold comparison.
  */
class DbscanSpec extends SparkSuite {

  private def deg(a: Double): (Double, Double) = {
    val r = math.toRadians(a)
    (math.cos(r).toFloat, math.sin(r).toFloat)
  }

  // two 4-cliques in disjoint planes (pairwise angles ≤60° → cos ≥0.5),
  // one cross-cluster border, one noise point; dim 6, τ=0.5, minPts=4
  private lazy val fixture: Seq[(Long, Array[Float])] = {
    val angles = Seq(0.0, 20.0, 40.0, 60.0)
    val a = angles.zipWithIndex.map { case (ang, i) =>
      val (c, s) = deg(ang)
      (10L + i, Array[Float](c.toFloat, s.toFloat, 0f, 0f, 0f, 0f))
    }
    val b = angles.zipWithIndex.map { case (ang, i) =>
      val (c, s) = deg(ang)
      (1L + i, Array[Float](0f, 0f, c.toFloat, s.toFloat, 0f, 0f))
    }
    // y: cos 0.51 to a1 (e1) and b1 (e3) EXACTLY — its next-closest clique
    // member sits at 0.51·cos20° = 0.479 < τ, so deg(y) = 2 < minPts−1
    val y = (20L, Array[Float](0.51f, 0f, 0.51f, 0f,
      math.sqrt(1.0 - 2 * 0.51 * 0.51).toFloat, 0f))
    val noise = (30L, Array[Float](0f, 0f, 0f, 0f, 0f, 1f))
    a ++ b ++ Seq(y, noise)
  }

  test("cores, clusters, cross-cluster border (min label), noise") {
    val s = spark
    import s.implicits._
    val df = fixture.toDF("vec_id", "embedding")
    val got = Similarity.dbscan(df, "vec_id", "embedding", 0.5, 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    for (i <- 1L to 4L) assert(got(i) == (("core", 1L)), s"B core $i")
    for (i <- 10L to 13L) assert(got(i) == (("core", 10L)), s"A core $i")
    // y touches exactly one core in EACH cluster: border, min cluster wins
    assert(got(20L) == (("border", 1L)))
    assert(got(30L) == (("noise", -1L)))
  }

  test("no cores at all: mutual pair below minPts is noise, not border") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array[Float](1f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array[Float](1f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array[Float](0f, 1f, 0f, 0f, 0f, 0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.dbscan(df, "vec_id", "embedding", 0.5, 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("noise", -1L)), 2L -> (("noise", -1L)), 3L -> (("noise", -1L))))
  }

  test("identical vectors at minPts: whole group is one core cluster") {
    val s = spark
    import s.implicits._
    val df = (1L to 3L).map(i => (i, Array[Float](0f, 0f, 1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscan(df, "vec_id", "embedding", 0.9, 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("core", 1L)), 2L -> (("core", 1L)), 3L -> (("core", 1L))))
  }
}
