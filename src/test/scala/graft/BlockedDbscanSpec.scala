package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The banded sign-LSH blocked ε-pair generator and blocked DBSCAN:
  * subset contract, exact agreement in the tight-cluster regime the
  * blocking is designed for, measured recall floors at the fixture's
  * diffuse τ=0.35 knee (where NO sign-LSH blocking can do well — the
  * PLANS.md r13 analysis; the floors pin what was measured, they don't
  * claim more), and determinism of the band-replicated scan.
  */
class BlockedDbscanSpec extends SparkSuite {

  // two tight 64-dim clusters (intra cos ≥ ~0.999, cross ≈ 0) + one
  // isolated direction: the near-dup density regime. Perturbations are
  // large enough (1e-2 on distinct dims) to survive the ×1000
  // quantization but tiny against the unit base direction.
  private lazy val clustered: Seq[(Long, Array[Float])] = {
    def vec(base: Int, memberIdx: Int): Array[Float] = {
      val v = Array.fill(64)(0.0f)
      v(base) = 1.0f
      // nudge a member-specific dim so members are near but not identical
      v(32 + memberIdx) = 0.01f
      v
    }
    val a = (0 until 5).map(i => (10L + i, vec(0, i)))
    val b = (0 until 5).map(i => (20L + i, vec(1, i + 8)))
    a ++ b ++ Seq((30L, { val v = Array.fill(64)(0.0f); v(2) = 1.0f; v }))
  }

  test("tight clusters at τ=0.9: blocked pairs ≡ exact pairs, blocked DBSCAN ≡ exact DBSCAN") {
    val s = spark
    import s.implicits._
    val df = clustered.toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Similarity.blockedNearDupPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 5-cliques both sides, nothing across
    assert(exact.size == 20, s"fixture produced ${exact.size} exact pairs")
    assert(blocked == exact)
    val de = Similarity.dbscan(df, "vec_id", "embedding", 0.9, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val db = Similarity.dbscanBlocked(df, "vec_id", "embedding", 0.9, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(db == de)
    assert(de.count(_._2 == "core") == 10 && de.exists(t => t._1 == 30L && t._2 == "noise"))
  }

  test("subset contract on the real fixture, with identical cos on shared pairs") {
    val df = Tables(spark, sf("sf0.01"), "embeddings")
    val exact = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blocked = Similarity.blockedNearDupPairs(df, "vec_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.keySet.subsetOf(exact.keySet))
    blocked.foreach { case (k, c) => assert(c == exact(k), s"pair $k") }
    // measured floor at the diffuse knee: 0.613 at (bands=8, bits=4) when
    // pinned (r13); the floor leaves noise room but catches a banding break
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.55, f"pair recall $recall%.3f under floor")
  }

  test("role agreement floor between q_dbscan and q_dbscan_blocked on the fixture") {
    val df = Tables(spark, sf("sf0.01"), "embeddings")
    val exact = Similarity.dbscan(df, "vec_id", "embedding", 0.35, 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val blocked = Similarity.dbscanBlocked(df, "vec_id", "embedding", 0.35, 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(exact.keySet == blocked.keySet)
    val agree = exact.count { case (id, role) => blocked(id) == role }
    // measured 365/500 = 0.73 at pin time; a blocked core can only demote
    // (subset ε-graph), never promote
    assert(agree.toDouble / exact.size >= 0.65, s"agreement $agree/${exact.size}")
    exact.foreach { case (id, role) =>
      if (role == "noise") assert(blocked(id) == "noise", s"$id promoted from noise")
    }
  }

  test("blocked pair scan is deterministic across runs and repartitionings") {
    val df = Tables(spark, sf("sf0.001"), "embeddings")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.blockedNearDupPairs(d, "vec_id", "embedding", 0.35)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run(df)
    val b = run(df.repartition(7))
    assert(a == b && a.nonEmpty)
  }

  test("random projection: basis vectors read the plane weights; non-64-dim rows drop") {
    val s = spark
    import s.implicits._
    // e_0 and e_63 scaled 1.0 → quantized 1000 → proj[r] = 1000·w(r, d)
    val df = Seq(
      (1L, { val v = Array.fill(64)(0.0f); v(0) = 1.0f; v }),
      (2L, { val v = Array.fill(64)(0.0f); v(63) = 1.0f; v }),
      (3L, Array.fill(6)(1.0f)), // wrong width: dropped
    ).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L).length == 16 && got(2L).length == 16)
    // every output is 1000·w with w ∈ [-2, 2] (the rp weight range)
    (got(1L) ++ got(2L)).foreach { v =>
      assert(v % 1000 == 0 && math.abs(v) <= 2000, s"value $v")
    }
    // and the two distinct dims must not project identically everywhere
    assert(got(1L) != got(2L))
  }
}
