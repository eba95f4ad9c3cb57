package graft

import graft.functions.{SortedIntersectAtLeast, SortedIntersectFunctions}
import org.apache.spark.sql.functions._

/** The sorted_intersect_atleast Expression — the edit join's conjunctive
  * count filter. Property-pinned against the obvious Set-intersection
  * definition (the early-exit merge scan must never change the answer),
  * plus the SQL surface and the vacuous-bound edge.
  */
class SortedIntersectSpec extends SparkSuite {

  test("kernel matches set-intersection counting for any k (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sortedDistinct: Gen[Seq[Int]] =
      Gen.listOf(Gen.chooseNum(-100, 100)).map(_.distinct.sorted.toSeq)
    val prop = Prop.forAll(sortedDistinct, sortedDistinct, Gen.chooseNum(-3, 120)) {
      (a: Seq[Int], b: Seq[Int], k: Int) =>
        val expected = (a.toSet & b.toSet).size >= k
        val got = SortedIntersectFunctions.atLeast(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray), k)
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("multiset contract: duplicates count as sum of min multiplicities (property)") {
    // The cooccur cold-pair filter (Graph.prefilterEdges) feeds SORTED but
    // NOT distinct hash-image arrays; the contract is multiset
    // intersection — deduplicating there would be unsound (two shared
    // items colliding to one hash must count twice). Pin the kernel
    // against the Σ min(multiplicity) definition on duplicate-heavy input.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sortedMultiset: Gen[Seq[Int]] =
      Gen.listOf(Gen.chooseNum(-5, 5)).map(_.sorted.toSeq) // tiny domain → many dups
    val prop = Prop.forAll(sortedMultiset, sortedMultiset, Gen.chooseNum(-2, 40)) {
      (a: Seq[Int], b: Seq[Int], k: Int) =>
        val ca = a.groupBy(identity).view.mapValues(_.size)
        val cb = b.groupBy(identity).view.mapValues(_.size).toMap
        val shared = ca.map { case (v, n) => math.min(n, cb.getOrElse(v, 0)) }.sum
        val got = SortedIntersectFunctions.atLeast(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray), k)
        got == (shared >= k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("SQL surface evaluates through codegen and handles the vacuous bound") {
    SortedIntersectAtLeast.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1, 3, 5, 9), Seq(3, 5, 7), 2, true),   // shares {3,5}
      (Seq(1, 3, 5, 9), Seq(3, 5, 7), 3, false),  // only 2 shared
      (Seq(1, 2), Seq(9, 10), 0, true),           // k <= 0 is vacuous
      (Seq.empty[Int], Seq(1), 1, false),         // empty side
      (Seq.empty[Int], Seq(1), -5, true),         // empty + vacuous
    ).toDF("a", "b", "k", "want")
    val bad = df.filter(expr("sorted_intersect_atleast(a, b, k)") =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("null input yields null (filter-false in a join condition)") {
    SortedIntersectAtLeast.register(spark)
    val got = spark.sql(
      "SELECT sorted_intersect_atleast(CAST(NULL AS ARRAY<INT>), array(1), 1)")
      .collect()(0)
    assert(got.isNullAt(0))
  }
}
