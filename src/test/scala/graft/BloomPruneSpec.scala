package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join: the filter must have NO false negatives (the
  * pruned path is result-identical to a plain semi join), must actually
  * prune (the point of the operator), and the bitset build must be
  * deterministic.
  */
class BloomPruneSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("bloomSemiJoin == plain left-semi join (no false negatives survive)") {
    val s = spark
    val orders = Tables(s, dir, "orders")
    val dim = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val pruned = BloomPrune.bloomSemiJoin(orders, "o_custkey", dim, "c_custkey")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val exact = orders.join(dim.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(pruned == exact)
    assert(exact.nonEmpty)
  }

  test("prefilter is a superset of the exact matches and actually prunes") {
    val s = spark
    val orders = Tables(s, dir, "orders")
    val dim = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val total = orders.count()
    val pre = BloomPrune.bloomPrefilter(orders, "o_custkey", dim, "c_custkey").count()
    val exact = orders.join(dim.select(col("c_custkey").as("o_custkey")),
      Seq("o_custkey"), "left_semi").count()
    assert(pre >= exact, "false negative: prefilter dropped a matching row")
    // BUILDING is ~1/5 of customers; with k=3 and 2^17 bits the false-positive
    // rate is well under 1%, so the prefilter must remove most non-matches
    assert(pre < total / 2, s"no pruning happened: $pre of $total passed")
  }

  test("mixed key types (int fact vs long dim) still have no false negatives") {
    val s = spark
    import s.implicits._
    // xxhash64 is type-dependent; the string-canonicalized positions must
    // make an Int fact key meet a Long dim key
    val fact = Seq(1, 2, 99).toDF("fk") // IntegerType
    val dim = Seq(1L, 2L).toDF("dk")    // LongType
    val out = BloomPrune.bloomSemiJoin(fact, "fk", dim, "dk")
      .collect().map(_.getInt(0)).toSet
    assert(out == Set(1, 2))
  }

  test("null fact keys are dropped (semi-join semantics)") {
    val s = spark
    import s.implicits._
    val fact = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("fk")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = BloomPrune.bloomSemiJoin(fact, "fk", dim, "dk")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("buildBloom: deterministic, bounded size, every dim key contained") {
    val s = spark
    import s.implicits._
    val dim = (1L to 500L).toDF("k")
    val w1 = BloomPrune.buildBloom(dim, "k", mBits = 1 << 12, k = 3)
    val w2 = BloomPrune.buildBloom(dim, "k", mBits = 1 << 12, k = 3)
    assert(w1.toSeq == w2.toSeq)
    assert(w1.length == (1 << 12) / 64)
    val contained = dim.filter(BloomPrune.mightContain(w1.toSeq, col("k"), 1 << 12, 3)).count()
    assert(contained == 500L)
  }

  test("buildBloom: rejects a bit width that is not a multiple of 64") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException](
      BloomPrune.buildBloom(Seq(1L).toDF("k"), "k", mBits = 100, k = 3))
  }
}
