package graft

import graft.functions.{PackedDot16, PackedDotFunctions}
import org.apache.spark.sql.functions._

/** packed_dot16 — the IVF-PQ rerank's 16-bit-lane exchange format. The
  * packed dot must equal the unpacked integer dot EXACTLY for every
  * in-range vector (the rerank cosine feeds oracle-checked output), and
  * the lane packing must round-trip negatives and the ±1000 quantized
  * boundary the normalize path guarantees.
  */
class PackedDotSpec extends SparkSuite {

  test("pack16 + dot16 equals the plain integer dot (property, ±1000 range)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vec: Gen[Array[Long]] = for {
      n <- Gen.choose(0, 80)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
    } yield vs.toArray
    val prop = Prop.forAll(vec, vec) { (a: Array[Long], b: Array[Long]) =>
      val n = math.min(a.length, b.length)
      val want = (0 until n).map(i => a(i) * b(i)).sum
      // equal-length prefix (the callers always produce equal lengths;
      // dot16 itself truncates to the common word count)
      val got = PackedDotFunctions.dot16(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          PackedDotFunctions.pack16(a.take(n))),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          PackedDotFunctions.pack16(b.take(n))))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("lane boundaries: ±32767 round-trip exactly; padded lanes contribute 0") {
    val a = Array(32767L, -32768L, 1L, -1L, 7L) // 5 dims -> 2 words, 3 pad lanes
    val got = PackedDotFunctions.dot16(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(PackedDotFunctions.pack16(a)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(PackedDotFunctions.pack16(a)))
    assert(got == a.map(x => x * x).sum)
  }

  test("SQL surface evaluates through codegen") {
    PackedDot16.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((Array(3L, -4L, 5L), Array(2L, 6L, -1L)))
      .toDF("a", "b")
      .select(expr("packed_dot16(a, b)")) // builder coerces; arrays here are unpacked...
    // NOTE: packed_dot16 interprets its inputs as PACKED words — feeding
    // raw small longs is still well-defined (each value occupies word
    // lanes), so pin the kernel's own packing instead:
    val packed = Seq((PackedDotFunctions.pack16(Array(3L, -4L, 5L)),
      PackedDotFunctions.pack16(Array(2L, 6L, -1L)))).toDF("a", "b")
    val got = packed.select(expr("packed_dot16(a, b)")).head().getLong(0)
    assert(got == 3L * 2 + (-4L) * 6 + 5L * (-1))
    assert(df.count() == 1) // and the raw-call plan executes without error
  }

  test("column-level parity: packed formula equals the unpacked dot over a real join") {
    // The exact shape the rerank uses: a pair frame joined to two packed
    // vector frames, dot via packed_dot16 — must equal the unpacked
    // aggregate(zip_with(...)) dot on the same vectors, through real
    // whole-stage codegen, for quantized-unit-range (±1000) vectors.
    PackedDot16.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(64)((rnd.nextInt(2001) - 1000).toLong)))
    val unpacked = vecs.toDF("id", "v")
    val packed = vecs.map { case (i, v) =>
      (i, PackedDotFunctions.pack16(v)) }.toDF("id", "pv")
    val pairs = (1L to 50L).flatMap(a => (1L to 50L by 7).map(b => (a, b)))
      .toDF("a", "b")
    val viaPacked = pairs
      .join(packed.select(col("id").as("a"), col("pv").as("pa")), "a")
      .join(packed.select(col("id").as("b"), col("pv").as("pb")), "b")
      .select(col("a"), col("b"), expr("packed_dot16(pa, pb)").as("d"))
    val viaPlain = pairs
      .join(unpacked.select(col("id").as("a"), col("v").as("va")), "a")
      .join(unpacked.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"),
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("d"))
    assert(viaPacked.exceptAll(viaPlain).count() == 0 &&
      viaPlain.exceptAll(viaPacked).count() == 0)
  }
}
