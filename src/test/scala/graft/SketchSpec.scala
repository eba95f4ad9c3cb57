package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Sketch operators: the Misra–Gries candidate guarantee, heavy-hitter
  * exactness on skewed data, and KMV buffer/merge semantics — including
  * partition-count invariance, which is what makes the sketch safe to
  * partial-aggregate map-side on any cluster layout.
  */
class SketchSpec extends SparkSuite {

  test("misraGries: survivors contain every key above n/(cap+1)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val stream = Gen.choose(20, 300).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(5 -> Gen.choose(1L, 3L), 3 -> Gen.choose(10L, 30L),
        2 -> Gen.choose(100L, 200L))))
    val prop = Prop.forAll(stream, Gen.choose(2, 10)) { (xs, cap) =>
      val survivors = Sketches.misraGries(xs.iterator, cap).toSet
      assert(survivors.size <= cap)
      val counts = xs.groupBy(identity).view.mapValues(_.size).toMap
      counts.forall { case (k, c) => c <= xs.size.toDouble / (cap + 1) || survivors(k) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("heavyHitters: exact result on skewed keys, any partitioning") {
    val s = spark
    import s.implicits._
    // 3 hot keys (>= 10%), a tail of cold ones
    val rows = Seq.fill(40)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      (100L until 200L)
    val expected = Map(1L -> 40L, 2L -> 30L, 3L -> 20L)
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("k").repartition(parts)
      val got = Sketches.heavyHitters(df, "k", 0.1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("heavyHitters: empty input yields empty output") {
    val s = spark
    import s.implicits._
    assert(Sketches.heavyHitters(Seq.empty[Long].toDF("k"), "k", 0.5).count() == 0)
  }

  test("heavyHitters: null keys and uncastable strings are excluded, not a crash") {
    val s = spark
    import s.implicits._
    // nulls and non-numeric strings both become null after cast(Long); the
    // support fraction is over the 5 remaining non-null keys (3/5 >= 0.5)
    val df = Seq(Some("7"), None, Some("x"), Some("7"), Some("7"), Some("2"), Some("2"))
      .toDF("k")
    val got = Sketches.heavyHitters(df, "k", 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 3L))
  }

  test("kmv_sketch: below k the sketch is exact; nulls are skipped") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    val df = Seq(Some(5L), Some(9L), Some(5L), None, Some(2L)).toDF("h")
    val r = df.selectExpr("kmv_sketch(h, 64) AS sk").select("sk.nd", "sk.kth").head()
    assert(r.getLong(0) == 3L) // 3 distinct non-null hashes
    assert(r.getLong(1) == 9L) // max retained = overall max below saturation
  }

  test("kmv_sketch: saturated buffer keeps the k smallest distinct values") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    // 1..100 with duplicates; k=10 -> kth minimum is 10
    val df = ((1L to 100L) ++ (1L to 50L)).toDF("h")
    val r = df.selectExpr("kmv_sketch(h, 10) AS sk").select("sk.nd", "sk.kth").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
  }

  test("kmv_sketch: partition-count invariant (merge path == single buffer)") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    val data = (1L to 500L).map(i => i * 2654435761L % 1000003L)
    val single = data.toDF("h").coalesce(1)
      .selectExpr("kmv_sketch(h, 32) AS sk").select("sk.nd", "sk.kth").head()
    val sharded = data.toDF("h").repartition(13)
      .selectExpr("kmv_sketch(h, 32) AS sk").select("sk.nd", "sk.kth").head()
    assert(single == sharded)
  }

  test("kmv_sketch: estimate is within 2x of truth at k=64 on 10k keys") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    // mixed-congruential spread over 48 bits
    val df = (1L to 10000L).map(i => i * 6364136223846793005L & ((1L << 48) - 1)).toDF("h")
    val kth = df.selectExpr("kmv_sketch(h, 64) AS sk").select("sk.kth").head().getLong(0)
    val est = 63.0 * 281474976710656.0 / kth.toDouble
    assert(est > 5000 && est < 20000, s"est=$est")
  }

  test("kmv_sketch: builder rejects bad arity, k, and types at analysis") {
    val s = spark
    graft.functions.KmvSketch.register(s)
    intercept[Exception](s.sql("SELECT kmv_sketch(1)").collect())
    intercept[Exception](s.sql("SELECT kmv_sketch('a', 4)").collect())
    intercept[Exception](s.sql("SELECT kmv_sketch(1, 0)").collect())
  }

  test("kmv_sketch_full: mins is exactly the sorted bottom-k distinct set, any partitioning") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    val data = (1L to 400L).map(i => i * 2654435761L % 99991L)
    val expect = data.distinct.sorted.take(16)
    for (parts <- Seq(1, 7)) {
      val r = data.toDF("h").repartition(parts)
        .selectExpr("kmv_sketch_full(h, 16) AS sk")
        .select("sk.nd", "sk.kth", "sk.mins").head()
      assert(r.getLong(0) == 16L)
      assert(r.getLong(1) == expect.last)
      assert(r.getSeq[Long](2) == expect, s"parts=$parts")
    }
  }

  test("bounded_set: sorted distinct set below cap, null at cap+1, any partitioning") {
    val s = spark
    import s.implicits._
    graft.functions.BoundedSetAgg.register(s)
    // group 1: 5 distinct (fits cap 5); group 2: 6 distinct (overflows)
    val rows = (1L to 5L).flatMap(v => Seq((1L, v), (1L, v))) ++ (1L to 6L).map((2L, _))
    for (parts <- Seq(1, 7)) {
      val m = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(org.apache.spark.sql.functions.expr("bounded_set(v, 5)").as("ss"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(m(1L).map(_.asInstanceOf[scala.collection.Seq[Long]].toList) == Some((1L to 5L).toList), s"parts=$parts")
      assert(m(2L).isEmpty, s"parts=$parts") // overflow -> null
    }
  }

  test("bounded_set: overflow survives serialize/merge round-trips and nulls are skipped") {
    val s = spark
    import s.implicits._
    graft.functions.BoundedSetAgg.register(s)
    // many partitions force serialize+merge: group 1 overflows cap 8 only
    // AFTER partial merge (each partial holds < 8), group 2 mixes nulls in
    val rows = (1L to 100L).map(v => (1L, Some(v))) ++
      Seq((2L, Some(42L)), (2L, None), (2L, None))
    val m = rows.toDF("g", "v").repartition(23)
      .groupBy("g").agg(org.apache.spark.sql.functions.expr("bounded_set(v, 8)").as("ss"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L).isEmpty) // 100 distinct > 8 -> overflow propagates through merges
    assert(m(2L).map(_.asInstanceOf[scala.collection.Seq[Long]].toList) == Some(List(42L))) // nulls skipped
  }

  test("histQuantile: within one grid pitch of the exact percentile, any partitioning") {
    val s = spark
    import s.implicits._
    val rows = (1 to 2000).map(i => ("g", (i % 997).toDouble))
    val exactP50 = 498.0 // median of 0..996 cycle over 2000 draws, approx
    for (parts <- Seq(1, 11)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = Sketches.histQuantile(df, "v", "g", 0.0, 1000.0, 500, Seq(0.5))
        .select("est").head().getDouble(0)
      assert(math.abs(got - exactP50) <= 2.0 + 1e-9, s"parts=$parts got=$got")
    }
    // clamp: out-of-range values land in the edge buckets, not out of bounds
    val wild = Seq(("g", -50.0), ("g", 1e9), ("g", 5.0)).toDF("g", "v")
    val est = Sketches.histQuantile(wild, "v", "g", 0.0, 10.0, 10, Seq(0.5))
      .select("est").head().getDouble(0)
    assert(est >= 0.0 && est <= 10.0)
  }

  test("bounded_set: property — equals sorted-distinct when |set| <= cap, null otherwise") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    graft.functions.BoundedSetAgg.register(s)
    val gen = for {
      xs <- Gen.listOfN(60, Gen.choose(-20L, 20L)) // duplicates + negatives likely
      cap <- Gen.choose(1, 30)
      parts <- Gen.oneOf(1, 3, 9)
    } yield (xs, cap, parts)
    val prop = Prop.forAllNoShrink(gen) { case (xs, cap, parts) =>
      val got = Option(xs.toDF("v").repartition(parts)
        .agg(expr(s"bounded_set(v, $cap)")).head().get(0))
        .map(_.asInstanceOf[scala.collection.Seq[Long]].toList)
      val distinct = xs.distinct.sorted
      if (distinct.size <= cap) got.contains(distinct) else got.isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("kmv_sketch_full: below saturation the union algebra recovers exact set sizes") {
    val s = spark
    import s.implicits._
    graft.functions.KmvSketch.register(s)
    // A = {1..20}, B = {11..30}: union 30, intersection 10 — all below k=64,
    // so the q_kmv_intersect estimator must be EXACT here
    val df = ((1L to 20L).map(("a", _)) ++ (11L to 30L).map(("b", _))).toDF("g", "h")
    val sk = df.groupBy("g").agg(org.apache.spark.sql.functions.expr("kmv_sketch_full(h, 64)").as("sk"))
    val m = sk.collect().map(r => r.getString(0) -> r.getStruct(1).getSeq[Long](2)).toMap
    val union = (m("a") ++ m("b")).distinct.sorted.take(64)
    val rho = union.count(x => m("a").contains(x) && m("b").contains(x)).toDouble / union.size
    assert(union.size == 30)
    assert(rho * union.size == 10.0)
  }

  test("top_min_pairs: equals the row_number window cut, any partitioning") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = spark
    import s.implicits._
    graft.functions.TopMinPairs.register(s)
    // duplicate values likely (ties broken by id), several groups, ids unique
    // within a group (the shortlist contract: one ADC row per (query, cand))
    val gen = for {
      n <- Gen.choose(1, 120)
      vals <- Gen.listOfN(n, Gen.choose(0L, 15L))
      m <- Gen.choose(1, 12)
      parts <- Gen.oneOf(1, 3, 9)
    } yield (vals.zipWithIndex.map { case (v, i) => (i % 4, v.toDouble, i.toLong) }, m, parts)
    val prop = Prop.forAllNoShrink(gen) { case (rows, m, parts) =>
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = df.groupBy("g")
        .agg(expr(s"top_min_pairs(v, id, $m)").as("s"))
        .select(col("g"), explode(col("s.id")).as("id"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sorted.take(m).map { case (_, id) => (g, id) }
      }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("top_min_pairs: output order is (value asc, id asc); nulls skipped") {
    val s = spark
    import s.implicits._
    graft.functions.TopMinPairs.register(s)
    val df = Seq[(Option[Double], Option[Long])](
      (Some(2.0), Some(7L)), (Some(1.0), Some(9L)), (Some(2.0), Some(3L)),
      (None, Some(1L)), (Some(0.5), None), (Some(3.0), Some(1L)))
      .toDF("v", "id")
    val got = df.agg(expr("top_min_pairs(v, id, 3)")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got == Seq((9L, 1.0), (3L, 2.0), (7L, 2.0)))
  }

  test("top_min_pairs: NaN ranks greater than every real value (ADVICE r12)") {
    // java.lang.Double.compare ordering: NaN must never evict a real pair
    // from a full buffer, and must be kept (last) only while slots remain —
    // matching Spark's SQL ordering for the row_number window this
    // aggregate replaces. Exercised directly on the buffer (the SQL call
    // sites guard NaN out) plus through the full-buffer eviction path.
    val b = new graft.functions.TopMinBuffer(3)
    b.add(Double.NaN, 1L)   // empty buffer: NaN admitted while space remains
    b.add(2.0, 2L)
    b.add(1.0, 3L)
    assert(b.size == 3 && b.vals(2).isNaN) // NaN sits LAST, not first
    b.add(3.0, 4L)                          // real value evicts the NaN
    assert((0 until 3).map(b.vals) == Seq(1.0, 2.0, 3.0))
    b.add(Double.NaN, 5L)                   // full buffer: NaN rejected
    assert((0 until 3).map(b.vals) == Seq(1.0, 2.0, 3.0))
    // -0.0 orders before 0.0 (Double.compare), ties then break by id
    val c = new graft.functions.TopMinBuffer(2)
    c.add(0.0, 1L); c.add(-0.0, 2L)
    assert(java.lang.Double.compare(c.vals(0), -0.0) == 0 && c.ids(0) == 2L)
  }

  test("top_min_pairs: non-literal m reports the literal problem, not arity") {
    val s = spark
    import s.implicits._
    graft.functions.TopMinPairs.register(s)
    val df = Seq((1.0, 1L)).toDF("v", "id")
    val e = intercept[Exception] {
      df.agg(expr("top_min_pairs(v, id, 200L)")).collect()
    }
    assert(e.getMessage.contains("m must be an INT literal"), e.getMessage)
  }
}
