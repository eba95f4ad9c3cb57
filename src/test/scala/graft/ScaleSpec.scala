package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Scale primitives: bucketed join is shuffle-free (plan-asserted), salted
  * join/aggregation equal their unsalted forms, partitioned writes prune.
  */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed co-located join has no shuffle exchange in the final plan") {
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables(spark, sf("sf0.001"), "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // unique names: the managed-table location in /tmp/graft-warehouse
    // survives across JVMs while the in-memory catalog does not
    val tag = System.nanoTime()
    val tLi = s"b_lineitem_$tag"
    val tOrd = s"b_orders_$tag"
    Scale.writeBucketed(li, tLi, "l_orderkey", 4)
    Scale.writeBucketed(ord, tOrd, "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table(tLi).join(spark.table(tOrd), "l_orderkey")
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      // cross-check against the plain join
      val plain = li.join(ord, "l_orderkey").count()
      assert(n == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("AQE OptimizeSkewedJoin splits the hot partition of a skewed sort-merge join") {
    // one key holds ~95% of the fact rows; with the skew thresholds
    // lowered to fixture scale, AQE must re-plan the sort-merge join
    // with the hot partition SPLIT (isSkewJoin=true in the final
    // adaptive plan) — the runtime half of the skew story, complementing
    // the explicit salting operators (which cover aggregations and
    // first-stage joins AQE can't see)
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-scale thresholds: the hot partition (~2 MB of rows) must
      // read as "skewed" against the 64 KB advisory target
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // pad must be row-dependent (a constant folds out of the join and
      // compresses to nothing in the shuffle — the hot partition's
      // COMPRESSED bytes are what the skew reader measures)
      val fact = spark.range(0, 60000).selectExpr(
        "CASE WHEN id % 20 < 19 THEN 7L ELSE id % 13 END AS k",
        "concat(md5(cast(id AS string)), md5(cast(id + 1 AS string))) AS pad")
      val dim = spark.range(0, 13).selectExpr("id AS k", "id * 2 AS v")
        // a >8-partition shuffle side so the join stays sort-merge
        .repartition(4)
      val joined = fact.join(dim, "k")
      // execute THIS frame (count() builds its own QueryExecution whose
      // adaptive plan would be left at isFinalPlan=false here)
      val n = joined.collect().length
      assert(n == 60000) // key 7 matches dim row 7; every cold key < 13 matches
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the SMJ, got:\n$plan")
      assert(plan.contains("AQEShuffleRead skewed"),
        s"expected the hot side read as skewed splits, got:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of rows share one hot key — the salting target
    val big = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L)).as("k"), $"id".as("payload"))
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag")
    val salted = Scale.saltedJoin(big, small, "k", saltFactor = 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    val a = salted.groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = plain.groupBy("tag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("salted distinct count equals plain distinct count") {
    val df = spark.range(5000)
      .select(($"id" % 3).as("k"), ($"id" % 97).as("v"))
    val got = Scale.saltedDistinctCount(df, "k", "v", saltFactor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("partitioned write prunes: filter on partition col reads one directory") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val e = Tables(spark, sf("sf0.001"), "events")
      .withColumn("day", to_date($"ts"))
    Scale.writePartitioned(e, out, Seq("day"))
    val back = spark.read.parquet(out)
    val oneDay = back.filter($"day" === back.select(min("day")).head().getDate(0))
    val n = oneDay.count()
    assert(n > 0 && n < e.count())
    // partition pruning shows up as a PartitionFilters entry in the scan
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan.take(500))
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/events"
    val e = Tables(spark, sf("sf0.001"), "events")
      .withColumn("day", to_date($"ts"))
    Scale.writePartitioned(e, out, Seq("day"))
    val fact = spark.read.parquet(out)
    // an INDEPENDENT parquet dim tagging the 3 earliest days "keep": the
    // day restriction reaches the fact only through the join, so static
    // pruning can't see it, and the dim-side `tag = 'keep'` filter is the
    // selective predicate Spark's DPP heuristic requires before it
    // injects the dim's day set into the fact scan at runtime
    val keep3 = fact.select($"day").distinct().orderBy($"day").limit(3)
      .collect().map(_.getDate(0).toString).toSet
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/days"
    fact.select($"day").distinct()
      .withColumn("tag", when($"day".cast("string").isin(keep3.toSeq: _*), "keep")
        .otherwise("skip"))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"tag" === "keep")
    val joined = fact.join(dim, Seq("day"))
    val n = joined.count()
    assert(n > 0 && n < fact.count())
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "expected a dynamic partition pruning filter on the fact scan:\n" + plan.take(1200))
    // pruning must be result-invisible: same count as the join planned
    // without a broadcast to reuse (merge hint -> no DPP-over-broadcast)
    val expected = fact.join(dim.hint("merge"), Seq("day")).count()
    assert(n == expected)
  }

  test("chunked prefix sums property: any chunk width equals the serial window") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val gen = for {
      n <- Gen.choose(1, 80)
      k <- Gen.choose(1, 4)
      width <- Gen.oneOf(1L, 2L, 7L, 1000L) // per-row chunks ... one chunk
      vals <- Gen.listOfN(n, Gen.oneOf(-3.5, -1.0, 0.0, 0.25, 2.0, 10.0))
      keys <- Gen.listOfN(n, Gen.choose(0, k - 1))
    } yield (width, vals.zip(keys))
    val prop = Prop.forAll(gen) { case (width, rows) =>
      val df = rows.zipWithIndex
        .map { case ((v, key), i) => (key.toLong, i.toLong, v) }
        .toDF("key", "ord", "v")
        .withColumn("q", $"v".cast(DecimalType(38, 6))).drop("v")
      val got = Scale.chunkedPrefixSums(df, "key", Seq($"ord"),
        floor($"ord" / width), Seq("run" -> $"q", "cnt" -> lit(1L)))
      val w = Window.partitionBy("key").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exp = df.withColumn("e_run", sum($"q").over(w))
        .withColumn("e_cnt", sum(lit(1L)).over(w))
      got.join(exp, Seq("key", "ord"))
        .filter($"run" =!= $"e_run" || $"cnt" =!= $"e_cnt").count() == 0 &&
        got.count() == rows.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunked prefix sums: NULL values follow the serial window's skip-null semantics") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // adversarial layout: key 0's first CHUNK is entirely null (the serial
    // window stays null through it, then starts at 7), and a later chunk's
    // in-chunk prefix is all-null while prior chunks carry a total (the
    // round-6 advice counterexample: a bare coalesce loses the carry)
    val rows = Seq(
      (0L, 0L, None), (0L, 1L, None),               // chunk 0: all null
      (0L, 2L, Some(7.0)), (0L, 3L, None),          // chunk 1: null in-chunk prefix at ord=3
      (0L, 4L, None), (0L, 5L, None),               // chunk 2: ALL null -> carry 7 through
      (0L, 6L, Some(1.5)),                          // chunk 3
      (1L, 0L, None), (1L, 1L, None), (1L, 2L, None), // key 1: never non-null -> all NULL
    )
    val df = rows.toDF("key", "ord", "v")
      .withColumn("q", $"v".cast(DecimalType(38, 6))).drop("v")
    val got = Scale.chunkedPrefixSums(df, "key", Seq($"ord"),
      floor($"ord" / 2), Seq("run" -> $"q"))
    val w = Window.partitionBy("key").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("e_run", sum($"q").over(w))
    val joined = got.join(exp, Seq("key", "ord"))
    assert(joined.count() == rows.length)
    assert(joined.filter(
      ($"run".isNull && $"e_run".isNotNull) || ($"run".isNotNull && $"e_run".isNull) ||
        ($"run" =!= $"e_run")).count() == 0,
      joined.orderBy("key", "ord").collect().mkString("\n"))
  }

  test("chunked prefix sums: null key and null chunk rows are kept, not dropped") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val df = Seq(
      (Some(0L), Some(0L), 1.0), (Some(0L), Some(3L), 2.0),
      (None, Some(1L), 5.0), (None, Some(2L), 6.0),   // null KEY: its own window partition
      (Some(0L), None, 9.0),                          // null ORD -> null chunk, sorts first
    ).toDF("key", "ord", "v")
      .withColumn("q", $"v".cast(DecimalType(38, 6))).drop("v")
    val got = Scale.chunkedPrefixSums(df, "key", Seq($"ord"),
      floor($"ord" / 2), Seq("run" -> $"q"))
    assert(got.count() == 5, "rows with null key/chunk must survive the offsets join")
    val w = Window.partitionBy("key").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("e_run", sum($"q").over(w))
    val joined = got.join(exp, got("key") <=> exp("key") && got("ord") <=> exp("ord"))
    assert(joined.count() == 5)
    assert(joined.filter($"run" =!= $"e_run").count() == 0)
  }

  test("chunked prefix sums fail fast on reserved helper column names") {
    val df = Seq((1L, 1L, 1.0)).toDF("key", "ord", "__chunk")
    val e = intercept[IllegalArgumentException](
      Scale.chunkedPrefixSums(df, "key", Seq($"ord"), floor($"ord"), Seq("s" -> $"__chunk")))
    assert(e.getMessage.contains("__chunk"))
  }

  test("distributed global row_number equals the serial unpartitioned window") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    // heavy ties on the leading column (freq-like: few distinct values)
    // plus a unique tie-break — the adversarial case for value bucketing
    val gen = for {
      n <- Gen.choose(1, 120)
      card <- Gen.oneOf(1, 2, 5, 50) // 1 = ALL rows tie on the leading col
      desc <- Gen.oneOf(true, false)
      vals <- Gen.listOfN(n, Gen.choose(0, card - 1))
    } yield (desc, vals)
    val prop = Prop.forAll(gen) { case (desc, vals) =>
      val df = vals.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) }
        .toDF("m", "id")
      val ord = if (desc) Seq($"m".desc, $"id".asc) else Seq($"m".asc, $"id".asc)
      val got = Scale.globalRowNumber(df, ord, "m", desc, "rn", buckets = 4)
      val exp = df.withColumn("e_rn",
        row_number().over(Window.orderBy(ord: _*)).cast("long"))
      got.join(exp, Seq("m", "id"))
        .filter($"rn" =!= $"e_rn").count() == 0 && got.count() == vals.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed ntile equals SQL ntile for every n mod buckets shape") {
    import org.apache.spark.sql.expressions.Window
    // n = 3 (n < B), 10 (n mod 5 = 0), 12, 14 — covers the uneven-bucket
    // boundary arithmetic and the k = 0 small-input branch
    for (n <- Seq(3, 10, 12, 14)) {
      val df = (0 until n).map(i => ((i * 7 % 5).toLong, i.toLong)).toDF("m", "id")
      val got = Scale.distributedNtile(
        df, Seq($"m".desc, $"id".asc), "m", descending = true, 5, "t")
      val exp = df.withColumn("e_t",
        ntile(5).over(Window.orderBy($"m".desc, $"id".asc)).cast("long"))
      val joined = got.join(exp, Seq("m", "id"))
      assert(joined.count() == n)
      assert(joined.filter($"t" =!= $"e_t").count() == 0,
        s"n=$n: " + joined.orderBy("e_t", "id").collect().mkString(", "))
    }
  }

  test("shared-pass multi-metric ntiles equal per-metric SQL ntile") {
    import org.apache.spark.sql.expressions.Window
    // ties on both metrics, n = 13 (odd mod), plus the n < buckets shape
    for (n <- Seq(3, 13, 40)) {
      val df = (0 until n).map(i => (i.toLong, (i * 3 % 7).toLong, (i * 5 % 4).toDouble))
        .toDF("id", "ma", "mb")
      val got = Scale.distributedNtiles(df, "id", Seq(("sa", "ma"), ("sb", "mb")), 5,
        rankBuckets = 4)
      val exp = df
        .withColumn("ea", ntile(5).over(Window.orderBy($"ma".desc, $"id".asc)).cast("long"))
        .withColumn("eb", ntile(5).over(Window.orderBy($"mb".desc, $"id".asc)).cast("long"))
      val j = got.join(exp, Seq("id", "ma", "mb"))
      assert(j.count() == n)
      assert(j.filter($"sa" =!= $"ea" || $"sb" =!= $"eb").count() == 0,
        s"n=$n: " + j.orderBy("id").collect().mkString("\n"))
    }
  }

  test("global rank and ntiles degenerate cleanly at buckets = 1 (single-partition session)") {
    import org.apache.spark.sql.expressions.Window
    // b == 1 means an EMPTY approxQuantile probability list — the guard
    // must skip the quantile job (it rejects empty probabilities) and
    // fall back to the serial one-bucket shape with identical answers
    val df = (0 until 17).map(i => (i.toLong, (i * 3 % 7).toLong)).toDF("id", "m")
    val ord = Seq($"m".desc, $"id".asc)
    val rn = Scale.globalRowNumber(df, ord, "m", descending = true, "rn", buckets = 1)
    val eRn = df.withColumn("e", row_number().over(Window.orderBy(ord: _*)).cast("long"))
    assert(rn.join(eRn, Seq("id", "m")).filter($"rn" =!= $"e").count() == 0)
    val nt = Scale.distributedNtile(df, ord, "m", descending = true, 5, "t", None)
    val eNt = df.withColumn("e", ntile(5).over(Window.orderBy(ord: _*)).cast("long"))
    assert(nt.join(eNt, Seq("id", "m")).filter($"t" =!= $"e").count() == 0)
    val nts = Scale.distributedNtiles(df, "id", Seq(("s", "m")), 5, rankBuckets = 1)
    assert(nts.join(eNt, Seq("id", "m")).filter($"s" =!= $"e").count() == 0)
  }

  test("distributed ntile fails fast on reserved helper column names") {
    val df = Seq((1L, 2L)).toDF("id", "__n")
    assertThrows[IllegalArgumentException](
      Scale.distributedNtile(df, Seq($"id".asc), "id", descending = false, 2, "t"))
  }

  test("multi-metric ntiles: null metric values rank nulls-last like SQL ntile") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, Some(5.0)), (2L, None), (3L, Some(9.0)), (4L, None),
      (5L, Some(1.0)), (6L, Some(9.0)), (7L, Some(2.0)),
    ).toDF("id", "v")
    val got = Scale.distributedNtiles(df, "id", Seq(("s", "v")), 3, rankBuckets = 4)
    val exp = df.withColumn("e",
      ntile(3).over(Window.orderBy($"v".desc, $"id".asc)).cast("long"))
    val j = got.join(exp, Seq("id"))
    assert(j.count() == 7)
    assert(j.filter($"s" =!= $"e").count() == 0,
      j.orderBy("id").collect().mkString("\n"))
  }

  test("bucketed prefix min equals the serial exclusive window, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    // one row per distinct order value (the documented contract), value
    // column with NULLs, non-monotone values so the running min actually
    // telescopes; try asc + desc and bucket counts from degenerate to
    // more-buckets-than-rows
    val df = Seq(
      (10.0, Some(7)), (9.5, None), (8.0, Some(3)), (7.25, Some(9)),
      (6.0, None), (5.5, Some(2)), (4.0, Some(8)), (3.0, Some(1)),
      (2.5, None), (1.0, Some(4)),
    ).toDF("price", "msz")
    for (desc <- Seq(true, false); b <- Seq(1, 2, 3, 7, 50)) {
      val got = Scale.bucketedPrefixMin(df, "price", desc, "msz", "mh", buckets = b)
      val ord = if (desc) $"price".desc else $"price".asc
      val exp = df.withColumn("e",
        min($"msz").over(Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)))
        .drop("msz") // null msz would make a null-unsafe join key
      val j = got.join(exp, Seq("price"))
      assert(j.count() == 10, s"desc=$desc b=$b")
      assert(j.filter(!($"mh" <=> $"e")).count() == 0,
        s"desc=$desc b=$b: " + j.orderBy("price").collect().mkString("\n"))
    }
  }

  test("bucketed prefix min property: random values and nulls equal the serial window") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.expressions.Window
    // distinct order values (the documented contract), values drawn from a
    // narrow range so the running min plateaus and restarts, ~1/4 null —
    // the adversarial cases for the least()-based null semantics
    val gen = for {
      n <- Gen.choose(1, 60)
      desc <- Gen.oneOf(true, false)
      b <- Gen.oneOf(1, 3, 8)
      vals <- Gen.listOfN(n, Gen.option(Gen.choose(0, 9)))
    } yield (desc, b, vals)
    val prop = Prop.forAll(gen) { case (desc, b, vals) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toDouble, v) }
        .toDF("price", "msz")
      val got = Scale.bucketedPrefixMin(df, "price", desc, "msz", "mh", buckets = b)
      val ord = if (desc) $"price".desc else $"price".asc
      val exp = df.withColumn("e",
        min($"msz").over(Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)))
        .drop("msz")
      val j = got.join(exp, Seq("price"))
      j.count() == vals.length && j.filter(!($"mh" <=> $"e")).count() == 0
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("bucketed prefix min fails fast on reserved helper column names") {
    val df = Seq((1.0, 2)).toDF("price", "__bkt")
    val e = intercept[IllegalArgumentException](
      Scale.bucketedPrefixMin(df, "price", descending = true, "price", "out"))
    assert(e.getMessage.contains("__bkt"))
  }

  test("chunked prefix sums equal the serial per-key window row-for-row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // pre-aggregate to a UNIQUE (flag, orderkey, linenumber) key: the
    // synthetic lineitem repeats line numbers, which would both break the
    // row-for-row join below and make the window order non-total
    val li = Tables(spark, sf("sf0.001"), "lineitem")
      .groupBy($"l_returnflag", $"l_orderkey", $"l_linenumber")
      .agg(sum($"l_quantity".cast(DecimalType(38, 6))).as("q"))
    // chunk by coarse orderkey ranges: many chunks per key, uneven sizes
    val two = Scale.chunkedPrefixSums(
      li, "l_returnflag", Seq($"l_orderkey", $"l_linenumber"),
      floor($"l_orderkey" / 500L),
      Seq("run_q" -> $"q", "run_n" -> lit(1L)))
    val w = Window.partitionBy("l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = li
      .withColumn("exp_q", sum($"q").over(w))
      .withColumn("exp_n", sum(lit(1L)).over(w))
    val joined = two.join(serial.drop("q"),
      Seq("l_returnflag", "l_orderkey", "l_linenumber"))
    assert(joined.count() == li.count())
    assert(joined.filter($"run_q" =!= $"exp_q" || $"run_n" =!= $"exp_n").count() == 0)
  }
}
