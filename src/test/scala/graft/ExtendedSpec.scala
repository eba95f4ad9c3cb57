package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the round-2 Extended/analytics queries at
  * sf0.001 (exact cross-engine equality is pinned by the DuckDB oracle
  * gate; these pin properties that must hold on ANY corpus).
  */
class ExtendedSpec extends SparkSuite {

  private val dir = sf("sf0.001")
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("cube: marker bits match null pattern; grand total row aggregates everything") {
    val rows = q("q_cube").collect()
    rows.foreach { r =>
      assert((r.getByte(2) == 1) == r.isNullAt(0), s"g_flag vs l_returnflag: $r")
      assert((r.getByte(3) == 1) == r.isNullAt(1), s"g_status vs l_linestatus: $r")
    }
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length == 1)
    assert(total.head.getLong(4) == Tables(spark, dir, "lineitem").count())
  }

  test("grouping sets: each row belongs to exactly one set") {
    q("q_grouping_sets").collect().foreach { r =>
      assert(r.isNullAt(0) != r.isNullAt(1), s"exactly one grouping column null: $r")
    }
  }

  test("range join: bands partition the covered price domain") {
    val banded = q("q_range_join")
    val inBands = banded.agg(sum("n_lines")).head().getLong(0)
    val covered = Tables(spark, dir, "lineitem")
      .filter(col("l_extendedprice") >= 0 && col("l_extendedprice") < 110000).count()
    assert(inBands == covered) // disjoint half-open bands: every covered row once
  }

  test("subqueries: EXISTS filter implies at least one order per kept customer") {
    assert(q("q_subqueries").filter(col("n_orders") < 1).count() == 0)
  }

  test("json fns: nested extraction round-trips the payload k; array index hits") {
    val bad = q("q_json_fns")
      .filter(col("k") =!= col("k_nested") || col("tag1") =!= 20)
    assert(bad.count() == 0)
  }

  test("funnel: depth is 1 + clicked + purchased; flags are 0/1; purchase implies click path kept") {
    val f = q("q_funnel")
    assert(f.filter(col("funnel_depth") =!= lit(1) + col("clicked") + col("purchased")).count() == 0)
    assert(f.filter(!col("clicked").isin(0, 1) || !col("purchased").isin(0, 1)).count() == 0)
    assert(f.filter(col("purchased") === 1 && col("clicked") === 0).count() == 0)
  }

  test("hash sample: stable fraction near 10% and deterministic across runs") {
    val n = Tables(spark, dir, "events").count().toDouble
    val s1 = q("q_hash_sample").collect().map(_.getLong(0)).toSeq
    val s2 = q("q_hash_sample").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
    assert(s1.length / n > 0.04 && s1.length / n < 0.18, s"${s1.length} of $n")
  }

  test("window dist: percent_rank in [0,1], cume_dist in (0,1]") {
    val w = q("q_window_dist")
    assert(w.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    assert(w.filter(col("cume") <= 0 || col("cume") > 1).count() == 0)
  }

  test("unpivot: two rows per user, totals preserved") {
    val u = q("q_unpivot")
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(u.count() == 2 * users)
    val purchases = Tables(spark, dir, "events").filter(col("event_type") === "purchase").count()
    assert(u.filter(col("metric") === "purchases").agg(sum("n")).head().getLong(0) == purchases)
  }

  test("minmax_by: extreme events exist and bracket each user's values") {
    val e = Tables(spark, dir, "events").select(col("event_id"), col("value"))
    val m = q("q_minmax_by")
    val joined = m
      .join(e.withColumnRenamed("event_id", "top_event").withColumnRenamed("value", "vt"), "top_event")
      .join(e.withColumnRenamed("event_id", "bottom_event").withColumnRenamed("value", "vb"), "bottom_event")
    assert(joined.filter(col("vt") < col("vb")).count() == 0)
    assert(joined.count() == m.count()) // every picked event id resolves
  }

  test("date spine: contiguous days per user, zero-filled, totals preserved") {
    val s_ = spark
    import s_.implicits._
    val ds = q("q_date_spine")
    val perUser = ds.groupBy("user_id")
      .agg(count(lit(1)).as("days"), min("day_str").as("d0"), max("day_str").as("d1"),
        sum("n").as("events"))
    val bad = perUser.filter(
      datediff(to_date(col("d1")), to_date(col("d0"))) + 1 =!= col("days"))
    assert(bad.count() == 0) // no gaps: day count == span
    val totalEvents = Tables(spark, dir, "events").count()
    assert(perUser.agg(sum("events")).head().getLong(0) == totalEvents)
  }

  test("string agg: n_types equals the csv cardinality, entries sorted") {
    val rows = q("q_string_agg").collect()
    rows.foreach { r =>
      val parts = r.getString(1).split(",").toSeq
      assert(parts.length.toLong == r.getLong(2))
      assert(parts == parts.sorted)
    }
  }

  test("tfidf: at most 3 ranked terms per doc, scores positive and non-increasing") {
    val t = q("q_tfidf")
    assert(t.filter(col("rn") > 3 || col("rn") < 1).count() == 0)
    assert(t.filter(col("score") <= 0).count() == 0)
    val s_ = spark
    import s_.implicits._
    val nonMono = t.groupBy("doc_id")
      .agg(collect_list(struct(col("rn"), col("score"))).as("l"))
      .as[(Long, Seq[(Int, Double)])]
      .filter { case (_, l) =>
        val sorted = l.sortBy(_._1).map(_._2)
        sorted.zip(sorted.drop(1)).exists { case (a, b) => a < b }
      }
    assert(nonMono.count() == 0)
  }

  test("rolling hash: values within the modulus; order sensitivity") {
    val mod = 2147483647L
    assert(q("q_rolling_hash").filter(col("rh") < 0 || col("rh") >= mod).count() == 0)
    val s_ = spark
    import s_.implicits._
    // reversing word order changes the fingerprint (the point vs q_fingerprint)
    val two = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    two.createOrReplaceTempView("ext_rh_docs")
    val vals = graft.functions.TextFunctions.rollingHash(col("text"))
    val got = two.select(vals.as("rh")).collect().map(_.getLong(0))
    assert(got(0) != got(1))
  }

  test("containment: ratios in (0,1]; subset doc scores exactly 1.0") {
    assert(q("q_dedup_containment")
      .filter(col("containment") <= 0 || col("containment") > 1).count() == 0)
    val s_ = spark
    import s_.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "blk"),
      (2L, "b c d", "blk"), // subset of 1
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text", "source").collect()
    assert(got.length == 1 && got.head.getDouble(2) == 1.0)
  }

  test("data quality: clean fixture audits clean; counts consistent") {
    val r = q("q_data_quality").head()
    val n = Tables(spark, dir, "lineitem").count()
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == 0 && r.getLong(2) == 0) // no null keys/quantities
    assert(r.getLong(6) <= n) // distinct orders bounded by rows
  }

  test("clusters: canonical is a component member with canonical==self; sizes consistent") {
    val c = q("q_dedup_clusters")
    assert(c.filter(col("canonical_id") > col("doc_id")).count() == 0)
    val canon = c.select(col("canonical_id").as("doc_id")).distinct()
    val selfRows = c.join(canon, "doc_id")
    assert(selfRows.filter(col("canonical_id") =!= col("doc_id")).count() == 0)
    val sizes = c.groupBy("canonical_id").count()
    val bad = c.join(sizes, "canonical_id").filter(col("cluster_size") =!= col("count"))
    assert(bad.count() == 0)
  }
}
