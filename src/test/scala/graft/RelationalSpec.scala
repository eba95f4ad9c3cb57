package graft

/** Smoke + invariants for the oracle-checked query suite at sf0.001 (the
  * decisive equivalence check is tools/selfcheck.py against DuckDB).
  */
class RelationalSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("every query runs and returns rows; oracle coverage complete") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // full oracle coverage: even the sequential stateful fold is
    // hash-checked (recursive-CTE replay, Stateful.statefulOracleSql).
    // The ONLY sanctioned exception is the BPE trainer — an iterative
    // argmax loop no SQL can express; it is pinned by BpeSpec's
    // serial-reference equivalence instead. Anything else oracle-less
    // is a regression.
    assert(SparkEntry.all.filter(_.oracle.isEmpty).map(_.name) == Seq("q_bpe_tokens"),
      s"oracle-less: ${SparkEntry.all.filter(_.oracle.isEmpty).map(_.name)}")
    SparkEntry.all.foreach { q =>
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship returns labeled rows") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("label"))
    assert(df.count() > 0)
  }

  test("q_agg_ucl: one row per user, ucl >= mean is implied by sd >= 0") {
    val df = SparkEntry.queries("q_agg_ucl")(spark, dir)
    val users = Tables(spark, dir, "events").select("user_id").distinct().count()
    assert(df.count() == users)
    assert(df.filter("n_used > 10 OR n_used < 1").count() == 0)
  }

  test("q_fraud_rules labels are exhaustive and from the fixed set") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("q_fraud_rules")(spark, dir)
    assert(df.filter(!col("label").isin("FRAUD", "GENUINE")).count() == 0)
    assert(df.count() == Tables(spark, dir, "events").count())
  }
}
