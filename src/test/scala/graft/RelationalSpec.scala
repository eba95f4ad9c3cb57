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
    // A query may carry its oracle either statically (`oracle`) or as a
    // verify-time generator (`oracleGen` — fixture-derived constants
    // embedded as literals; the driver hash-checks those identically).
    // NO query may lack both, and the generator list is pinned so a new
    // oracle-less query can't hide behind it.
    val noOracle = SparkEntry.all
      .filter(q => q.oracle.isEmpty && q.oracleGen.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries with NO oracle of either kind: $noOracle")
    val generated = SparkEntry.all.filter(_.oracleGen.isDefined).map(_.name).sorted
    // r15 additions: q_ktruss (unroll depth = engine-derived peel-round
    // count) and q_msf (unroll depth = ceil(log2(|customer|+|supplier|)),
    // ADVICE r15)
    assert(generated == Seq("q_ann_ivfpq", "q_bpe_tokens", "q_ktruss", "q_msf"),
      s"verify-time-generated oracles changed: $generated")
    assert(SparkEntry.all.forall(q => q.oracle.isEmpty || q.oracleGen.isEmpty),
      "a query must not carry both a static and a generated oracle")
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
