package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-line contract: the harness tail-captures only the last
  * 2000 chars of stdout, so the emitted JSON line must always fit
  * Bench.MaxLine regardless of how many queries the suite grows to. */
class BenchJsonSpec extends AnyFunSuite {

  private def parseable(s: String): Unit = {
    // Minimal structural check without a JSON lib on the classpath:
    // balanced braces, expected header keys, no raw doubles (ms rounding).
    assert(s.startsWith("""{"metric":"total","value":"""))
    assert(s.endsWith("""}"""))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.contains(""","unit":"sec","failures":"""))
    assert(s.contains(""","queries":{"""))
    assert(s.contains(""","sf":""""))
  }

  test("small suite renders fully, millisecond precision") {
    val r = Seq("q_a" -> 0.1234567, "q_b" -> 2.0, "q_c" -> 0.0004)
    val s = Bench.renderJson(r, "/root/testdata/sf0.1")
    parseable(s)
    assert(s.contains("\"q_a\":0.123"))
    assert(s.contains("\"q_b\":2.000"))
    assert(s.contains("\"q_c\":0.000"))
    assert(s.contains("\"value\":2.124"))
    assert(!s.contains("other"))
    assert(s.length <= Bench.MaxLine)
  }

  test("the real suite's names always render within budget") {
    // The actual registered query names with plausible times: the line must
    // fit the tail budget no matter how the suite grows (an "other" bucket
    // is acceptable degradation; an oversized line is not).
    val names = SparkEntry.queries.keys.toSeq.sorted
    val r = names.zipWithIndex.map { case (k, i) => k -> (0.1 + i * 0.05) }
    val s = Bench.renderJson(r, "/root/testdata/sf0.1")
    parseable(s)
    assert(s.length <= Bench.MaxLine, s"len=${s.length}")
  }

  test("oversized suite folds smallest entries into other, keeps slowest") {
    val r = (1 to 400).map(i => f"q_very_long_query_name_$i%03d" -> i * 0.01)
    val s = Bench.renderJson(r, "/root/testdata/sf0.1")
    parseable(s)
    assert(s.length <= Bench.MaxLine, s"len=${s.length}")
    assert(s.contains("\"other\":"))
    // slowest survives as a named entry
    assert(s.contains("\"q_very_long_query_name_400\":4.000"))
    // total still reflects every query
    val total = r.map(_._2).sum
    assert(s.contains(s""""value":${"%.3f".format(total)}"""))
  }

  test("empty suite renders a valid line") {
    val s = Bench.renderJson(Seq.empty, "/x")
    parseable(s)
    assert(s.contains(""""queries":{}"""))
  }

  test("failure count surfaces in the line; default is zero") {
    assert(Bench.renderJson(Seq("q_a" -> 1.0), "/x").contains(""""failures":0"""))
    assert(Bench.renderJson(Seq("q_a" -> 1.0), "/x", failures = 2)
      .contains(""""failures":2"""))
  }

  test("calibration constant surfaces in the line; default is zero") {
    assert(Bench.renderJson(Seq("q_a" -> 1.0), "/x")
      .contains(""""calibration_sec":0.000"""))
    val s = Bench.renderJson(Seq("q_a" -> 1.0), "/x", calibration = 1.2345)
    parseable(s)
    assert(s.contains(""""calibration_sec":1.234""") || s.contains(""""calibration_sec":1.235"""))
  }

  test("cpu calibration constant surfaces alongside the shuffle one") {
    val s = Bench.renderJson(Seq("q_a" -> 1.0), "/x", calibration = 0.5,
      calibrationCpu = 0.321)
    parseable(s)
    assert(s.contains(""""calibration_sec":0.500"""))
    assert(s.contains(""""calibration_cpu_sec":0.321"""))
  }

  test("zipf block renders [min,max], stays out of total, and fits the budget") {
    val zipf = Seq("q_setsim_prefix" -> Seq(3.21, 3.9),
      "q_edit_threshold" -> Seq(1.8, 1.5), "q_broken" -> Seq.empty[Double])
    val s = Bench.renderJson(Seq("q_a" -> 1.0), "/x", zipf = zipf)
    parseable(s)
    assert(s.contains(
      // failed-query sentinel is [] — same as the raw-times dump's
      // (ADVICE r15 aligned the two emitters)
      ""","zipf":{"q_setsim_prefix":[3.210,3.900],"q_edit_threshold":[1.500,1.800],"q_broken":[]}"""))
    assert(s.contains(""""value":1.000""")) // zipf rows excluded from total
    // no zipf given -> no block at all (older-round parsers see the old shape)
    assert(!Bench.renderJson(Seq("q_a" -> 1.0), "/x").contains("zipf"))
    // the real suite + the real zipf family still fits MaxLine
    val names = SparkEntry.queries.keys.toSeq.sorted
    val r = names.zipWithIndex.map { case (k, i) => k -> (0.1 + i * 0.05) }
    val zfull = Seq("q_setsim_prefix", "q_setsim_topk", "q_dedup_minhash",
      "q_dedup_simhash", "q_edit_threshold", "q_hybrid_rrf", "q_hybrid_rrf_capped",
      "q_hybrid_rrf_lsh", "q_similarity_lsh", "q_ann_ivfpq", "q_triangles",
      "q_pagerank", "q_kcore", "q_label_prop", "q_clustering_coef", "q_hits",
      "q_link_predict", "q_coreness", "q_conductance", "q_ktruss")
      .map(_ -> Seq(123.456, 200.0))
    val full = Bench.renderJson(r, "/root/testdata/sf0.1", zipf = zfull)
    parseable(full)
    assert(full.length <= Bench.MaxLine, s"len=${full.length}")
    zfull.foreach { case (k, _) =>
      assert(full.contains("\"" + k + "\":[123.456,200.000]")) }
  }

  test("stream block renders verbatim, stays out of total, absent by default") {
    val block = ""","stream":{"snap_dedup_docs_per_sec":1252.000,"batch_sec_p50":0.770,"state_rows":5000,"state_bytes":1048576}"""
    val s = Bench.renderJson(Seq("q_a" -> 1.0), "/x",
      zipf = Seq("q_setsim_prefix" -> Seq(2.0)), streamBlock = block)
    parseable(s)
    assert(s.contains(block))
    assert(s.contains(""""value":1.000""")) // stream row excluded from total
    assert(!Bench.renderJson(Seq("q_a" -> 1.0), "/x").contains("stream"))
  }

  test("zipf rep schedule is pass-major: full family sweep between a row's reps") {
    // VERDICT r15 #1: back-to-back per-row reps let one box-level contention
    // episode depress BOTH reps of a row and survive the min (the recurring
    // r13/r14/r15 adjudication class). Pass-major order separates a row's
    // reps by a full family sweep.
    val fam = Seq("q_x", "q_y", "q_z")
    val sched = Bench.zipfSchedule(fam, 2)
    assert(sched == Seq("q_x" -> 1, "q_y" -> 1, "q_z" -> 1,
      "q_x" -> 2, "q_y" -> 2, "q_z" -> 2))
    // every row gets exactly `reps` runs, and consecutive entries never
    // repeat a name (for families of size >= 2)
    assert(sched.groupBy(_._1).values.forall(_.size == 2))
    assert(sched.sliding(2).forall(w => w.size < 2 || w(0)._1 != w(1)._1))
    // minimum separation between a row's two reps = family size
    fam.foreach { n =>
      val idx = sched.zipWithIndex.collect { case ((`n`, _), i) => i }
      assert(idx(1) - idx(0) == fam.size)
    }
  }

  test("flaky count surfaces in the line; default is zero") {
    // a query that crashed in one rep but succeeded in another must not be
    // invisible: failures stays 0 (its min is a real success) but flaky > 0
    assert(Bench.renderJson(Seq("q_a" -> 1.0), "/x").contains(""""flaky":0"""))
    assert(Bench.renderJson(Seq("q_a" -> 1.0), "/x", failures = 0, flaky = 1)
      .contains(""""failures":0,"flaky":1"""))
  }
}
