package graft

import graft.operators.TextAnalysis
import graft.streaming.CorpusStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch↔speed-layer agreement for the KN perplexity filter: the frozen
  * [[TextAnalysis.KnModel]] scoring a stream must produce BIT-IDENTICAL
  * per-doc avg_nll to the distributed [[TextAnalysis.knScore]] over the
  * same corpus, the gate must drop exactly the docs above threshold, and
  * no-bigram docs must abstain (pass with null score).
  */
class KnStreamSpec extends SparkSuite {

  private val corpus: Seq[(Long, String)] = Seq(
    0L -> "fast scan beats slow scan on wide table",
    2L -> "join on key then filter then scan",
    4L -> "slow filter on wide key beats join",
    6L -> "scan then join on key on key",
    8L -> "fast join beats slow filter",
    1L -> "slow join on wide table",
    3L -> "late scan then fast join",
    5L -> "zzz qqq zzz fast scan",
    7L -> "key on key on key",
  )

  private def corpusDf = {
    val s = spark
    import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("frozen model scores equal the distributed knScore output bit-for-bit") {
    val model = TextAnalysis.knModel(corpusDf, "text", col("doc_id") % 2 === 0)
    val batch = TextAnalysis.knScore(corpusDf, "doc_id", "text",
        col("doc_id") % 2 === 0)
      .select("doc_id", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, text) =>
      assert(model.avgNll(text) == Some(batch(id)), s"doc $id")
    }
  }

  test("streaming gate drops high-perplexity docs, abstains on no-bigram docs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = TextAnalysis.knModel(corpusDf, "text", col("doc_id") % 2 === 0)
    // threshold = midpoint of the corpus's own score range: some docs
    // pass, some drop — both branches exercised
    val scores = corpus.map { case (_, t) => model.avgNll(t).get }
    val cut = (scores.min + scores.max) / 2
    val input = MemoryStream[String]
    val gated = CorpusStream.perplexityGate(
      CorpusStream.ingest(input.toDF().toDF("value"), minWords = 1), model, cut)
    val q = gated.writeStream.format("memory").queryName("kn_gate_out")
      .outputMode(OutputMode.Append).start()
    try {
      corpus.foreach { case (id, t) =>
        input.addData(s"""{"doc_id": $id, "text": "$t", "source": "web"}""")
      }
      input.addData("""{"doc_id": 99, "text": "lonely", "source": "web"}""")
      q.processAllAvailable()
      val got = spark.table("kn_gate_out")
        .select("doc_id", "avg_nll").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val expected = corpus.filter { case (_, t) => model.avgNll(t).get <= cut }
      assert(got.keySet == expected.map(_._1).toSet + 99L)
      expected.foreach { case (id, t) =>
        assert(got(id) == model.avgNll(t), s"doc $id")
      }
      assert(got(99L).isEmpty) // no bigram → null score, passed the gate
    } finally q.stop()
  }

  test("knModel refuses to collect past the type cap") {
    intercept[IllegalArgumentException] {
      TextAnalysis.knModel(corpusDf, "text", lit(true), maxTypes = 3)
    }
  }
}
