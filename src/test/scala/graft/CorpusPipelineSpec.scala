package graft

import graft.operators.{CorpusPipeline, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** The composed corpus-preparation flow: survivors are unique, deduped,
  * within quota, scrubbed, and shard assignments respect the token budget.
  */
class CorpusPipelineSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("prepare: unique survivors, dedup+quota respected, shards packed") {
    val docs = Tables(spark, dir, "documents")
    val out = CorpusPipeline.prepare(docs, quotaPerSource = 10,
      shardBudgetTokens = 500L).cache()

    val n = out.count()
    assert(n > 0)
    // one row per surviving doc
    assert(out.select("doc_id").distinct().count() == n)
    // every survivor is a dedup keeper
    val keepers = Dedup.dedupKeep(docs, "doc_id", "text", "source", "n_chars", 3)
      .filter(col("keep")).select("doc_id")
    assert(out.select("doc_id").except(keepers).count() == 0)
    // per-source quota honored
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 10))
    // scrubbed column carries no unredacted long digit runs
    assert(out.filter(col("text_scrubbed").rlike("[0-9]{6,}")).count() == 0)
    // shard offsets stay under the budget
    assert(out.filter(col("shard_offset") < 0 || col("shard_offset") >= 500).count() == 0)
    // shard ids contiguous from 0 per source
    val maxShard = out.groupBy("source").agg(max("shard_id").as("m"),
      countDistinct("shard_id").as("d")).collect()
    assert(maxShard.forall(r => r.getLong(1) == r.getLong(2) - 1))
  }

  test("prepare composes the same survivors as applying the stages sequentially") {
    val docs = Tables(spark, dir, "documents")
    val out = CorpusPipeline.prepare(docs, quotaPerSource = 10, shardBudgetTokens = 500L)
    val expected = {
      val k = Dedup.dedupKeep(docs, "doc_id", "text", "source", "n_chars", 3)
        .filter(col("keep")).select("doc_id")
      // quota ranks the DEDUPED frame (sequential semantics)
      val deduped = docs.join(k, "doc_id")
      TextAnalysis.domainQuota(deduped, "doc_id", "source", "n_chars", 10)
        .filter(col("kept")).select("doc_id")
    }
    assert(out.select("doc_id").except(expected).count() == 0)
    assert(expected.except(out.select("doc_id")).count() == 0)
  }
}
