package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus preparation flow a 100 TB pre-training pipeline
  * runs, composed from the oracle-checked operators, applied SEQUENTIALLY
  * (each stage consumes the previous stage's survivors):
  *
  *   1. near-dup dedup with survivor policy ([[Dedup.dedupKeep]]) — keep
  *      the best-quality member of each cluster;
  *   2. per-source quality quota ([[TextAnalysis.domainQuota]]) over the
  *      DEDUPED frame — corpus balancing; ranking before dedup would let
  *      near-dup losers occupy quota slots;
  *   3. PII scrub ([[TextAnalysis.scrubPii]]) — map-side redaction of the
  *      survivors;
  *   4. token-budget shard packing (the [[TextAnalysis.shardPack]] window,
  *      computed in place on the survivor frame — no join-back, so the
  *      clustering subtree is planned exactly once).
  *
  * Every underlying operator carries its own DuckDB-oracle query; the
  * composition (order, survivor sets, budget discipline) is pinned by
  * CorpusPipelineSpec.
  *
  * Output: one row per SURVIVING document —
  * (doc_id, source, text_scrubbed, tokens, shard_id, shard_offset).
  */
object CorpusPipeline {

  def prepare(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      qualityCol: String = "n_chars",
      maxHamming: Int = 3,
      quotaPerSource: Int = 1000,
      shardBudgetTokens: Long = 100000L,
  ): DataFrame = {
    // stage 2 first: dedup the raw corpus; the quota stage must rank the
    // DEDUPED frame, or near-dup losers would occupy quota slots and
    // dup-heavy sources would land far below quotaPerSource
    val keepIds = Dedup.dedupKeep(docs, idCol, textCol, sourceCol, qualityCol, maxHamming)
      .filter(col("keep"))
      .select("doc_id")
    val deduped = docs.join(keepIds, docs(idCol) === keepIds("doc_id"))
      .drop(keepIds("doc_id"))
    // stage 3: per-source quality quota over the deduped survivors
    val quotaIds = TextAnalysis.domainQuota(deduped, idCol, sourceCol, qualityCol, quotaPerSource)
      .filter(col("kept"))
      .select("doc_id")
    val survivors = deduped.join(quotaIds, deduped(idCol) === quotaIds("doc_id"))
      .drop(quotaIds("doc_id"))
    // stages 1 + 4 in place on the survivor frame (scrub columns + one
    // partitioned running-sum window — no join-back, so the dedup/cluster
    // subtree is planned exactly once)
    val scrubbed = TextAnalysis.scrubPii(survivors, idCol, textCol)
      .join(survivors.select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source")),
        "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    scrubbed
      .withColumn("tokens", size(split(col("scrubbed"), " ")).cast("long"))
      .withColumn("__cum", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("scrubbed").as("text_scrubbed"),
        col("tokens"),
        expr(s"__cum div $shardBudgetTokens").as("shard_id"),
        (col("__cum") - expr(s"__cum div $shardBudgetTokens") * lit(shardBudgetTokens))
          .as("shard_offset"))
  }
}
