package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus preparation flow a 100 TB pre-training pipeline
  * runs, composed from the oracle-checked operators:
  *
  *   1. PII scrub ([[TextAnalysis.scrubPii]]) — map-side redaction;
  *   2. near-dup dedup with survivor policy ([[Dedup.dedupKeep]]) — keep
  *      the best-quality member of each cluster;
  *   3. per-source quality quota ([[TextAnalysis.domainQuota]]) — corpus
  *      balancing so no domain dominates;
  *   4. token-budget shard packing ([[TextAnalysis.shardPack]]) — the
  *      training-shard layout, per source.
  *
  * Each stage is one declarative transform over the previous frame —
  * Catalyst sees the whole composition, so filters from later stages push
  * into earlier ones where legal and nothing materializes between stages
  * unless the caller persists. Every underlying operator carries its own
  * DuckDB-oracle query; this composition is pinned by CorpusPipelineSpec.
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
    val scrubbed = TextAnalysis.scrubPii(docs, idCol, textCol)
      .select(col("doc_id"), col("scrubbed"))
    val kept = Dedup.dedupKeep(docs, idCol, textCol, sourceCol, qualityCol, maxHamming)
      .filter(col("keep"))
      .select("doc_id")
    val quota = TextAnalysis.domainQuota(docs, idCol, sourceCol, qualityCol, quotaPerSource)
      .filter(col("kept"))
      .select("doc_id", "source")
    // survivors = dedup-kept ∩ within-quota; then pack the survivor set
    val survivors = kept.join(quota, "doc_id")
      .join(scrubbed, "doc_id")
    val packed = TextAnalysis.shardPack(
      survivors.select(col("doc_id").as("__id"), col("scrubbed"), col("source")),
      "__id", "scrubbed", "source", shardBudgetTokens)
    survivors
      .join(packed.select("doc_id", "tokens", "shard_id", "shard_offset"), "doc_id")
      .select(col("doc_id"), col("source"), col("scrubbed").as("text_scrubbed"),
        col("tokens"), col("shard_id"), col("shard_offset"))
  }
}
