package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus ingestion — the speed-layer twin of
  * `operators.CorpusPipeline`: documents arrive as JSON lines (Kafka value
  * or file source), are content-deduped within the watermark, and pass a
  * quality gate before landing in the corpus store. Batch dedup
  * (`Dedup.exactDedup` + the near-dup family) then runs over the landed
  * data on its own cadence — the same lambda split as the fraud pipeline's
  * EP2/EP3.
  *
  * Scale notes: dedup state is keyed by content md5 and bounded by the
  * watermark horizon (`dropDuplicatesWithinWatermark` — state for a hash
  * is dropped once the watermark passes its last occurrence), so state
  * size tracks the duplicate-arrival window, not corpus size. The quality
  * gate is a codegen'd filter, map-side.
  */
object CorpusStream {

  /** JSON-lines document payload. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
  ))

  /** Decode the raw `value` column; undecodable or id-less payloads drop
    * (same policy as `FraudStream.decode`).
    */
  def decode(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast(StringType), docSchema).as("d"))
      .filter(col("d").isNotNull && col("d.doc_id").isNotNull && col("d.text").isNotNull)
      .select("d.*")

  /** Decode → watermarked exact content dedup → quality gate. The output
    * carries the quality signals as columns (`n_words`, `digit_frac`) plus
    * the content hash the dedup keyed on; attach any sink.
    *
    * @param dedupWindow how long a duplicate may trail its original and
    *        still be dropped (the dedup state horizon).
    * @param minWords minimum whitespace-token count to pass the gate.
    * @param maxDigitFrac maximum digit-character fraction to pass.
    */
  def ingest(
      raw: DataFrame,
      dedupWindow: String = "10 minutes",
      minWords: Int = 3,
      maxDigitFrac: Double = 0.5,
  ): DataFrame = {
    decode(raw)
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", dedupWindow)
      .withColumn("content_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_md5")
      .withColumn("n_words", size(split(col("text"), " ")).cast(LongType))
      .withColumn("digit_frac",
        when(length(col("text")) > 0,
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", ""))).cast("double") /
            length(col("text")))
          .otherwise(lit(0.0)))
      .filter(col("n_words") >= minWords && col("digit_frac") <= maxDigitFrac)
  }

  /** CCNet-style streaming perplexity gate — the batch→speed-layer model
    * handoff: a frozen [[graft.operators.TextAnalysis.KnModel]] (trained
    * once on the reference corpus, bigram-type-bounded, shipped in the
    * closure) scores each arriving document map-side and documents above
    * `maxAvgNll` drop. Stateless and join-free — the stream never touches
    * the training corpus; per-doc scores are BIT-IDENTICAL to the batch
    * `knScore` output (KnStreamSpec pins the equality), so the speed and
    * batch layers cannot disagree on a document's fate.
    *
    * Documents with no bigram (single word) carry a null `avg_nll` and
    * PASS — no evidence is abstention, not rejection (the same null
    * policy as the zip/speed operators, F11).
    */
  def perplexityGate(docs: DataFrame,
      model: graft.operators.TextAnalysis.KnModel,
      maxAvgNll: Double): DataFrame = {
    val score = udf((text: String) => model.avgNll(text))
    docs.withColumn("avg_nll", score(col("text")))
      .filter(col("avg_nll").isNull || col("avg_nll") <= maxAvgNll)
  }
}
