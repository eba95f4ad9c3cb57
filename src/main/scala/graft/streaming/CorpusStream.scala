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

  /** Stream-static near-dup guard — the speed-layer twin of
    * `Dedup.incrementalDedup`: every arriving document checks itself
    * against a STATIC corpus snapshot and surfaces as a quarantine row
    * when a verified near-duplicate exists. Same signature scheme as the
    * batch operator (bigram shingles → 2×4 md5-slice MinHash bands), and
    * the same scale shape: the stream's banded rows EQUI-join the
    * snapshot's banded rows per micro-batch (a stream-static hash join —
    * never a nested-loop scan of the snapshot), exact shingle Jaccard
    * verifies candidates inside the batch, and
    * `dropDuplicatesWithinWatermark` collapses multi-band/multi-match
    * hits to one row per doc with watermark-bounded state.
    *
    * Output: (doc_id, dup_of, jaccard, `__ts`) for flagged docs only —
    * `dup_of` is ONE verified witness (the batch operator's argmin
    * canonicalization needs an aggregation a stateless stream gate
    * shouldn't pay; route flagged ids to quarantine and let the batch
    * layer canonicalize). Callers should `persist` the prepared snapshot
    * ([[prepareSnapshot]]) so its signature pass runs once, not once per
    * micro-batch.
    */
  def prepareSnapshot(snapshot: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = snapshot.sparkSession
    graft.functions.MinHashSig.register(spark)
    bandedSigs(snapshot, idCol, textCol)
      .select(col("band_idx"), col("band_key"),
        col("__id").as("snap_id"), col("__gs").as("snap_gs"))
  }

  private def bandedSigs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("__id"),
        array_distinct(expr(s"filter(zip_with(split($textCol, ' '), " +
          s"slice(split($textCol, ' '), 2, size(split($textCol, ' '))), " +
          "(a, b) -> concat(a, ' ', b)), g -> g IS NOT NULL)")).as("__gs"))
      .withColumn("sig", expr("minhash_sig(__gs)"))
      .select(col("__id"), col("__gs"),
        posexplode(array(
          concat((0 until 4).map(i => col("sig").getItem(i)): _*),
          concat((4 until 8).map(i => col("sig").getItem(i)): _*)))
          .as(Seq("band_idx", "band_key")))

  def snapshotNearDups(docs: DataFrame, preparedSnapshot: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      dedupWindow: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.MinHashSig.register(spark)
    val streamBands = bandedSigs(docs, idCol, textCol)
    val inter = size(array_intersect(col("__gs"), col("snap_gs"))).cast(LongType)
    streamBands
      .join(preparedSnapshot, Seq("band_idx", "band_key"))
      .withColumn("__i", inter)
      .withColumn("jaccard", col("__i").cast("double") /
        (size(col("__gs")).cast(LongType) + size(col("snap_gs")).cast(LongType) - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("__id").as("doc_id"), col("snap_id").as("dup_of"), col("jaccard"))
      .withColumn("__ts", current_timestamp())
      .withWatermark("__ts", dedupWindow)
      .dropDuplicatesWithinWatermark("doc_id")
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
    // BROADCAST the frozen model, never closure-ship it: a task closure
    // deserializes per task per micro-batch, and at a realistic model
    // size that dominates the whole trigger (round-11 zipf20k stress:
    // a 918k-bigram-type model cost 6.9 s/batch on 625-doc batches —
    // broadcast, the executor pays one deserialization per process).
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val score = udf((text: String) => bc.value.avgNll(text))
    docs.withColumn("avg_nll", score(col("text")))
      .filter(col("avg_nll").isNull || col("avg_nll") <= maxAvgNll)
  }

  /** Streaming count–min registers: maintain the depth×width counter
    * table of [[graft.operators.Sketches.countMin]] over an unbounded
    * key stream. The state IS the sketch — exactly depth·width rows no
    * matter how many distinct keys flow through, which is the entire
    * point: a streaming per-key `groupBy(key).count()` carries unbounded
    * state and needs watermark eviction (losing old keys), while the CMS
    * registers answer frequency point queries over the WHOLE stream
    * history in O(d·w) state with the usual overestimate-only error.
    * Identical bucket coordinates to the batch build (shared
    * `cmsBucketArray`), so a snapshot of the streaming state equals the
    * batch sketch of the same prefix row-for-row, and batch-side
    * [[graft.operators.Sketches.countMinEstimate]] probes it unchanged.
    * Run under Update/Complete output; pair with foreachBatch to publish
    * register snapshots.
    */
  def streamingCountMin(keyed: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    keyed.filter(col(keyCol).isNotNull)
      .select(posexplode(
        graft.operators.Sketches.cmsBucketArray(col(keyCol), depth, width)))
      .toDF("row", "bucket")
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
}
