package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

/** Streaming IVF-PQ index maintenance: [[operators.Similarity.ivfPqEncode]]
  * is map-side only (select + length filter + typed map against the
  * broadcast-small trained model — no aggregation, no watermark state), so
  * it runs unchanged on a STREAMING frame. That closes the production
  * build/serve split for fresh data: train once, encode each arriving
  * micro-batch into the (cell, vec_id, codes) parquet index, serve
  * [[operators.Similarity.ivfPqQueryTopK]] against the growing index —
  * no retrain, no batch re-encode of the backlog.
  *
  * Pins two contracts:
  *   1. the STREAMED index (file-source micro-batches → parquet append)
  *      equals the batch-encoded index row for row;
  *   2. serving over the streamed index equals the monolithic
  *      [[operators.Similarity.ivfPqTopK]] row for row (same model, same
  *      parameters) — the RecallSpec persisted-index equivalence, with
  *      the index landed by the stream instead of a batch write.
  */
class IvfStreamSpec extends SparkSuite {

  test("streamed ivfPqEncode index equals batch index; serving matches monolithic") {
    val s = spark
    val dir = sf("sf0.001")
    val emb = Tables(s, dir, "embeddings").localCheckpoint(false)
    val m = operators.Similarity.ivfPqModel(emb, "vec_id", "embedding",
      nlist = 8, codes = 16, lloydRounds = 2, normalize = true)

    // stream shape: the embeddings table re-written as a 4-file parquet
    // directory; maxFilesPerTrigger=1 -> 4 micro-batches
    val work = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString
    emb.repartition(4).write.parquet(s"$work/in")
    val sch = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val streamed = s.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
    val q = operators.Similarity.ivfPqEncode(streamed, "vec_id", "embedding", m)
      .writeStream.format("parquet")
      .option("path", s"$work/idx")
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()

    val streamedIdx = s.read.parquet(s"$work/idx")
    val batchIdx = operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", m)
    assert(streamedIdx.exceptAll(batchIdx).count() == 0 &&
      batchIdx.exceptAll(streamedIdx).count() == 0,
      "streamed index must equal the batch-encoded index")

    val mono = operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding", 3,
      shortlist = 20, nlist = 8, nprobe = 3, codes = 16, lloydRounds = 2)
    val served = operators.Similarity.ivfPqQueryTopK(
      streamedIdx, emb, emb, "vec_id", "embedding", 3, m,
      shortlist = 20, nprobe = 3)
    assert(served.exceptAll(mono).count() == 0 && mono.exceptAll(served).count() == 0,
      "serving over the streamed index must equal the monolithic form")
  }

  test("late arrivals: restart over the same checkpoint extends the index consistently") {
    // the production shape: ONE index query over one landing dir; late
    // vectors are new files there, and the query restarts from its own
    // checkpoint (batch ids continue, so the file sink's _spark_metadata
    // dedup appends them rather than skipping — two independent queries
    // on the same output path would collide on batch id 0 and drop the
    // second run's data, which is why this is the pinned recipe)
    val s = spark
    val dir = sf("sf0.001")
    val emb = Tables(s, dir, "embeddings").localCheckpoint(false)
    val m = operators.Similarity.ivfPqModel(emb, "vec_id", "embedding",
      nlist = 8, codes = 16, lloydRounds = 2, normalize = true)
    val first = emb.filter(col("vec_id") % 2 === 0)
    val late = emb.filter(col("vec_id") % 2 === 1)

    val work = java.nio.file.Files.createTempDirectory("graft-ivflate").toString
    val sch = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def drainOnce(): Unit = {
      val q = operators.Similarity.ivfPqEncode(
          s.readStream.schema(sch).option("maxFilesPerTrigger", "1")
            .parquet(s"$work/in"),
          "vec_id", "embedding", m)
        .writeStream.format("parquet")
        .option("path", s"$work/idx")
        .option("checkpointLocation", s"$work/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    }
    first.repartition(2).write.mode("append").parquet(s"$work/in")
    drainOnce()
    late.repartition(2).write.mode("append").parquet(s"$work/in")
    drainOnce()
    val streamedIdx = s.read.parquet(s"$work/idx")
    val batchIdx = operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", m)
    assert(streamedIdx.exceptAll(batchIdx).count() == 0 &&
      batchIdx.exceptAll(streamedIdx).count() == 0,
      "two-phase streamed index must equal the one-shot batch index")
  }
}
