package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall curves for the ANN production shapes (VERDICT r10 #3): each
  * approximate operator measured against its exact ground truth on the
  * SAME fixture, so the hash-green "own contract" rows also carry a
  * stated accuracy-vs-exact number (PLANS.md round-11 table; RecallSpec
  * pins the floors so a future speedup can't silently trade recall away).
  *
  *   - hybrid_lsh@20 — hybridRrf(denseLsh) vs the exact-dense hybrid,
  *     both with the production lexical guards and topOut=20: isolates
  *     what the sign-LSH dense leg costs the FUSED output.
  *   - pq@10       — pqTopK vs bruteForceTopK (exact cosine): the ADC
  *     metric distortion plus the 16-codeword codebook.
  *   - lsh@10      — signLshTopK vs exact: single-bucket gating loss.
  *   - multiprobe@10 — signLshTopKMultiProbe vs exact: the recall-raising
  *     variant, for the spread between the two.
  *
  * Usage: runMain graft.RecallProbe <fixtureDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench/fixtures/z5k")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[recallprobe] $label: recall ${r.getDouble(1)}%.4f over " +
        f"${r.getLong(0)} queries ($sec%.1f s incl. ground-truth reuse)")
    }

    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")

    // SPARK_RECALL_ONLY=pq reruns just the PQ rows (the exact ground
    // truth is the expensive part; no need to re-pay the hybrid legs
    // when sweeping shortlist sizes)
    val pqOnly = sys.env.get("SPARK_RECALL_ONLY").contains("pq")

    if (!pqOnly) {
      val qp = col("doc_id") % 100 === 0 // the registered hybrid query set
      val exactHybrid = operators.Retrieval.hybridRrf(docs, emb, qp, topOut = 20)
      val lshHybrid = operators.Retrieval.hybridRrf(docs, emb, qp, topOut = 20,
        denseLsh = true)
      report("hybrid_lsh@20",
        operators.Similarity.recallVs(exactHybrid, lshHybrid, "query_id", "doc_id"))
    }

    val exact10 = operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", 10)
      .localCheckpoint(false) // ground truth read by three comparisons
    if (!pqOnly) {
      report("pq@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", 10),
        "query_id", "neighbor_id"))
      // the production PQ shape: unit-normalized (ADC's L2 then IS the
      // cosine ranking) + 4 distributed Lloyd rounds on the codebook
      report("pq_norm_lloyd4@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", 10,
          normalize = true, lloydRounds = 4),
        "query_id", "neighbor_id"))
      report("pq_norm_lloyd4_c64@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", 10,
          normalize = true, lloydRounds = 4, codes = 64),
        "query_id", "neighbor_id"))
      report("pq_norm_lloyd4_c256@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", 10,
          normalize = true, lloydRounds = 4, codes = 256),
        "query_id", "neighbor_id"))
      // shortlist-for-rerank regime: exact top-10 found within a PQ top-50
      // shortlist (the IVFADC + exact-rerank production pattern — the
      // rerank step orders the shortlist exactly, so THIS is its recall@10)
      report("pq_shortlist50_c256@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", 50,
          normalize = true, lloydRounds = 4, codes = 256),
        "query_id", "neighbor_id"))
    }
    // optional second shortlist size (args(1)): the production recall
    // knob is shortlist ∝ corpus — a fixed 50 dilutes under 64× more
    // distractors by construction
    args.drop(1).headOption.map(_.toInt).foreach { m =>
      report(s"pq_shortlist${m}_c256@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.pqTopK(emb, "vec_id", "embedding", m,
          normalize = true, lloydRounds = 4, codes = 256),
        "query_id", "neighbor_id"))
    }
    // the round-11 bucketed scale path: coarse cells + residual PQ +
    // exact rerank; candidate mass = nprobe/nlist of the corpus
    report("ivfpq@10", operators.Similarity.recallVs(exact10,
      operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding", 10,
        shortlist = 50, nlist = 64, nprobe = 8, codes = 256, lloydRounds = 4),
      "query_id", "neighbor_id"))
    if (!pqOnly) {
      report("lsh@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.signLshTopK(emb, "vec_id", "embedding", 10),
        "query_id", "neighbor_id"))
      report("multiprobe@10", operators.Similarity.recallVs(exact10,
        operators.Similarity.signLshTopKMultiProbe(emb, "vec_id", "embedding", 10),
        "query_id", "neighbor_id"))
    }
    spark.stop()
  }
}
