package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the retrieval operators — separates the two axes the
  * registered `q_hybrid_rrf` cannot: in the verify query the query SET is a
  * fixed fraction of the corpus (doc_id % 50), so candidate mass grows
  * queries × corpus = quadratically on a scaled fixture by construction.
  * A real deployment holds the query set fixed while the corpus grows;
  * this probe times both regimes (`mod` scaled with the corpus vs held at
  * the base fixture's 50) plus the DSIR weight pass, forcing full output
  * evaluation via an xxhash64 aggregate.
  *
  * Usage: runMain graft.RetrievalProbe <sfDir> <queryMod> [reps]
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mod = if (args.length > 1) args(1).toLong else 50L
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[retrievalprobe] $label: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*)
        .cast("decimal(38,0)"))).head()

    val docs = Tables(spark, sfDir, "documents")
    val emb = Tables(spark, sfDir, "embeddings")
    println(s"[retrievalprobe] docs=${docs.count()} queries(mod=$mod)=" +
      docs.where(col("doc_id") % mod === 0).count())

    // Exact (unpruned) lexical leg — opt-in: since maxDfFrac defaults to
    // 0.5 (round 9), exact must be requested explicitly, and on a 64×
    // near-twin fixture its posting mass spills >70 GB on one box — set
    // RETRIEVAL_PROBE_EXACT=1 only where that is the point of the probe.
    if (sys.env.get("RETRIEVAL_PROBE_EXACT").contains("1"))
      time(s"hybrid_rrf mod=$mod exact")(
        drain(operators.Retrieval.hybridRrf(docs, emb, col("doc_id") % mod === 0,
          maxDfFrac = None, maxQueryTerms = None)))
    // Production defaults (df cap + rarest-32 query-term budget): on the
    // min-entropy fixtures every term is near-universal, so the df cap
    // removes (almost) the whole posting mass; on the Zipf fixtures the
    // term budget is what bounds the fan-out.
    time(s"hybrid_rrf mod=$mod production")(
      drain(operators.Retrieval.hybridRrf(docs, emb, col("doc_id") % mod === 0)))
    time("importance_weights")(
      drain(operators.Retrieval.importanceWeights(docs, col("lang") === "en")))
  }
}
