package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipf-axis diagnostics: output/candidate masses for the content-blocked
  * family on a fixture dir (dev probe backing the PLANS.md adjudications).
  * Usage: runMain graft.ZipfProbe <sfDir> [simhash|edit] [tau]
  */
object ZipfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/zipfscale/z5k")
    val mode = if (args.length > 1) args(1) else "simhash"
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    if (mode == "edit") {
      // Candidate mass of the thresholded edit join (pre-verify): the
      // number the location filter exists to bound on a saturated
      // character-trigram space. Also times the full query for context.
      val tau = if (args.length > 2) args(2).toInt else 8
      // the SAME projection the production query builds (shared helper —
      // round-10 ADVICE: hardcoded literals here silently diverged)
      val d = operators.Dedup.editHeadFrame(docs, "doc_id", "text", "source")
      val t0 = System.nanoTime()
      val nCands = operators.Dedup.editThresholdCandidates(docs, d, tau).count()
      val tc = (System.nanoTime() - t0) / 1e9
      println(f"[zipfprobe] edit tau=$tau candidates = $nCands (stage $tc%.2f s)")
      val t1 = System.nanoTime()
      val nPairs = operators.Dedup.editDistancePairs(docs, "doc_id", "text", "source",
        maxDist = Some(tau)).count()
      val tf = (System.nanoTime() - t1) / 1e9
      println(f"[zipfprobe] edit tau=$tau verified pairs = $nPairs (full $tf%.2f s)")
      spark.stop()
      return
    }
    val pairs = operators.Dedup.simHashPairs(docs, "doc_id", "text", "source", 3)
    println(s"[zipfprobe] simhash pairs total = ${pairs.count()}")
    println(s"[zipfprobe] simhash hamming-0 pairs = ${pairs.filter(col("hamming") === 0).count()}")
    graft.functions.SimHash16.register(spark)
    val sigs = docs.select(col("source").as("b"),
      expr("simhash16(array_distinct(split(text, ' ')))").as("s"))
    val g = sigs.groupBy("b", "s").count()
    println(s"[zipfprobe] distinct (block, sig) groups = ${g.count()}")
    g.orderBy(col("count").desc).show(5, false)
    spark.stop()
  }
}
