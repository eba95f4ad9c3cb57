package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the thresholded edit join — separates the CONTRACT
  * knobs the registered q_edit_threshold holds fixed: the threshold τ and
  * the compared head length. Any lossless candidate filter for edit
  * distance keeps ~(τ·q+1) of a head's (len−q+1) grams in its prefix, so
  * selectivity is a function of τ/len — q_edit_threshold's τ=8 on 60-char
  * heads (43% of grams per prefix) is a STRESS configuration; this probe
  * times the production-shaped corners on the same corpus.
  *
  * Usage: runMain graft.EditProbe <sfDir> [reps]
  */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val out = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[editprobe] $label: ${out.map(_._1).map(t => f"$t%.2f").mkString(" ")} " +
        f"(min ${out.map(_._1).min}%.2f, rows ${out.head._2})")
    }
    val docs = Tables(spark, sfDir, "documents")
    def run(tau: Int, headLen: Int): Long =
      operators.Dedup.editDistancePairs(docs, "doc_id", "text", "source",
        prefixLen = headLen, maxDist = Some(tau)).count()
    time("tau=2 head=60 (tight threshold)")(run(2, 60))
    time("tau=2 head=200")(run(2, 200))
    time("tau=8 head=200 (long heads, same tau)")(run(8, 200))
    if (sys.env.get("EDIT_PROBE_STRESS").contains("1"))
      time("tau=8 head=60 (the registered stress contract)")(run(8, 60))
    spark.stop()
  }
}
