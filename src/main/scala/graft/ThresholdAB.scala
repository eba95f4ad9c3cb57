package graft

import org.apache.spark.sql.SparkSession

/** Round-13 adjudication probe for the q_edit_threshold zipf regression
  * (VERDICT r12 #1): A/Bs `spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold` 128 (Spark default) vs 8192 (the bench session's
  * top_min_pairs setting) on the collect-heavy zipf rows that drifted in
  * the r12 driver artifact, ALTERNATING the setting within one session so
  * window drift cannot masquerade as a config effect. The conf is a
  * runtime SQL conf, so spark.conf.set/unset flips it per measurement.
  *
  * Usage: runmain.sh graft.ThresholdAB [zipfDir] [reps]
  */
object ThresholdAB {
  private val Conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  def main(args: Array[String]): Unit = {
    val zipfDir = args.headOption.getOrElse("/root/repo/bench/fixtures/zipf20k")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$zipfDir/documents.parquet").exists())
      MakeZipf.generate(spark, zipfDir, 20000L)
    if (!new java.io.File(s"$zipfDir/orders.parquet").exists())
      MakeZipf.generateGraph(spark, zipfDir, 20000L)

    // The drifted collect-heavy rows + one ObjectHashAgg-free control
    // (q_pagerank: scaled-int joins, no typed-buffer aggregate) so a
    // window shift inside the session is visible as a control move.
    val rows = Seq("q_edit_threshold", "q_dedup_simhash", "q_setsim_topk",
      "q_ann_pq", "q_pagerank")
    // warmup
    SparkEntry.queries("q_dedup_exact")(spark, zipfDir).count()

    def once(name: String, thr: String): Double = {
      spark.conf.set(Conf, thr)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, zipfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- rows) {
      val a = collection.mutable.ArrayBuffer[Double]() // 128
      val b = collection.mutable.ArrayBuffer[Double]() // 8192
      (1 to reps).foreach { i =>
        // alternate order each rep so warm-cache bias cancels
        if (i % 2 == 1) { a += once(name, "128"); b += once(name, "8192") }
        else { b += once(name, "8192"); a += once(name, "128") }
      }
      println(f"[thrAB] $name%-20s thr128: ${a.map(t => f"$t%.2f").mkString(" ")} " +
        f"(min ${a.min}%.2f) | thr8192: ${b.map(t => f"$t%.2f").mkString(" ")} " +
        f"(min ${b.min}%.2f) | ratio8192/128 ${b.min / a.min}%.2f")
    }
    spark.stop()
  }
}
