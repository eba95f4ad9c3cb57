package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (TimeQ sibling): BNLJ vs BroadcastIntervalJoinExec on the
  * banded lineitem join, cold + warm pass each, plus the FALLBACK phase —
  * strategy installed but the dim side over the broadcast threshold, so
  * the stats gate must decline and Spark's own (AQE) planning must
  * produce the identical count. Recorded runs (sf0.1, 600k facts): 1000
  * bands 2.56 s → 0.33 s (8×); 10000 bands 25.6 s → 0.41 s (62×) — the
  * BNLJ side grows linearly with the band count, the interval index
  * logarithmically.
  * Usage: runMain graft.plans.IntervalProbe <sfDir> <nBands>
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args(1).toInt
    val width = 110000.0 / n
    val bands = (0 until n).map(i => (i.toLong, i * width, (i + 1) * width))
      .toDF("band_id", "lo", "hi")
    val li = graft.Tables(spark, args(0), "lineitem")
      .select("l_extendedprice")
    def run(tag: String): Long = {
      val t0 = System.nanoTime()
      val j = li.join(bands, li("l_extendedprice") >= bands("lo") &&
        li("l_extendedprice") < bands("hi"))
      val c = j.count()
      val exec = j.queryExecution.executedPlan.toString
      val via = if (exec.contains("BroadcastIntervalJoin")) "interval-exec" else "spark-default"
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows via $via)")
      c
    }
    val a = run("bnlj-cold"); run("bnlj-warm")
    spark.experimental.extraStrategies = Seq(IntervalJoinStrategy)
    val b = run("interval-cold"); run("interval-warm")
    // the kill-switch path at data scale: the band table no longer fits
    // the (lowered) broadcast threshold, the strategy's stats gate
    // declines, and AQE plans the join itself — results must be identical
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    val c = run("fallback-cold"); run("fallback-warm")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(a == b && b == c, s"count drift across plans: bnlj=$a interval=$b fallback=$c")
    println(s"[probe] counts identical across bnlj/interval/fallback: $a")
    spark.stop()
  }
}
