package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (TimeQ sibling): BNLJ vs BroadcastIntervalJoinExec on the
  * banded lineitem join, cold + warm pass each. Recorded runs (sf0.1,
  * 600k facts): 1000 bands 2.56 s → 0.33 s (8×); 10000 bands 25.6 s →
  * 0.41 s (62×) — the BNLJ side grows linearly with the band count, the
  * interval index logarithmically.
  * Usage: runMain graft.plans.IntervalProbe <sfDir> <nBands>
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val c = li.join(bands, li("l_extendedprice") >= bands("lo") &&
        li("l_extendedprice") < bands("hi")).count()
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    run("bnlj-cold"); run("bnlj-warm")
    spark.experimental.extraStrategies = Seq(IntervalJoinStrategy)
    run("interval-cold"); run("interval-warm")
    spark.stop()
  }
}
