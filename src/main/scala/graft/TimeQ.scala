package graft
import org.apache.spark.sql.SparkSession

/** Timing sibling of [[ExplainQ]]: run the named queries N times each at
  * the given sf dir (bench-matching session config) and print per-rep
  * wall seconds — the single-query iteration loop Bench is too coarse for.
  * Usage: runMain graft.TimeQ <sfDir> <reps> <query...>
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()
    val reps = args(1).toInt
    args.drop(2).foreach { q =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, args(0)).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $q: ${times.map(t => f"$t%.2f").mkString(" ")} (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
