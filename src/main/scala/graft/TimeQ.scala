package graft
import org.apache.spark.sql.SparkSession

/** Timing sibling of [[ExplainQ]]: run the named queries N times each at
  * the given sf dir (bench-matching session config) and print per-rep
  * wall seconds — the single-query iteration loop Bench is too coarse for.
  * Usage: runMain graft.TimeQ <sfDir> <reps> [full] <query...>
  *
  * Default action is `count()` (Bench-matching) — but count() lets
  * Catalyst PRUNE unreferenced work: a window/projection whose output no
  * one reads is removed by ColumnPruning, so a pure-window query's count
  * can measure little more than the scan (the round-6 cusum probe read
  * 0.33 s for a 3.2M-row serial window this way). `full` instead
  * aggregates xxhash64 over every output column, forcing every expression
  * in the plan to actually evaluate — use it whenever comparing plan
  * SHAPES rather than reproducing Bench numbers.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE: probe-time override for the partition count —
    // scale-probe fixtures grow 32-64x past sf0.1, and holding the bench's
    // 32 partitions fixed there measures spill, not the operator (the
    // cluster rule is partitions ∝ data)
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()
    val reps = args(1).toInt
    val full = args.length > 2 && args(2) == "full"
    val tag = if (full) "timeq-full" else "timeq"
    args.drop(if (full) 3 else 2).foreach { q =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, args(0))
        if (full) {
          import org.apache.spark.sql.functions.{sum, xxhash64, col}
          // decimal sum: 3.2M+ long hashes overflow a long sum under ANSI
          df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
        } else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$tag] $q: ${times.map(t => f"$t%.2f").mkString(" ")} (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
