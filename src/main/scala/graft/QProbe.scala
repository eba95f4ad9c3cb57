package graft

import org.apache.spark.sql.SparkSession

/** Generic isolated-query timer: min-of-N for any registered
  * SparkEntry.queries rows on any fixture dir, in a fresh idle session —
  * the cheap first step of every drift adjudication (is a driver-window
  * reading reproducible at all before a worktree A/B is built?).
  * Usage: runmain.sh graft.QProbe <dir> <reps> <q1,q2,...>
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // keep probe sessions split-compatible with Bench (r17)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "524288"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qprobe] $name%-24s ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }
    spark.stop()
  }
}
