package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization probe: A/B the copurchaseEdges hub paths (plain-count
  * via "salted" with no hot rows, vs array-prefilter) on a fixture dir,
  * for the minShared values the queries use.
  * Usage: runmain.sh graft.PathAB <dir> [reps]
  */
object PathAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()

    def time[A](tag: String)(f: => A): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pathab] $tag%-30s ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    def cp() = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)

    for (m <- Seq(3, 4)) {
      time(s"m$m prefilter")(
        graft.operators.Graph.copurchaseEdges(cp(), m, hubPath = "prefilter")
          .write.format("noop").mode("overwrite").save())
      time(s"m$m salted(plain-cold)")(
        graft.operators.Graph.copurchaseEdges(cp(), m, hubPath = "salted")
          .write.format("noop").mode("overwrite").save())
      time(s"m$m plain")(
        graft.operators.Graph.copurchaseEdges(cp(), m, hubPath = "plain")
          .write.format("noop").mode("overwrite").save())
      time(s"m$m auto")(
        graft.operators.Graph.copurchaseEdges(cp(), m)
          .write.format("noop").mode("overwrite").save())
      val a = graft.operators.Graph.copurchaseEdges(cp(), m, hubPath = "prefilter").count()
      val b = graft.operators.Graph.copurchaseEdges(cp(), m, hubPath = "salted").count()
      val c = graft.operators.Graph.copurchaseEdges(cp(), m).count()
      println(s"[pathab] m$m edges: prefilter=$a salted=$b auto=$c " +
        (if (a == b && a == c) "EQUAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
