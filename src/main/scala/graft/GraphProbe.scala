package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_triangles' cost into (a) the co-purchase edge
  * build (orders ⋈ lineitem → distinct → self-join pair count) and
  * (b) the triangle enumeration given materialized edges — so tuning
  * effort lands on the part that actually dominates.
  * Usage: runMain graft.GraphProbe <sfDir> [reps]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[graphprobe] $tag: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    def edges() = {
      val cp = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
        .localCheckpoint(false)
      cp.as("x").join(cp.as("y"),
          col("x.p") === col("y.p") && col("x.c") < col("y.c"))
        .groupBy(col("x.c").as("src"), col("y.c").as("dst"))
        .agg(count(lit(1)).as("shared")).filter(col("shared") >= 4)
        .select("src", "dst")
    }

    time("edge_build")(edges().count())
    val e = edges().localCheckpoint(true)
    println(s"[graphprobe] edge rows: ${e.count()}")
    time("triangles_given_edges")(
      graft.operators.Graph.triangles(e).agg(sum("n_tri")).head())
    time("full_q_triangles")(
      SparkEntry.queries("q_triangles")(spark, sfDir).count())
    spark.stop()
  }
}
