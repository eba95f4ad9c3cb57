package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 triangles endgame probe (VERDICT #4): split q_triangles'
  * cost at the 64× fixture into the PRODUCTION edge build
  * (copurchaseEdges with the round-12 count filter) vs the triangle
  * enumeration given materialized edges — [[GraphProbe]] measures the
  * same split but spends most of its wall on the PLAIN diagnostic build,
  * which at z320k is exactly the hub pathology the production path
  * exists to avoid. Decides where (whether) the next lever lands.
  * Usage: runmain.sh graft.TriProbe <fixtureDir> [reps]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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

    def time[A](tag: String)(f: => A): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[triprobe] $tag: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }
    def cp() = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)

    time("edge_build_production")(
      graft.operators.Graph.copurchaseEdges(cp(), minShared = 4).count())
    val e = graft.operators.Graph.copurchaseEdges(cp(), minShared = 4)
      .localCheckpoint(true)
    println(s"[triprobe] edge rows: ${e.count()}")
    time("triangles_given_edges")(
      graft.operators.Graph.triangles(e).agg(sum("n_tri")).head())
    time("full_q_triangles")(
      SparkEntry.queries("q_triangles")(spark, sfDir).count())
    spark.stop()
  }
}
