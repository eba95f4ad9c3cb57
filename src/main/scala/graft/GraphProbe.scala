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

    // SPARK_GRAPH_SKEW=0 skips the skew fixtures (phase-split-only runs
    // at the 64× fixture, where the skew battery would dominate wall)
    if (sys.env.get("SPARK_GRAPH_SKEW").contains("0")) { spark.stop(); return }
    // ---- skew phase: one hot part in 1/mod of orders -----------------
    // Every lineitem of every mod-th order is remapped to part 99999999:
    // the hub part's customer set is ~1/mod of customers, so the plain
    // self-join emits its d²/2 pairs inside ONE task. Measured: the
    // plain build (hotDegree = MaxValue forces every part down the cold
    // path) vs the adaptive salted build (Graph.copurchaseEdges
    // defaults), same fixture; equal edge counts asserted.
    for (mod <- Seq(100, 10)) {
      def cpSkew() = {
        val li = Tables(spark, sfDir, "lineitem")
          .withColumn("l_partkey",
            when(col("l_orderkey") % mod === 0, lit(99999999L))
              .otherwise(col("l_partkey")))
        Tables(spark, sfDir, "orders")
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
          .localCheckpoint(false)
      }
      val skew = cpSkew()
      val hubDeg = skew.groupBy("p").agg(count(lit(1)).as("d"))
        .orderBy(col("d").desc).head()
      println(s"[graphprobe] skew fixture 1/$mod: hottest part ${hubDeg.get(0)} degree ${hubDeg.get(1)}")
      time(s"skew_1_${mod}_edge_build_plain")(
        graft.operators.Graph.copurchaseEdges(skew, 4, hotDegree = Int.MaxValue).count())
      time(s"skew_1_${mod}_edge_build_salted")(
        graft.operators.Graph.copurchaseEdges(skew, 4, hubPath = "salted").count())
      time(s"skew_1_${mod}_edge_build_prefilter")(
        graft.operators.Graph.copurchaseEdges(skew, 4, hubPath = "prefilter").count())
      val nPlain = graft.operators.Graph.copurchaseEdges(skew, 4, hotDegree = Int.MaxValue).count()
      val nSalted = graft.operators.Graph.copurchaseEdges(skew, 4, hubPath = "salted").count()
      val nPre = graft.operators.Graph.copurchaseEdges(skew, 4, hubPath = "prefilter").count()
      println(s"[graphprobe] skew 1/$mod edges: plain=$nPlain salted=$nSalted prefilter=$nPre " +
        (if (nPlain == nSalted && nPlain == nPre) "EQUAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
