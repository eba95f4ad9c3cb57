package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_kcore's cost into (a) the minShared=3 co-purchase
  * edge build and (b) the peel given materialized edges, with per-block
  * wall time and surviving edge counts — so tuning lands where the time is.
  * Usage: runMain graft.KcoreProbe <sfDir>
  */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()

    var t0 = System.nanoTime()
    val cp = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)
    val eb = graft.operators.Graph.copurchaseEdges(cp, minShared = 3)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    var eCnt = eb.count()
    println(f"[kcoreprobe] edge_build ${(System.nanoTime() - t0) / 1e9}%.2f s, edges=$eCnt")

    val k = 3
    var e = eb
    var round = 0
    var converged = false
    while (!converged && round < 60) {
      t0 = System.nanoTime()
      val next = (1 to 3).foldLeft(e) { (cur, _) =>
        val deg = cur.select(col("a").as("id")).union(cur.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("__d"))
        val keep = deg.filter(col("__d") >= k).select("id")
        cur.join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
      }.localCheckpoint()
      val nextCnt = next.count()
      println(f"[kcoreprobe] block rounds ${round + 1}-${round + 3}: ${(System.nanoTime() - t0) / 1e9}%.2f s, edges $eCnt -> $nextCnt")
      converged = nextCnt == eCnt
      e = next; eCnt = nextCnt; round += 3
    }
    spark.stop()
  }
}
