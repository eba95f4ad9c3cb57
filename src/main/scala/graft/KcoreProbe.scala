package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_kcore's cost into (a) the co-purchase edge
  * build and (b) the peel given materialized edges, with per-block
  * wall time and surviving edge counts — so tuning lands where the time is.
  * Usage: runMain graft.KcoreProbe <sfDir> [minShared] [k]
  */
object KcoreProbe {

  /** `runMain graft.KcoreProbe synth <nNodes> <nEdges> <k>`: A/B the
    * local-endgame switchover against the all-distributed peel on a
    * deterministic near-critical random graph — the regime where the
    * DISTRIBUTED blocks genuinely run first (every parquet fixture's
    * co-purchase projection lands under the cutoff immediately), then
    * verifies both strategies return identical cores.
    */
  private def synthMain(args: Array[String]): Unit = {
    val n = args(1).toLong
    val m = args(2).toLong
    val k = args(3).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.range(m).selectExpr(
        s"pmod(xxhash64(id, 'src'), ${n}L) AS src",
        s"pmod(xxhash64(id, 'dst'), ${n}L) AS dst")
      .localCheckpoint()
    println(s"[kcoreprobe] synth n=$n m=${edges.count()} k=$k")
    def run(tag: String, cutoff: Long): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val res = graft.operators.Graph.kCore(edges, k, localCutoff = cutoff)
        .localCheckpoint()
      val rows = res.count()
      println(f"[kcoreprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, core nodes=$rows")
      res
    }
    // order is flippable (arg 5 = "mixedfirst") — the first arm in a
    // fresh JVM pays codegen/warmup, so a one-order read is biased
    val flip = args.length > 4 && args(4) == "mixedfirst"
    val (dist, mixed) = if (flip) {
      val m2 = run("mixed (cutoff=2^20)", 1L << 20)
      (run("all-distributed (cutoff=0)", 0L), m2)
    } else {
      val d = run("all-distributed (cutoff=0)", 0L)
      (d, run("mixed (cutoff=2^20)", 1L << 20))
    }
    val diff = dist.unionByName(mixed).distinct().count() - dist.count()
    println(s"[kcoreprobe] strategy disagreement rows: $diff (0 = identical)")
    spark.stop()
  }

  /** `runMain graft.KcoreProbe coreness <nNodes> <nEdges> <maxK>
    * [hfirst|iterfirst]`: design-scale A/B of the two DISTRIBUTED core-
    * decomposition strategies — the single-pass h-index fixpoint vs the
    * superseded maxK−1 iterated k-core peels — on the same deterministic
    * skewed random graph, both forced distributed (cutoff 0), plus an
    * exact agreement check (VERDICT r14 task 2). Arm order is flippable:
    * the first arm in a fresh JVM pays codegen/warmup.
    */
  private def corenessMain(args: Array[String]): Unit = {
    val n = args(1).toLong
    val m = args(2).toLong
    val maxK = args(3).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // skewed endpoints (quadratic map u²/n over a uniform hash → low ids
    // are hubs; u ≤ n so u² stays far inside BIGINT) so the core
    // structure is tiered like a real copurchase graph, not the
    // near-critical uniform regime synthMain probes
    val edges = spark.range(m).selectExpr(
        s"(pmod(xxhash64(id, 'a'), ${n}L) * pmod(xxhash64(id, 'a'), ${n}L)) div ${n}L AS src",
        s"(pmod(xxhash64(id, 'b'), ${n}L) * pmod(xxhash64(id, 'b'), ${n}L)) div ${n}L AS dst")
      .localCheckpoint()
    println(s"[corenessprobe] synth n=$n m=${edges.count()} maxK=$maxK")
    def run(tag: String, fn: () => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val res = fn().localCheckpoint()
      val rows = res.count()
      println(f"[corenessprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, nodes=$rows")
      res
    }
    def hArm() = run("h-index fixpoint (cutoff=0)",
      () => graft.operators.Graph.coreness(edges, maxK, localCutoff = 0L))
    def iArm() = run("iterated k-cores (cutoff=0)",
      () => graft.operators.Graph.corenessIterated(edges, maxK))
    // the serial Matula–Beck endgame forced at any size — the arm the
    // localCutoff crossover derivation needs (VERDICT r15 #4)
    def sArm() = run("serial Matula-Beck (cutoff=max)",
      () => graft.operators.Graph.coreness(edges, maxK, localCutoff = Long.MaxValue))
    val arms = (if (args.length > 4) args(4) else "h,iter") match {
      case "hfirst" => Seq("h", "iter")   // back-compat spellings
      case "iterfirst" => Seq("iter", "h")
      case s => s.split(",").toSeq
    }
    val results = arms.map {
      case "h" => hArm()
      case "iter" => iArm()
      case "serial" => sArm()
      case a => sys.error(s"unknown arm '$a' (h|iter|serial)")
    }
    results.sliding(2).filter(_.size == 2).foreach { case Seq(x, y) =>
      val diff = x.unionByName(y).distinct().count() - x.count()
      println(s"[corenessprobe] strategy disagreement rows: $diff (0 = identical)")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("synth")) { synthMain(args); return }
    if (args.headOption.contains("coreness")) { corenessMain(args); return }
    val sfDir = args(0)
    val minShared = if (args.length > 1) args(1).toLong else 3L
    val kArg = if (args.length > 2) args(2).toInt else 3
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
    val eb = graft.operators.Graph.copurchaseEdges(cp, minShared = minShared)
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    var eCnt = eb.count()
    println(f"[kcoreprobe] edge_build (minShared=$minShared) ${(System.nanoTime() - t0) / 1e9}%.2f s, edges=$eCnt")

    val k = kArg
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
