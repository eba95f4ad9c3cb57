package graft

import org.apache.spark.sql.SparkSession

/** Design-scale A/B for [[graft.operators.Graph.scc]]: a deterministic
  * random digraph big enough that the DISTRIBUTED coloring rounds
  * genuinely run (every parquet fixture's graph drops straight into the
  * Tarjan endgame), timed against the mixed-strategy default, then both
  * outputs compared row-for-row — the same harness shape as
  * KcoreProbe's synth mode.
  *
  * Usage: runMain graft.SccProbe <nNodes> <nEdges> [mixedfirst]
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val m = args(1).toLong
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
    println(s"[sccprobe] synth digraph n=$n m=${edges.count()}")
    def run(tag: String, cutoff: Long): org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      val res = graft.operators.Graph.scc(edges, localCutoff = cutoff)
        .localCheckpoint()
      val rows = res.count()
      val comps = res.select("scc_id").distinct().count()
      println(f"[sccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s," +
        s" nodes=$rows sccs=$comps")
      res
    }
    val flip = args.length > 2 && args(2) == "mixedfirst"
    val (dist, mixed) = if (flip) {
      val mx = run("mixed (cutoff=2^20)", 1L << 20)
      (run("all-distributed (cutoff=0)", 0L), mx)
    } else {
      val d = run("all-distributed (cutoff=0)", 0L)
      (d, run("mixed (cutoff=2^20)", 1L << 20))
    }
    val diff = dist.unionByName(mixed).distinct().count() - dist.count()
    println(s"[sccprobe] strategy disagreement rows: $diff (0 = identical)")
    spark.stop()
  }
}
