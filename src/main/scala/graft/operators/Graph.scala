package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics the Pregel-by-joins way: PageRank as repeated
  * (edges ⋈ ranks → groupBy dst) rounds — the message-passing shape that
  * scales: each round is one shuffle on the edge's src then one on dst,
  * parallel across the whole graph, nothing driver-side but the loop
  * counter. Complements [[Dedup.clusterPairs]] (connected components) on
  * the iterative-operator surface.
  *
  * Arithmetic is scaled-integer end-to-end (ranks are BIGINTs at 1e12
  * scale, floor division for the out-degree and damping steps) so a fixed
  * iteration count yields BIT-IDENTICAL ranks on any engine and any
  * partitioning/merge order — double ranks would be order-sensitive in
  * the contribution sum. Dangling-node mass (sinks with no out-edges) is
  * dropped, the standard simplified formulation; ranks are relative, not
  * a probability distribution. At BIGINT scale the contribution sum is
  * bounded by N·SCALE·85 — fine to ~10⁵ nodes per component at 1e12;
  * larger graphs drop SCALE or move the state to DECIMAL(38,0).
  */
object Graph {

  val Scale: Long = 1000000000000L // 1e12: 12 digits of rank resolution

  /** `iters` damped PageRank rounds over `edges` (src, dst), d = 0.85.
    * Output: (node, rank) for every node appearing as src or dst.
    * The edge/node/out-degree frames are materialized once (they feed
    * every round), and each round's ranks are localCheckpointed — the
    * lineage-truncation trade documented at [[Dedup.clusterPairs]].
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = Scale): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(false)
    // out-degree folded into the edge frame ONCE — it is constant across
    // rounds, so joining it per round would pay iters× for a static column
    val eod = e.join(
        e.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .localCheckpoint(false)
    var pr = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = pr.join(eod, pr("node") === eod("src"))
        .select(col("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      // lazy checkpoint: truncates lineage identically but materializes on
      // the caller's action instead of firing an eager job per round (the
      // eager form cost ~5 blocking jobs before the query even ran)
      pr = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(scale * 15 / 100) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint(false)
    }
    pr.select(col("node"), col("r").as("rank"))
  }

  /** The oracle's unrolled twin of one Spark round (DuckDB lacks a clean
    * way to reference a recursive CTE twice per step, so a FIXED iteration
    * count unrolls into chained CTEs — generated, not hand-copied, so the
    * two engines cannot drift). sum(BIGINT) returns HUGEINT in DuckDB:
    * cast back before the damping division.
    */
  private def prRoundSql(i: Int, scale: Long): String =
    s"""pr$i AS (
       |  SELECT n.node,
       |    CAST(${scale * 15 / 100} + (85 * CAST(coalesce(c.m, 0) AS BIGINT)) // 100 AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r // o.od) AS m
       |    FROM pr${i - 1} p JOIN e ON e.src = p.node JOIN od o ON o.src = p.node
       |    GROUP BY e.dst
       |  ) c ON c.node = n.node
       |)""".stripMargin

  val queries: Seq[GraftQuery] = Seq(

    // PageRank over the customer→supplier purchase graph (5 rounds):
    // suppliers accumulate rank from the customers that buy from them.
    // Supplier node ids are offset into their own range — the raw key
    // spaces overlap (suppkey 5 is not customer 5).
    GraftQuery(
      "q_pagerank",
      (s, dir) => {
        val edges = Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey").cast("long") + lit(10000000L)).as("dst"))
        pageRank(edges, iters = 5).orderBy("node")
      },
      Some((Seq(
        s"""WITH e AS (
           |  SELECT DISTINCT o_custkey AS src, CAST(l_suppkey AS BIGINT) + 10000000 AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           |),
           |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
           |pr0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes)""".stripMargin) ++
        (1 to 5).map(prRoundSql(_, Scale))).mkString(",\n") +
        "\nSELECT node, r AS rank FROM pr5 ORDER BY node"),
    ),
  )
}
