package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Physical-layout operators for the 100 TB tier: explicit salt-replicated
  * joins for skewed keys (the manual counterpart of AQE's skew-join split,
  * for engines/paths where AQE can't see the skew — e.g. a skewed
  * broadcast-ineligible dim, or a pre-AQE Spark) and Z-order keys for
  * multi-dimensional data clustering (co-locate rows that are close in
  * several columns so file/row-group pruning works for predicates on ANY
  * of them, not just the leading sort column).
  */
object SkewLayout {

  /** Rendezvous (highest-random-weight) owner of each key among `shards`
    * shards: weight(key, sh) = the engine-shared 48-bit md5 fold of
    * "sh_key", owner = argmax (ties → higher shard id, matching the
    * struct-max order). The routing every distributed cache uses because
    * removing one shard remaps ONLY that shard's keys (minimal
    * disruption, no ring state). Map-side only: the argmax folds the
    * `shards` hash expressions per row inside codegen — no shuffle, no
    * lookup table. Output: (keyCol, shard).
    */
  def hrwOwner(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards >= 1 && shards <= 64)
    val best = array((0 until shards).map { sh =>
      struct(
        Sketches.hash48(concat(lit(s"${sh}_"), col(keyCol).cast("string")))
          .as("w"),
        lit(sh.toLong).as("sh"))
    }: _*)
    df.select(col(keyCol), array_max(best).getField("sh").as("shard"))
  }

  /** Salt-replicated equi-join: the fact side gets a deterministic salt in
    * [0, salts) hashed from `saltBy` (a per-row unique column, so hot keys
    * spread across `salts` reducers), the dim side is replicated once per
    * salt value, and the join key becomes (key, salt). Result-identical to
    * the plain equi-join — every fact row still meets every dim row of its
    * key exactly once — but a key holding X% of the fact now occupies
    * `salts` tasks instead of one. Cost: dim shuffle volume × salts, which
    * is the standard salting trade (use on skewed FACTS joining modest
    * dims). Output: fact columns + dim columns, salt dropped.
    *
    * The dim side carries a SHUFFLE_HASH hint: salting works ONLY through
    * (key, salt) hash partitioning, and a small dim would otherwise tempt
    * the planner into a broadcast join — which has no key partitioning at
    * all, so the hot key's rows stay wherever the fact side left them
    * (often ONE upstream partition) and the salt buys nothing. Measured on
    * the q_triangles skew probe (hub degree 9385): broadcast-planned
    * salting ran 1.2× SLOWER than unsalted; shuffle-planned salting
    * spreads the hub's join output evenly (the straggler-elimination win
    * on a real cluster) but is end-to-end NEUTRAL on that probe — the
    * quadratic output still gets generated and aggregated, which is the
    * dominant cost wherever it lands (PLANS.md round-8 table; the
    * minShared prefilter in Graph.copurchaseEdges is what eliminates the
    * output, 30×). Building the per-partition hash map on the replicated
    * dim is right: each (key, salt) partition holds the dim's matching
    * keys once, the fact side streams.
    */
  def saltedEquiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, salts: Int, saltBy: String): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // xxhash64, not the md5 parity hash: the salt is result-invisible (it
    // only routes rows), so it needs determinism, not cross-engine parity
    val sf = fact.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))).hint("shuffle_hash")
    sf.join(sd, sf(factKey) === sd(dimKey) && sf("__salt") === sd("__salt"))
      .drop("__salt")
  }

  /** Morton/Z-order key over two numeric columns: quantize each to
    * 2^bits levels against its own [min, max] range (range agg is a
    * 1-row broadcast, NOT a global sort — no ntile funnel), then
    * interleave the bits. Pure integer arithmetic end-to-end, so the key
    * is deterministic and engine-portable. Rows equal in one dimension
    * and close in the other land in nearby key ranges, which is the
    * property file-level min/max pruning needs.
    */
  def zOrderKey(xQ: Column, yQ: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 16, s"bits must be in [1,16], got $bits")
    // interleave: sum over b of bit(x,b)·2^(2b+1) + bit(y,b)·2^(2b)
    (0 until bits).map { b =>
      val xb = pmod(floor(xQ / lit(math.pow(2, b))).cast(LongType), lit(2L))
      val yb = pmod(floor(yQ / lit(math.pow(2, b))).cast(LongType), lit(2L))
      xb * lit(1L << (2 * b + 1)) + yb * lit(1L << (2 * b))
    }.reduce(_ + _)
  }

  /** Quantize `c` to [0, 2^bits) against [mn, mx]: floor of the scaled
    * position, clamped so mx itself lands in the top cell. Exact-input
    * parity: the division is one IEEE op on doubles both engines build
    * identically.
    */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val levels = (1L << bits).toDouble
    least(lit((1L << bits) - 1),
      floor((c.cast("double") - mn) / (mx - mn + lit(1e-9)) * lit(levels)).cast(LongType))
  }

  val queries: Seq[GraftQuery] = Seq(

    // Salted join must be invisible in the result: lineitem ⋈ part on
    // l_partkey with 8 salts, aggregated per p_type — the oracle is the
    // plain join.
    GraftQuery(
      "q_salted_join",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val part = Tables(s, dir, "part")
        saltedEquiJoin(li, "l_partkey", part, "p_partkey", 8, "l_orderkey")
          .groupBy("p_type")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(DecimalType(30, 6))).cast("double").as("sum_qty"))
          .orderBy("p_type")
      },
      Some("""SELECT p_type, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // Z-order layout key over (o_totalprice, o_custkey) at 8 bits/dim:
    // emit the key and the leading-byte bucket a writer would range-
    // partition on. The oracle replicates the integer bit-interleave.
    GraftQuery(
      "q_hrw",
      (s, dir) => {
        // Rendezvous (highest-random-weight) routing of users onto 8
        // shards (see hrwOwner), then one count per shard to check
        // balance.
        hrwOwner(Tables(s, dir, "events")
            .select(col("user_id")).distinct(), "user_id", 8)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_keys"), min("user_id").as("min_key"),
            max("user_id").as("max_key"))
          .orderBy("shard")
      },
      Some(s"""WITH keys AS (SELECT DISTINCT user_id FROM events),
              |w AS (
              |  SELECT user_id, sh,
              |    ${Sketches.hash48Sql("sh || '_' || CAST(user_id AS VARCHAR)")} AS wt
              |  FROM keys CROSS JOIN (SELECT unnest(range(0, 8)) AS sh)),
              |owner AS (
              |  SELECT user_id, sh AS shard
              |  FROM (SELECT user_id, sh, wt,
              |          row_number() OVER (PARTITION BY user_id
              |            ORDER BY wt DESC, sh DESC) AS rk
              |        FROM w)
              |  WHERE rk = 1)
              |SELECT shard, count(*) AS n_keys, min(user_id) AS min_key,
              |  max(user_id) AS max_key
              |FROM owner GROUP BY shard ORDER BY shard""".stripMargin),
    ),

    GraftQuery(
      "q_zorder",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val r = orders.agg(
          min(col("o_totalprice").cast("double")).as("mn_p"),
          max(col("o_totalprice").cast("double")).as("mx_p"),
          min(col("o_custkey").cast("double")).as("mn_c"),
          max(col("o_custkey").cast("double")).as("mx_c"))
        val q = orders.crossJoin(broadcast(r))
          .withColumn("qp", quantize(col("o_totalprice"), col("mn_p"), col("mx_p"), 8))
          .withColumn("qc", quantize(col("o_custkey"), col("mn_c"), col("mx_c"), 8))
        q.select(col("o_orderkey"), col("qp"), col("qc"),
            zOrderKey(col("qp"), col("qc"), 8).as("zkey"))
          .withColumn("zbucket", floor(col("zkey") / lit(4096.0)).cast(LongType))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (
             |  SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn_p, max(CAST(o_totalprice AS DOUBLE)) AS mx_p,
             |         min(CAST(o_custkey AS DOUBLE)) AS mn_c, max(CAST(o_custkey AS DOUBLE)) AS mx_c
             |  FROM orders
             |),
             |q AS (
             |  SELECT o_orderkey,
             |    least(255, CAST(floor((CAST(o_totalprice AS DOUBLE) - mn_p) / (mx_p - mn_p + 1e-9) * 256.0) AS BIGINT)) AS qp,
             |    least(255, CAST(floor((CAST(o_custkey AS DOUBLE) - mn_c) / (mx_c - mn_c + 1e-9) * 256.0) AS BIGINT)) AS qc
             |  FROM orders CROSS JOIN r
             |)
             |SELECT o_orderkey, qp, qc,
             |  CAST(list_reduce(list_transform(range(0, 8),
             |    b -> (qp // CAST(pow(2, b) AS BIGINT) % 2) * CAST(pow(2, 2*b+1) AS BIGINT)
             |       + (qc // CAST(pow(2, b) AS BIGINT) % 2) * CAST(pow(2, 2*b) AS BIGINT)),
             |    (a, b) -> a + b) AS BIGINT) AS zkey,
             |  CAST(floor(CAST(list_reduce(list_transform(range(0, 8),
             |    b -> (qp // CAST(pow(2, b) AS BIGINT) % 2) * CAST(pow(2, 2*b+1) AS BIGINT)
             |       + (qc // CAST(pow(2, b) AS BIGINT) % 2) * CAST(pow(2, 2*b) AS BIGINT)),
             |    (a, b) -> a + b) AS DOUBLE) / 4096.0) AS BIGINT) AS zbucket
             |FROM q ORDER BY o_orderkey""".stripMargin),
    ),
  )
}
