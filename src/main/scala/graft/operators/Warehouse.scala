package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Warehouse-maintenance operators: incremental aggregate upkeep (merge a
  * delta's partial state into a stored state instead of rescanning history)
  * and SCD Type-2 dimension building from a change stream. At 100 TB the
  * incremental path is the difference between aggregating a day's delta
  * and re-aggregating the full fact history on every refresh.
  */
object Warehouse {

  /** Partial aggregate state per key: (key, cnt, sum_d, mn, mx). Sums
    * accumulate in DECIMAL(38,6) so states merge order-insensitively and the
    * final double cast is exact-input-identical on any merge tree. 38 is
    * Spark's max precision: sum(decimal(38,6)) stays decimal(38,6), so the
    * state type is CLOSED under merging with no narrowing cast anywhere —
    * a narrower stored state (an earlier revision used 30,6) would silently
    * NULL an overflowing merged sum under non-ANSI mode.
    */
  def aggState(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key")).agg(
      count(lit(1)).as("cnt"),
      sum(col(valCol).cast(DecimalType(38, 6))).as("sum_d"),
      min(col(valCol)).as("mn"),
      max(col(valCol)).as("mx"))

  /** Merge two partial states: count/sum add, min/max combine. The result
    * is again a valid state — merging is associative and type-preserving
    * (decimal(38,6) in, decimal(38,6) out), so a stored state can absorb
    * any number of delta states without touching history.
    */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("key").agg(
      sum("cnt").as("cnt"),
      sum("sum_d").cast(DecimalType(38, 6)).as("sum_d"),
      min("mn").as("mn"),
      max("mx").as("mx"))

  /** Finalize a state for consumption: exact decimal sum cast to double. */
  def finishState(state: DataFrame): DataFrame =
    state.select(col("key"), col("cnt"),
      col("sum_d").cast(DoubleType).as("sum_v"), col("mn"), col("mx"))

  /** SCD Type-2 dimension from an event stream: consecutive-dedup the
    * tracked attribute per entity (a row only where the value CHANGES),
    * then open/close validity intervals with lead(). One shuffle on the
    * entity key; both windows share the (key, ts, id) sort.
    * Output: (key, state, valid_from, valid_to, version, is_current).
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .select(col(keyCol).as("key"), col(attrCol).as("state"),
        col(tsCol).as("valid_from"), col(tieCol).as("__tie"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy("key").orderBy(col("valid_from"), col("__tie"))))
      .withColumn("version",
        row_number().over(
          Window.partitionBy("key").orderBy(col("valid_from"), col("__tie")))
          .cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }

  /** Apply a CDC delta to a snapshot (MERGE semantics): the latest op per
    * key wins (`seqCol` descending), 'D' removes the key, anything else
    * upserts the delta payload. Payload columns of `delta` must match the
    * snapshot schema. One shuffle on the key for the latest-op window,
    * one anti-join, one union — the standard incremental-refresh shape
    * (the alternative, rebuilding the snapshot from full history, rescans
    * everything ever written).
    */
  def cdcMerge(snapshot: DataFrame, delta: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    // content-hash tiebreak after seq: two delta rows sharing (key, seq)
    // would otherwise resolve by partitioning order — a nondeterministic
    // merge. CDC feeds normally guarantee unique (key, seq); the tiebreak
    // makes the degenerate case reproducible instead of run-dependent.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc, xxhash64(delta.columns.toIndexedSeq.map(col): _*))
    val latest = delta.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val upserts = latest.filter(col(opCol) =!= "D").drop(opCol, seqCol)
    snapshot.join(latest.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  /** Incremental JOIN maintenance (the IVM delta rule): the join's delta
    * under appends is ΔA⋈Bₙₑw ∪ Aₒₗd⋈ΔB — two joins sized by the DELTAS,
    * not the stored tables. Appending the returned delta to the STORED
    * join result (which the caller holds materialized, same contract as
    * [[mergeStates]] absorbing a delta state) equals a full recompute —
    * history is never rescanned. All legs are equi-joins on `key`, so a
    * bucketed store keeps them shuffle-free on the stored side.
    * Append-only deltas; deletes/updates route through [[cdcMerge]] first.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, key: String): DataFrame =
    aDelta.join(bOld.unionByName(bDelta), key)
      .unionByName(aOld.join(bDelta, key))

  val queries: Seq[GraftQuery] = Seq(

    // MERGE semantics over a deterministic delta synthesized from the
    // customer table: updates (key%10=0, +100), deletes (key%10=1),
    // inserts (key%10=2, offset key space), and a CONFLICTING second
    // update (key%100=0, +200, higher seq) that must win over the first.
    GraftQuery(
      "q_cdc_merge",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
          .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
            col("c_mktsegment").as("seg"))
        def d(pred: Column, kk: Column, bb: Column, ss: Column, op: String, seq: Long) =
          c.filter(pred).select(kk.as("k"), bb.as("bal"), ss.as("seg"),
            lit(op).as("op"), lit(seq).as("seq"))
        val delta =
          d(col("k") % 10 === 0, col("k"), col("bal") + 100, col("seg"), "U", 1L)
            .unionByName(d(col("k") % 10 === 1, col("k"), col("bal"), col("seg"), "D", 1L))
            .unionByName(d(col("k") % 10 === 2, col("k") + 1000000L, col("bal"), lit("NEW"), "I", 1L))
            .unionByName(d(col("k") % 100 === 0, col("k"), col("bal") + 200, col("seg"), "U", 2L))
        cdcMerge(c, delta, "k", "seq", "op").orderBy("k")
      },
      Some("""WITH snap AS (
             |  SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg FROM customer
             |),
             |delta AS (
             |  SELECT c_custkey AS k, c_acctbal + 100 AS bal, c_mktsegment AS seg, 'U' AS op, 1 AS seq
             |  FROM customer WHERE c_custkey % 10 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal, c_mktsegment, 'D', 1
             |  FROM customer WHERE c_custkey % 10 = 1
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_acctbal, 'NEW', 'I', 1
             |  FROM customer WHERE c_custkey % 10 = 2
             |  UNION ALL
             |  SELECT c_custkey, c_acctbal + 200, c_mktsegment, 'U', 2
             |  FROM customer WHERE c_custkey % 100 = 0
             |),
             |latest AS (
             |  SELECT k, bal, seg, op FROM (
             |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM delta
             |  ) WHERE rn = 1
             |)
             |SELECT k, bal, seg FROM snap WHERE k NOT IN (SELECT k FROM latest)
             |UNION ALL
             |SELECT k, bal, seg FROM latest WHERE op <> 'D'
             |ORDER BY k""".stripMargin),
    ),

    // Incremental maintenance equivalence: state(ts < split) merged with
    // state(ts >= split) must equal the one-shot aggregate over everything
    // — the oracle IS the full rescan, so any divergence in the partial
    // states or the merge shows up as a hash mismatch.
    GraftQuery(
      "q_incremental_agg",
      (s, dir) => {
        val events = Tables(s, dir, "events")
        val split = "2024-01-16 00:00:00"
        val old = aggState(events.filter(col("ts") < lit(split)), "event_type", "value")
        val delta = aggState(events.filter(col("ts") >= lit(split)), "event_type", "value")
        finishState(mergeStates(old, delta)).orderBy("key")
      },
      Some("""SELECT event_type AS key, count(*) AS cnt,
             |  CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_v,
             |  min(value) AS mn, max(value) AS mx
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // Point-in-time join (the feature-store primitive): each lineitem is
    // enriched with the customer's order-status interval VALID AT ITS SHIP
    // DATE — never a later one (no leakage), never an earlier one. The
    // SCD2 dim comes from scd2() above; the join is equi on the customer
    // key with the interval predicate as a post-filter (sort-merge shape:
    // the range never drives a cartesian). Facts shipping before their
    // customer's first interval drop out (inner semantics).
    GraftQuery(
      "q_pit_join",
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val dim = scd2(orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
        val facts = Tables(s, dir, "lineitem")
          .join(orders.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("key"), col("l_shipdate"), col("l_quantity"))
        facts.join(dim,
            facts("key") === dim("key") &&
              col("l_shipdate") >= col("valid_from") &&
              (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
          .groupBy(col("state"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(DecimalType(30, 6))).cast("double").as("sum_qty"))
          .orderBy("state")
      },
      Some("""WITH chg AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             |    lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
             |  FROM orders
             |),
             |dim AS (
             |  SELECT o_custkey AS key, o_orderstatus AS state, o_orderdate AS valid_from,
             |    lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
             |  FROM chg WHERE prev IS NULL OR prev <> o_orderstatus
             |),
             |facts AS (
             |  SELECT o_custkey AS key, l_shipdate, l_quantity
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |)
             |SELECT state, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
             |FROM facts f JOIN dim d ON d.key = f.key
             |  AND f.l_shipdate >= d.valid_from
             |  AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
             |GROUP BY state ORDER BY state""".stripMargin),
    ),

    // SCD2 over the event stream: per-user event_type history as validity
    // intervals (CDC -> dimension build).
    GraftQuery(
      "q_scd2",
      (s, dir) => scd2(Tables(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .orderBy("key", "version"),
      Some("""WITH chg AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |c2 AS (
             |  SELECT user_id, event_type, ts, event_id FROM chg
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id AS key, event_type AS state, ts AS valid_from,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
             |FROM c2 ORDER BY key, version""".stripMargin),
    ),

    // Snapshot reconciliation: FULL OUTER diff of two aggregate snapshots
    // (per-customer 1995 vs 1996 spend) with added/removed/changed/same
    // status per key — the data-migration audit every cutover runs. The
    // equality leg compares DECIMAL-EXACT sums (doubles only at the
    // presentation edge), so 'same' can never flap on accumulation order.
    // Both snapshots shuffle once on the join key; the full-outer join is
    // co-partitioned on that same key.
    GraftQuery(
      "q_reconcile",
      (s, dir) => {
        def snap(year: Int) = Tables(s, dir, "orders")
          .filter(col("o_orderdate").cast("date")
            .between(lit(s"$year-01-01"), lit(s"$year-12-31")))
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast(DecimalType(30, 6))).as("spend"))
        val a = snap(1995).select(col("o_custkey"), col("spend").as("spend_a"))
        val b = snap(1996).select(col("o_custkey"), col("spend").as("spend_b"))
        a.join(b, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            col("spend_a").cast(DoubleType).as("spend_1995"),
            col("spend_b").cast(DoubleType).as("spend_1996"),
            when(col("spend_a").isNull, lit("added"))
              .when(col("spend_b").isNull, lit("removed"))
              .when(col("spend_a") === col("spend_b"), lit("same"))
              .otherwise(lit("changed")).as("status"))
          .orderBy("o_custkey")
      },
      Some("""WITH a AS (
             |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,6))) AS spend_a
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
             |  GROUP BY 1),
             |b AS (
             |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,6))) AS spend_b
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
             |  GROUP BY 1)
             |SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
             |  CAST(spend_a AS DOUBLE) AS spend_1995,
             |  CAST(spend_b AS DOUBLE) AS spend_1996,
             |  CASE WHEN spend_a IS NULL THEN 'added'
             |       WHEN spend_b IS NULL THEN 'removed'
             |       WHEN spend_a = spend_b THEN 'same'
             |       ELSE 'changed' END AS status
             |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
             |ORDER BY o_custkey""".stripMargin),
    ),

    // Join IVM end-to-end: orders split at 1997 (stored/delta), customers
    // split at custkey 1200 (stored/delta — late-arriving dimension rows),
    // maintained via the delta rule and aggregated per segment. The oracle
    // is the FULL recompute — the incremental path must be invisible in
    // the result, the same contract as q_incremental_agg.
    GraftQuery(
      "q_join_ivm",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .select(col("o_custkey").as("ck"), col("o_totalprice"), col("o_orderdate"))
        val c = Tables(s, dir, "customer")
          .select(col("c_custkey").as("ck"), col("c_mktsegment"))
        val cut = lit("1997-01-01").cast("date")
        val (aOld, aDelta) = (o.filter(col("o_orderdate").cast("date") < cut),
          o.filter(col("o_orderdate").cast("date") >= cut))
        val (bOld, bDelta) = (c.filter(col("ck") < 1200L), c.filter(col("ck") >= 1200L))
        // aOld⋈bOld stands in for the stored materialized view; a real
        // refresh reads it from storage and appends only joinDelta
        val joined = aOld.join(bOld, "ck")
          .unionByName(joinDelta(aOld, aDelta, bOld, bDelta, "ck"))
        joined.groupBy("c_mktsegment").agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(30, 6))).cast(DoubleType).as("revenue"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),
  )
}
