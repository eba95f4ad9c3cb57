package graft

import graft.operators.Warehouse
import org.apache.spark.sql.functions._

/** Warehouse maintenance: incremental state merging must be associative
  * (any split of history gives the same final aggregate) and SCD2 must
  * open/close validity intervals exactly at attribute changes.
  */
class WarehouseSpec extends SparkSuite {

  private def events3 = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a", 10.5, "2024-01-01 00:00:00"),
      (2L, "a", 2.25, "2024-01-05 00:00:00"),
      (3L, "b", -1.0, "2024-01-10 00:00:00"),
      (4L, "a", 7.0, "2024-01-15 00:00:00"),
      (5L, "b", 3.5, "2024-01-20 00:00:00"),
    ).toDF("id", "k", "v", "ts").withColumn("ts", col("ts").cast("timestamp"))
  }

  test("mergeStates: any 3-way split merges to the one-shot aggregate") {
    val df = events3
    val full = Warehouse.finishState(
      Warehouse.aggState(df, "k", "v")).collect().sortBy(_.getString(0))
    val p1 = Warehouse.aggState(df.filter(col("id") <= 1), "k", "v")
    val p2 = Warehouse.aggState(df.filter(col("id") === 2 || col("id") === 3), "k", "v")
    val p3 = Warehouse.aggState(df.filter(col("id") >= 4), "k", "v")
    // left-leaning and right-leaning merge trees agree with the rescan
    val left = Warehouse.finishState(
      Warehouse.mergeStates(Warehouse.mergeStates(p1, p2), p3))
      .collect().sortBy(_.getString(0))
    val right = Warehouse.finishState(
      Warehouse.mergeStates(p1, Warehouse.mergeStates(p2, p3)))
      .collect().sortBy(_.getString(0))
    assert(left.toSeq == full.toSeq)
    assert(right.toSeq == full.toSeq)
  }

  test("mergeStates: empty delta is an identity") {
    val df = events3
    val state = Warehouse.aggState(df, "k", "v")
    val empty = Warehouse.aggState(df.filter(lit(false)), "k", "v")
    val merged = Warehouse.finishState(Warehouse.mergeStates(state, empty))
      .collect().sortBy(_.getString(0))
    val full = Warehouse.finishState(state).collect().sortBy(_.getString(0))
    assert(merged.toSeq == full.toSeq)
  }

  test("scd2: intervals open at changes, close at the next change, chain per key") {
    val s = spark
    import s.implicits._
    // user 1: a -> a (no change) -> b -> a ; user 2: constant c
    val df = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"),
      (2L, 1L, "a", "2024-01-02 00:00:00"),
      (3L, 1L, "b", "2024-01-03 00:00:00"),
      (4L, 1L, "a", "2024-01-04 00:00:00"),
      (5L, 2L, "c", "2024-01-01 12:00:00"),
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Warehouse.scd2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("key", "version")
      .select("key", "state", "version", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 1L, false), (1L, "b", 2L, false), (1L, "a", 3L, true),
      (2L, "c", 1L, true)))
    // every non-current interval closes exactly where the next one opens
    val rows = Warehouse.scd2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("key", "version").collect()
    rows.sliding(2).foreach { w =>
      if (w.length == 2 && w(0).getLong(0) == w(1).getLong(0))
        assert(w(0).getAs[java.sql.Timestamp]("valid_to") ==
          w(1).getAs[java.sql.Timestamp]("valid_from"))
    }
  }

  test("cdcMerge: latest op wins, D deletes, I/U upsert, untouched rows survive") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val delta = Seq(
      (1L, "a2", "U", 1L), (1L, "a3", "U", 2L), // conflicting updates: seq 2 wins
      (2L, "x", "D", 1L),                        // delete
      (4L, "d", "I", 1L),                        // insert
      (5L, "e", "I", 1L), (5L, "ignored", "D", 2L), // insert then delete -> absent
    ).toDF("k", "v", "op", "seq")
    val got = Warehouse.cdcMerge(snap, delta, "k", "seq", "op")
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "a3", 3L -> "c", 4L -> "d"))
  }

  test("cdcMerge: tied (key, seq) resolves deterministically across partitionings") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, "z")).toDF("k", "v")
    val delta = Seq((1L, "a", "U", 1L), (1L, "b", "U", 1L)).toDF("k", "v", "op", "seq")
    def run(parts: Int) = Warehouse.cdcMerge(snap, delta.repartition(parts), "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(run(1) == run(7)) // content-hash tiebreak: same winner, any layout
  }

  test("cdcMerge: empty delta is the identity") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, "a")).toDF("k", "v")
    val delta = Seq.empty[(Long, String, String, Long)].toDF("k", "v", "op", "seq")
    assert(Warehouse.cdcMerge(snap, delta, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq == Seq(1L -> "a"))
  }

  test("joinDelta: stored join + delta equals full recompute across all four quadrants") {
    val s = spark
    import s.implicits._
    // rows joining old×old, delta×old, old×delta, and delta×delta — the
    // delta×delta pairs must be produced exactly once (by the ΔA⋈Bnew leg)
    val aOld = Seq((1L, "ao1"), (2L, "ao2"), (9L, "ao9")).toDF("k", "av")
    val aDelta = Seq((2L, "ad2"), (3L, "ad3")).toDF("k", "av")
    val bOld = Seq((1L, "bo1"), (2L, "bo2"), (3L, "bo3")).toDF("k", "bv")
    val bDelta = Seq((2L, "bd2"), (3L, "bd3"), (8L, "bd8")).toDF("k", "bv")
    val maintained = aOld.join(bOld, "k")
      .unionByName(Warehouse.joinDelta(aOld, aDelta, bOld, bDelta, "k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val full = aOld.unionByName(aDelta).join(bOld.unionByName(bDelta), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(maintained == full)
    assert(full.exists(t => t._2 == "ad2" && t._3 == "bd2")) // delta×delta present
  }

  test("joinDelta: empty deltas contribute nothing") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "a1")).toDF("k", "av")
    val b = Seq((1L, "b1"), (2L, "b2")).toDF("k", "bv")
    val none = Seq.empty[(Long, String)].toDF("k", "av")
    val noneB = Seq.empty[(Long, String)].toDF("k", "bv")
    assert(Warehouse.joinDelta(a, none, b, noneB, "k").count() == 0)
  }
}
