package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale primitives the 100 TB deployment leans on: bucketed co-located
  * joins, salted skew joins, partitioned writes. Each is demonstrated and
  * plan-asserted in ScaleSpec (e.g. the bucketed join's physical plan has no
  * shuffle exchange).
  */
object Scale {

  /** Write a table bucketed by the join key. Joining two tables bucketed the
    * same way on the same key is shuffle-free: each bucket pair joins
    * locally (sort-merge without Exchange). The 100 TB answer to "this join
    * shuffles both sides every run" — pay the shuffle once at write time.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
  ): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned write (the lake layout for predicate-pruned
    * scans: a filter on the partition column reads only matching
    * directories). Dynamic overwrite replaces only touched partitions.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Salted inner equi-join for skewed keys: the big side gets a
    * deterministic salt in [0, saltFactor) (hash of the whole row tuple —
    * content-derived, no rand(), so replays/retries are stable); the small
    * side is replicated saltFactor times. The hot key's rows spread over
    * saltFactor tasks instead of one straggler.
    * Same-named-key convenience form; [[SkewLayout.saltedEquiJoin]] is the
    * oracle-verified variant for differently-named keys with an explicit
    * salt-source column.
    *
    * AQE's skew-join split handles sort-merge cases adaptively; explicit
    * salting remains the tool when the skew is in an aggregation key or AQE
    * can't see the distribution (first stage of a job).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
  ): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt: partial aggregate on
    * (key, salt), final on key. Spark's hash aggregate already does partial
    * map-side combine; the explicit form matters when the per-key state is
    * too big to combine map-side (e.g. collect_set on a hot key).
    */
  def saltedDistinctCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltFactor: Int,
  ): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n_distinct"))

  /** Chunked distributed prefix sums — the scale path for per-key running
    * aggregates when the key cardinality is LOW (a plain
    * `Window.partitionBy(key)` materializes each key's entire history in
    * one task: with 5 keys, a 100 TB scan has 5-way parallelism and one
    * task's heap holds 20 TB). The classic two-phase scan, expressed
    * declaratively:
    *
    *   1. rows are chunked by `chunkCol`, a monotone coarsening of the
    *      primary order column (e.g. `to_date(ts)` when ordering by `ts`)
    *      — so chunk boundaries respect the global per-key order;
    *   2. running sums WITHIN (key, chunk) — parallelism is keys × chunks;
    *   3. per-chunk totals (tiny: one row per key × chunk) get an
    *      exclusive running offset over the chunk axis — the only
    *      key-partitioned window, over the chunk-count-bounded frame;
    *   4. offsets join back on (key, chunk) — co-partitioned with step
    *      2's exchange — and add to the in-chunk sums.
    *
    * Each entry of `sums` is (outputName, valueColumn); pass DECIMAL
    * values for exact, order-insensitive accumulation (a double would
    * make the two-phase result differ from the serial window's). The
    * returned frame carries the input columns plus one running-sum
    * column per entry, equal row-for-row to
    * `sum(value).over(partitionBy(key).orderBy(ord).rowsBetween(unboundedPreceding, currentRow))`.
    */
  def chunkedPrefixSums(
      df: DataFrame,
      keyCol: String,
      ordCols: Seq[Column],
      chunkCol: Column,
      sums: Seq[(String, Column)],
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.withColumn("__chunk", chunkCol)
    val wIn = Window.partitionBy(keyCol, "__chunk").orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.partitionBy(keyCol).orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = d.groupBy(col(keyCol), col("__chunk"))
      .agg(sums.map { case (n, v) => sum(v).as(s"__t_$n") }.head,
        sums.tail.map { case (n, v) => sum(v).as(s"__t_$n") }: _*)
    val offsets = sums.foldLeft(totals) { case (acc, (n, _)) =>
      acc.withColumn(s"__off_$n", sum(col(s"__t_$n")).over(wOff))
    }.select(col(keyCol) +: col("__chunk") +: sums.map { case (n, _) => col(s"__off_$n") }: _*)
    // offsets is keys × chunks rows (e.g. 5 keys × days — kilobytes even
    // over a century of history): broadcast it so the fact side is never
    // shuffled FOR THE JOIN — its single full-width exchange is the
    // (key, chunk) window partitioning below
    val joined = d.join(broadcast(offsets), Seq(keyCol, "__chunk"))
    sums.foldLeft(joined) { case (acc, (n, v)) =>
      // first chunk has no offset row history -> null; treat as zero by
      // coalescing with the in-chunk sum alone
      acc.withColumn(n,
        coalesce(col(s"__off_$n") + sum(v).over(wIn), sum(v).over(wIn)))
    }.drop("__chunk" +: sums.map { case (n, _) => s"__off_$n" }: _*)
  }
}
