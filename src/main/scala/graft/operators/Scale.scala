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
}
