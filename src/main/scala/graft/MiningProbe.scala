package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 optimization probe: decompose the Apriori pair-count cost and A/B
  * the duplicated-subtree plan (each self-join leg rebuilds baskets) vs a
  * checkpointed fb.
  * Usage: runmain.sh graft.MiningProbe <sfDir> [reps]
  */
object MiningProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[miningprobe] $tag%-30s ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    def baskets(): DataFrame = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()

    def pairsPlain(fb: DataFrame): DataFrame =
      fb.select(col("oid"), col("item").as("i1"))
        .join(fb.select(col("oid"), col("item").as("i2")), Seq("oid"))
        .filter(col("i1") < col("i2"))
        .groupBy("i1", "i2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2L)

    time("baskets_distinct")(baskets().write.format("noop").mode("overwrite").save())

    time("freqpairs_asis") {
      val b = baskets()
      val freq = b.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 2L)
      val fb = b.join(freq.select("item"), Seq("item"), "left_semi")
      pairsPlain(fb).write.format("noop").mode("overwrite").save()
    }

    time("freqpairs_ckpt_fb") {
      val b = baskets()
      val freq = b.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 2L)
      val fb = b.join(freq.select("item"), Seq("item"), "left_semi")
        .localCheckpoint(false)
      pairsPlain(fb).write.format("noop").mode("overwrite").save()
    }

    // per-basket sorted array + codegen pair expansion instead of the
    // oid self-join: one aggregate, pairs emitted map-side
    time("freqpairs_arrays") {
      val b = baskets()
      val freq = b.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 2L)
      val fb = b.join(freq.select("item"), Seq("item"), "left_semi")
      val sets = fb.groupBy("oid").agg(array_sort(collect_list("item")).as("items"))
      sets.select(explode(expr(
          "flatten(transform(items, (x, i) -> transform(slice(items, i + 2, size(items) - i - 1), y -> struct(x AS i1, y AS i2))))"))
          .as("pr"))
        .select(col("pr.i1"), col("pr.i2"))
        .groupBy("i1", "i2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2L)
        .write.format("noop").mode("overwrite").save()
    }

    // sanity: identical pair sets
    locally {
      val b = baskets()
      val freq = b.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 2L)
      val fb = b.join(freq.select("item"), Seq("item"), "left_semi").localCheckpoint(false)
      val a = pairsPlain(fb).count()
      val sets = fb.groupBy("oid").agg(array_sort(collect_list("item")).as("items"))
      val c = sets.select(explode(expr(
          "flatten(transform(items, (x, i) -> transform(slice(items, i + 2, size(items) - i - 1), y -> struct(x AS i1, y AS i2))))"))
          .as("pr"))
        .select(col("pr.i1"), col("pr.i2"))
        .groupBy("i1", "i2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2L).count()
      println(s"[miningprobe] pair rows: join=$a arrays=$c " + (if (a == c) "EQUAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
