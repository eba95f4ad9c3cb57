package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe data generator: writes a k× blow-up of the sf0.1 fact
  * tables (events / lineitem / orders, ids shifted per copy so keys stay
  * consistent and unique) with the dimension tables copied as-is. Used to
  * measure how the bench grows with data volume (BENCH.md) — the driver's
  * fixtures stop at sf0.1.
  *
  * Usage: runMain graft.MakeScaled <outDir> <factor> [srcDir]
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val k = args(1).toInt
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shift = 1000000000L
    def copies(name: String, idCols: Seq[String]) = {
      val base = Tables(spark, src, name)
      (0 until k).map { i =>
        idCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionByName _)
    }

    copies("events", Seq("event_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    copies("lineitem", Seq("l_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    copies("orders", Seq("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "documents", "embeddings")
      .foreach { t =>
        Tables(spark, src, t).write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      }
    println(s"scaled x$k -> $out")
    spark.stop()
  }
}
