package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the near-dup pipeline's cost at a given sf dir —
  * the q_dedup_minhash / q_dedup_clusters twin of [[GraphProbe]]: times
  * the signature pass, the banded candidate join, and the verification
  * kernel separately so a scaling regression names its stage instead of
  * its query. Usage: runMain graft.DedupProbe <sfDir> [reps]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.MinHashSig.register(spark)

    def time[A](label: String)(f: => A): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dedupprobe] $label: ${ts.map(t => f"$t%.2f").mkString(" ")} (min ${ts.min}%.2f)")
    }

    val docs = Tables(spark, sfDir, "documents")
    println(s"[dedupprobe] docs=${docs.count()} sources=${docs.select("source").distinct().count()}")

    val spread = docs.select(col("doc_id").cast("long").as("__id"),
        col("source").cast("string").as("__blk"), col("text").as("__txt"))
      .repartition(spark.sparkContext.defaultParallelism)
    time("sig_only")(
      spread.select(expr("minhash_sig(array_distinct(split(__txt, ' ')))").as("sig"))
        .agg(count(lit(1))).head())
    val banded = spread.select(col("__id"), col("__blk"),
        expr("minhash_sig(array_distinct(split(__txt, ' ')))").as("sig"))
      .select(col("__id"), col("__blk"), posexplode(array(
        concat((0 until 4).map(i => col("sig").getItem(i)): _*),
        concat((4 until 8).map(i => col("sig").getItem(i)): _*),
      )).as(Seq("band_idx", "band_key")))
    val bandedM = banded.localCheckpoint(true)
    val hot = bandedM.groupBy("__blk", "band_idx", "band_key")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc).head()
    println(s"[dedupprobe] hottest band bucket: ${hot.get(3)} rows")
    time("cand_join_distinct")(
      bandedM.as("a").join(bandedM.as("b"),
          col("a.__blk") === col("b.__blk") && col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") && col("a.__id") < col("b.__id"))
        .select(col("a.__blk"), col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
        .distinct().count())
    time("full_minhash")(
      operators.Dedup.minHashPairs(docs, "doc_id", "text", "source").count())
    time("full_q_dedup_minhash")(
      SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count())
    time("full_q_dedup_clusters")(
      SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count())
    spark.stop()
  }
}
