package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-vs-serve split for the IVF-PQ index (the production cost story:
  * the index is trained + encoded ONCE, queries are a separate job).
  * Times each phase on a fixture dir with the production parameters the
  * recall program measured (nlist=64, nprobe=8, codes=256, lloyd=4).
  * Usage: runMain graft.IvfProbe <fixtureDir> [k]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench/fixtures/z5k")
    val k = if (args.length > 1) args(1).toInt else 10
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // keep the top_min_pairs shortlist aggregate in hash mode for
      // moderate group counts; memory-bounded at threshold × state size
      // per task — 2^20 OOMed this probe at shortlist=200 on the 8 GiB
      // box (see the Bench builder note)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "8192")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir, "embeddings")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString

    // nprobe sweep mode: recall@k + serve time per probe width — the
    // serving knob's measured curve (SPARK_IVF_SWEEP=1)
    if (sys.env.get("SPARK_IVF_SWEEP").contains("1")) {
      val shortlist = sys.env.getOrElse("SPARK_IVF_SHORTLIST", "50").toInt
      val probes = sys.env.getOrElse("SPARK_IVF_NPROBES", "2,4,8,16,32")
        .split(",").map(_.trim.toInt).toSeq
      val m = operators.Similarity.ivfPqModel(emb, "vec_id", "embedding",
        nlist = 64, codes = 256, lloydRounds = 4, normalize = true)
      val idx = operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", m)
        .localCheckpoint(false)
      // SPARK_IVF_NORECALL=1: serve-time-only mode for code A/Bs — the
      // brute-force ground truth dominates sweep wall-clock at 64× and
      // recall is pinned elsewhere (RecallSpec floors; serve output is
      // bit-identical across kernel-layout changes by construction)
      val noRecall = sys.env.get("SPARK_IVF_NORECALL").contains("1")
      val exact = if (noRecall) null else operators.Similarity
        .bruteForceTopK(emb, "vec_id", "embedding", k).localCheckpoint(false)
      // Materialize both checkpoints BEFORE the sweep, and time ONLY a
      // drain of the serve result itself (the xxhash64-sum drain the
      // build/serve split uses); recall is computed OUTSIDE the timer.
      // ADVICE r11: the old loop's timer paid the lazy checkpoint
      // materialization on the first probe point and the recallVs
      // join+collect on every point, so the published frontier's serve
      // seconds overstated serving cost and skewed the first row.
      idx.count(); if (!noRecall) exact.count()
      // SPARK_IVF_TILE: corpus-tile cap override for same-binary tile A/Bs
      val tile = sys.env.getOrElse("SPARK_IVF_TILE", "2048").toLong
      // SPARK_IVF_RATIO: adaptive-probing ratio (0 = exact nprobe)
      val ratio = sys.env.getOrElse("SPARK_IVF_RATIO", "0").toDouble
      probes.foreach { np =>
        val got = operators.Similarity.ivfPqQueryTopK(idx, emb, emb,
          "vec_id", "embedding", k, m, shortlist = shortlist, nprobe = np,
          maxTileRows = tile, probeRatio = ratio)
        val t = System.nanoTime()
        val drain = got.agg(sum(xxhash64(got.columns.toIndexedSeq.map(col): _*)
          .cast("decimal(38,0)"))).head()
        val serveSec = (System.nanoTime() - t) / 1e9
        if (noRecall)
          println(f"[ivfprobe] nprobe=$np%2d shortlist=$shortlist: " +
            f"serve $serveSec%.1f s (drain=${drain.get(0)})")
        else {
          val r = operators.Similarity.recallVs(exact, got,
            "query_id", "neighbor_id").collect()(0)
          println(f"[ivfprobe] nprobe=$np%2d shortlist=$shortlist: " +
            f"recall@$k ${r.getDouble(1)}%.4f, serve $serveSec%.1f s")
        }
      }
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val m = operators.Similarity.ivfPqModel(emb, "vec_id", "embedding",
      nlist = 64, codes = 256, lloydRounds = 4, normalize = true)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    operators.Similarity.ivfPqEncode(emb, "vec_id", "embedding", m)
      .write.mode("overwrite").parquet(idxDir)
    val tEncode = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val out = operators.Similarity.ivfPqQueryTopK(
      spark.read.parquet(idxDir), emb, emb, "vec_id", "embedding", k, m,
      shortlist = 50, nprobe = 8)
    val n = out.agg(sum(xxhash64(out.columns.toIndexedSeq.map(col): _*)
      .cast("decimal(38,0)"))).head()
    val tServe = (System.nanoTime() - t2) / 1e9
    println(f"[ivfprobe] train $tTrain%.2f s, encode+write $tEncode%.2f s, " +
      f"serve(all-queries top-$k) $tServe%.2f s (drain=$n)")
    spark.stop()
  }
}
