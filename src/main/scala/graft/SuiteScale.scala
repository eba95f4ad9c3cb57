package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Whole-suite scaling runner: times EVERY SparkEntry query at one sf dir
  * in full-hash-drain mode and writes a machine-readable JSON file, so the
  * scaling program (PLANS.md) can compute per-query exponents over the
  * complete 158-query board rather than a hand-picked probe set.
  *
  * Differences from [[Bench]] (which stays the driver's artifact):
  *   - `full` drain by default: aggregates xxhash64 over every output
  *     column, like [[TimeQ]] `full` — count() lets ColumnPruning delete
  *     unreferenced subtrees (the round-6 q_cusum trap, where a 3.2M-row
  *     window measured as a bare scan), and an exponent fitted to a pruned
  *     plan is fiction.
  *   - records each query's INPUT TABLES (leaf parquet relations of the
  *     analyzed plan), so the analysis can pair each query with the axis
  *     that actually scales it: facts fixtures leave `documents`/
  *     `embeddings` at base size, so a corpus query's facts-64x "exponent"
  *     would be a measurement of nothing.
  *   - JSON goes to a FILE (one object per query), not a size-capped
  *     stdout line.
  *
  * Usage: runMain graft.SuiteScale <sfDir> <outJson> [reps] [count] [regex]
  *   reps  — per-query passes, min reported (default 2)
  *   count — use Bench-matching count() drain instead of full-hash
  *   regex — only run query names matching (default all)
  *
  * SPARK_GRAFT_SHUFFLE overrides the partition count (scale fixtures grow
  * 64x past sf0.1; holding 32 partitions fixed there measures spill, not
  * the operator — partitions ∝ data is the cluster rule).
  */
object SuiteScale {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val countMode = args.contains("count")
    val filter = args.drop(3).filterNot(_ == "count").headOption.map(_.r)

    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    // SPARK_GRAFT_CONF="k=v;k=v": extra session confs for isolation
    // experiments (e.g. the ObjectHashAggregate fallback threshold probe,
    // round 12) — a dev knob of this probe main only, never the library
    val extraConf = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extraConf.foldLeft(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.ui.enabled", "false")
      )((b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()

    // Builders that localCheckpoint an intermediate frame truncate their
    // lineage to RDD leaves, so plan inspection finds no file relations —
    // their table sets are pinned here (from the builder source) instead.
    val checkpointedTables: Map[String, Seq[String]] = Map(
      "q_ab_test" -> Seq("events"),
      "q_ann_ivfpq" -> Seq("embeddings"),
      "q_benford" -> Seq("orders"),
      "q_bfs_hops" -> Seq("customer", "lineitem", "orders"),
      "q_clustering_coef" -> Seq("lineitem", "orders"),
      "q_connected_components" -> Seq("events"),
      "q_dbscan" -> Seq("embeddings"),
      "q_dbscan_blocked" -> Seq("embeddings"),
      "q_geo_knn" -> Seq("events"),
      "q_geo_radius_join" -> Seq("events"),
      "q_hits" -> Seq("lineitem", "orders"),
      "q_kcore" -> Seq("lineitem", "orders"),
      "q_label_prop" -> Seq("lineitem", "orders"),
      "q_modularity" -> Seq("lineitem", "orders"),
      "q_contrastive_pairs" -> Seq("documents"),
      "q_dedup_embedding" -> Seq("embeddings"),
      "q_pagerank" -> Seq("lineitem", "orders"),
      "q_ppr" -> Seq("customer", "lineitem", "orders"),
      "q_weighted_pagerank" -> Seq("lineitem", "orders"),
      "q_semantic_dedup" -> Seq("embeddings"),
      "q_setsim_prefix" -> Seq("documents"),
      "q_setsim_topk" -> Seq("documents"),
      "q_similarity_bucketed" -> Seq("embeddings"),
      "q_similarity_cosine" -> Seq("embeddings"),
      "q_similarity_lsh" -> Seq("embeddings"),
      "q_triangles" -> Seq("lineitem", "orders"),
    )
    // Staleness guard (round-9 ADVICE): the pinned map above must track the
    // builders — a query whose plan yields no file relations but is missing
    // from the map would silently report no tables, and a mapped query whose
    // plan DOES yield relations means the builder changed and the pin is
    // stale. Both fail the run loudly instead of mis-attributing an axis.
    def inputTables(name: String): Seq[String] =
      try {
        val seen = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.analyzed.collect {
            case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
              fs.location.rootPaths.map(p =>
                p.getName.stripSuffix(".parquet").stripSuffix(".csv"))
          }.flatten.distinct.sorted
        if (seen.nonEmpty) {
          require(!checkpointedTables.contains(name),
            s"stale checkpointedTables pin: $name's plan now yields file relations $seen — drop the pin")
          seen
        } else {
          require(checkpointedTables.contains(name),
            s"$name's plan yields no file relations and has no checkpointedTables pin — add one")
          checkpointedTables(name)
        }
      } catch {
        case e: IllegalArgumentException => throw e
        case _: Throwable => Seq("(plan-error)")
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.findFirstIn(n).isDefined))
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        val ok = try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (countMode) df.count()
          else {
            import org.apache.spark.sql.functions.{col, sum, xxhash64}
            df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*)
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
          }
          true
        } catch { case t: Throwable =>
          System.err.println(s"[suitescale] $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = times.filter(_._2).map(_._1)
      // a query with no successful rep publishes the slowest FAILING rep's
      // wall time plus an EXPLICIT failed flag (round-10 ADVICE: the old
      // negated-seconds sentinel forced every consumer of the committed
      // dumps to know the sign convention; old dumps keep it, so readers
      // accept either encoding)
      val failed = good.isEmpty
      val sec = if (good.nonEmpty) good.min else times.map(_._1).max
      println(f"[suitescale] $name%-28s ${fmt(sec)}${if (failed) " FAILED" else ""}")
      (name, sec, failed, inputTables(name))
    }
    spark.stop()
    val mode = if (countMode) "count" else "full"
    val body = results.map { case (n, s, f, ts) =>
      s"""  "$n": {"sec": ${fmt(s)}, "failed": $f, "tables": [${ts.map("\"" + _ + "\"").mkString(", ")}]}"""
    }.mkString(",\n")
    val doc = s"""{\n"sf": "${Bench.sfLabel(sfDir)}", "mode": "$mode", "reps": $reps, "shuffle": $parts,\n"queries": {\n$body\n}}\n"""
    Files.write(Paths.get(outJson), doc.getBytes(StandardCharsets.UTF_8))
    println(s"[suitescale] wrote $outJson (${results.count(_._3)} failures)")
  }
}
