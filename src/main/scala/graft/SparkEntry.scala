package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented queries, one per operator from SURVEY.md §2. */
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++ operators.Stateful.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.TextAnalysis.queries ++ operators.Windows.queries ++
      operators.Analytics.queries ++ operators.Extended.queries ++
      operators.Ml.queries ++ operators.Sketches.queries ++
      operators.Warehouse.queries ++ operators.Curation.queries ++
      operators.BloomPrune.queries ++ operators.SkewLayout.queries ++
      operators.Graph.queries ++ operators.Spatial.queries ++
      operators.Scale.queries ++
      operators.Retrieval.queries ++ operators.Bpe.queries ++
      operators.Mining.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_fraud_rules")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
