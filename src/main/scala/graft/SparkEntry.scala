package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Classifier, Curation, Dedup, IndexedOps, Multimodal, Relational, Search, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 + the
  * training-data-pipeline extensions) to a DataFrame program;
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q7_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Curation.queries ++
      Search.queries ++ Classifier.queries ++ IndexedOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextAnalysis.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++ Curation.oracleSql ++
      Search.oracleSql ++ Classifier.oracleSql ++ IndexedOps.oracleSql
}
