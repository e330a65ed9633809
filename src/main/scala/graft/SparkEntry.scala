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

  /** A queries/oracle pair contributed by one operator module. */
  final case class Module(
      name: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String])

  /** Single registry of operator modules. SparkEntry.queries/oracleSql
    * AND ContractSpec's uniqueness guard both derive from this list, so
    * adding a module here is the only step — the guard cannot drift. */
  val modules: Seq[Module] = Seq(
    Module("Relational", Relational.queries, Relational.oracleSql),
    Module("TextAnalysis", TextAnalysis.queries, TextAnalysis.oracleSql),
    Module("Dedup", Dedup.queries, Dedup.oracleSql),
    Module("Similarity", Similarity.queries, Similarity.oracleSql),
    Module("Multimodal", Multimodal.queries, Multimodal.oracleSql),
    Module("Curation", Curation.queries, Curation.oracleSql),
    Module("Search", Search.queries, Search.oracleSql),
    Module("Classifier", Classifier.queries, Classifier.oracleSql),
    Module("IndexedOps", IndexedOps.queries, IndexedOps.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q7_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracleSql).reduce(_ ++ _)
}
