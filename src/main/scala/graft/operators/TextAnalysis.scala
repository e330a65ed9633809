package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text

/** Text-analysis operators over the `documents` table: token counting,
  * type/token stats, quality scoring, language ID, fingerprinting.
  * All per-row work is codegen'd built-ins (see functions.Text); the
  * only shuffles are the final aggregations.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_token_stats" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", Text.tokens(col("text")))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_types"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("ttr"))),

    "q28_quality_score" -> ((s, dir) =>
      // length / stopword-ratio quality gates, CCNet/Gopher-rule style
      docs(s, dir)
        .withColumn("toks", Text.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("stop_ct", Text.stopwordCount(col("toks")))
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("stop_ct"),
          (col("stop_ct").cast("double") / col("n_tokens")).as("stop_ratio"),
          (col("n_chars").cast("double") / col("n_tokens")).as("chars_per_token"),
          when(col("n_tokens").between(20, 2000) &&
               (col("stop_ct").cast("double") / col("n_tokens")).between(0.01, 0.6),
               lit("keep")).otherwise(lit("drop")).as("quality"))),

    "q29_langid" -> ((s, dir) =>
      // heuristic lang-id → confusion matrix vs the labeled lang column
      docs(s, dir)
        .withColumn("lang_pred", Text.langGuess(Text.tokens(col("text"))))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))),

    "q30_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          md5(col("text")).as("full_fp"),
          md5(substring(col("text"), 1, 64)).as("prefix_fp"),
          col("n_chars")))
  )

  val oracleSql: Map[String, String] = Map(
    "q27_token_stats" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_types,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS ttr
        |FROM documents""".stripMargin,

    "q28_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','of','and','to','in'], x))) AS INTEGER) AS stop_ct
        |  FROM documents)
        |SELECT doc_id, n_tokens, stop_ct,
        |  CAST(stop_ct AS DOUBLE) / n_tokens AS stop_ratio,
        |  CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token,
        |  CASE WHEN n_tokens BETWEEN 20 AND 2000
        |        AND CAST(stop_ct AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
        |       THEN 'keep' ELSE 'drop' END AS quality
        |FROM t""".stripMargin,

    "q29_langid" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN len(list_filter(toks, x -> list_contains(['the','and','of'], x))) > 0 THEN 'en'
        |         WHEN len(list_filter(toks, x -> list_contains(['le','la','et'], x))) > 0 THEN 'fr'
        |         WHEN len(list_filter(toks, x -> list_contains(['el','los','y'], x))) > 0 THEN 'es'
        |         WHEN len(list_filter(toks, x -> list_contains(['der','die','und'], x))) > 0 THEN 'de'
        |         ELSE 'unknown' END AS lang_pred
        |  FROM t)
        |SELECT lang, lang_pred, count(*) AS n_docs FROM p GROUP BY lang, lang_pred""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id, md5(text) AS full_fp,
        |  md5(substring(text, 1, 64)) AS prefix_fp, n_chars
        |FROM documents""".stripMargin
  )
}
