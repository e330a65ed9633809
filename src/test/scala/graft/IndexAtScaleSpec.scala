package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

/** The 100 TB retrieval pattern end-to-end: materialize the inverted
  * index (postings bucketed by term) once at ingest, then serve BM25
  * probes that read ONLY the query terms' buckets — and return the
  * IDENTICAL ranking (same integer points) as the in-query scan path,
  * because both run [[Search.scorePostings]] verbatim. The text-side
  * sibling of AnnAtScaleSpec/BandedCorpusSpec. */
class IndexAtScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("bucketed postings serve bm25 probes with bucket pruning, identical ranking") {
    spark.sql("CREATE DATABASE IF NOT EXISTS ix")
    spark.sql("DROP TABLE IF EXISTS ix.postings")
    // ingest-time index build: one pass over the corpus
    Search.allPostings(spark, dir)
      .write.format("parquet").bucketBy(16, "w").sortBy("w")
      .saveAsTable("ix.postings")
    val stats = Search.corpusStats(spark, dir)

    // the planner auto-disables bucketed scans when no join/agg
    // exploits the bucketing; a pure probe read wants them ON so the
    // IN-filter prunes buckets (each band of the index on disk)
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try for (p <- Seq(Search.DefaultQuery, Search.AltQuery)) {
      val probe = spark.table("ix.postings").where(col("w").isin(p.terms: _*))
      // bucket pruning: the probe's scan selects a strict subset of
      // the 16 buckets (visible in the plan as SelectedBucketsCount)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"no bucket pruning in probe plan:\n$plan")
      val sel = "SelectedBucketsCount: (\\d+) out of 16".r
        .findFirstMatchIn(plan).map(_.group(1).toInt)
      assert(sel.exists(n => n > 0 && n < 16),
        s"probe read $sel of 16 buckets:\n$plan")

      // identical ranking, identical integer points vs the scan path
      val indexed = Search.scorePostings(probe, stats, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val scanned = Search.bm25(spark, dir, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(indexed == scanned, s"params $p")
      assert(indexed.nonEmpty)
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    spark.sql("DROP TABLE ix.postings")
  }
}
