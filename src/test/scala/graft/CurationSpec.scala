package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Dataset-curation operators: deterministic content-addressed splits,
  * benchmark decontamination, composed pipeline. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("hash split is deterministic, content-addressed, and ~80/10/10") {
    val a = Curation.queries("q54_hash_split")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Curation.queries("q54_hash_split")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // re-run identical
    val total = a.values.sum.toDouble
    assert(a("train") / total > 0.7 && a("train") / total < 0.9,
      s"train share off: $a")
    assert(a.keySet == Set("train", "val", "test"))
  }

  test("decontamination flags a planted benchmark copy") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("decontam").toString
    val bench = graft.sources.Tables.load(spark, dir, "documents")
      .where(col("doc_id") < 10)
    // plant: training doc 9001 is an exact copy of benchmark doc 0
    val benchText = bench.where(col("doc_id") === 0)
      .select(col("text")).collect().head.getString(0)
    val planted = Seq((9001L, benchText, "en", "planted", benchText.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .union(planted)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val flagged = Curation.queries("q55_decontam")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(9001L), s"planted copy not flagged: ${flagged.keys}")
    // the copy shares (nearly) all its 3-grams with the benchmark
    assert(flagged(9001L) >= 10)
  }

  test("curation pipeline output is consistent with its stages") {
    val out = Curation.queries("q56_curation_pipeline")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val split = Curation.queries("q54_hash_split")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // pipeline output is a filtered subset of the raw split counts
    out.foreach { case (k, n) => assert(n <= split(k), s"$k grew: $n > ${split(k)}") }
    assert(out.values.sum > 0)
  }
}
