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

  test("stratified sample respects per-language rates and is deterministic") {
    val rows = Curation.queries("q62_stratified_sample")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("en", "de", "es", "fr", "zh"))
    // achieved rates track the configured ones (binomial tolerance on
    // ~70-220 docs per stratum): en ~0.9 upsampled, zh ~0.25 down
    val en = rows("en")._2.toDouble / rows("en")._1
    val zh = rows("zh")._2.toDouble / rows("zh")._1
    assert(en > 0.75, s"en rate $en should be ~0.9")
    assert(zh < 0.45, s"zh rate $zh should be ~0.25")
    assert(en > zh, "upsampled stratum must keep a larger share")
    // content-addressed: re-run is row-identical
    val again = Curation.queries("q62_stratified_sample")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows == again)
  }

  test("token-budget mix stops each source exactly at its budget") {
    val kept = Curation.queries("q63_token_budget_mix")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept.nonEmpty)
    // every source's kept tokens are within budget...
    kept.foreach { case (src, (n, toks)) =>
      assert(toks <= 600, s"$src exceeded budget: $toks")
      assert(n > 0)
    }
    // ...and the cut is maximal: adding the NEXT doc in hash order
    // would exceed the budget (verified by recomputing the window)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val firstOver = graft.sources.Tables.load(spark, dir, "documents")
      .withColumn("tk", size(split(col("text"), " ")))
      .withColumn("cum", sum(col("tk")).over(w))
      .where(col("cum") > 600)
      .groupBy(col("source")).agg(min(col("cum")).as("next_cum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    firstOver.foreach { case (src, nextCum) =>
      assert(nextCum > 600)
      kept.get(src).foreach { case (_, toks) =>
        assert(toks < nextCum, s"$src cut is not maximal")
      }
    }
  }
}
