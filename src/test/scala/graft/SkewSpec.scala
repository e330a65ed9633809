package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregation equals plain groupBy on skewed data") {
    import spark.implicits._
    // 90% of rows share one key — the straggler scenario
    val df = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
              (1 to 1000).map(i => (s"k${i % 50}", i.toDouble)))
      .toDF("k", "v").repartition(8)
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    val salted = Skew.saltedSumCount(df, $"k", $"v", 16)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    assert(salted == plain)
  }

  test("salted windowed running sum equals the plain window row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one mega-key (5000 rows) + cold keys; unique (k, o) pairs
    val df = ((1 to 5000).map(i => ("hot", i.toLong, (i % 97).toLong)) ++
              (1 to 500).map(i => (s"k${i % 20}", i.toLong, i.toLong)))
      .toDF("k", "o", "v").repartition(8)
    val plain = df.withColumn("cum",
        sum($"v").over(Window.partitionBy($"k").orderBy($"o")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"o", $"v", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // salt = contiguous range bucket of the ordering column (monotone)
    val salted = Skew.saltedCumSum(df, $"k", $"o", $"v", floor($"o" / 500))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(salted == plain)
    // the phase-1 window really partitions by (k, salt): more window
    // partitions than keys -> the hot key no longer serializes
    val p = Skew.saltedCumSum(df, $"k", $"o", $"v", floor($"o" / 500))
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => 1L) ++ (1 to 100).map(_.toLong))
      .toDF("fk").repartition(8)
    val dim = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("dk", "name")
    val plain = fact.join(dim, $"fk" === $"dk").groupBy($"name")
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk").groupBy($"name")
      .count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  /** Planted Zipfian corpus for the span-key operators (q70/q67):
    * one boilerplate 5-gram opens 20% of all docs — at 100× that key
    * is the straggler window partition the round-6 verdict flagged.
    * 600 docs: 120 share the hot header; 40 form 20 mutual near-dup
    * pairs (each pair shares a full 10-token body); the rest are
    * unique token soup. Every doc gets a unique 2-token tail so no
    * accidental cross-doc spans appear. */
  private def zipfCorpus = {
    import spark.implicits._
    val hot = "alpha beta gamma delta epsilon"
    val docsSeq: Seq[(Long, String)] =
      (0L until 120L).map(i =>
        i -> s"$hot filler${i}a filler${i}b filler${i}c filler${i}d u${i}x u${i}y") ++
      (0L until 20L).flatMap { p =>
        val shared = (0 until 10).map(j => s"pair${p}tok$j").mkString(" ")
        Seq(200L + 2 * p -> s"$shared u${200 + 2 * p}x u${200 + 2 * p}y",
            201L + 2 * p -> s"$shared u${201 + 2 * p}x u${201 + 2 * p}y")
      } ++
      (300L until 740L).map(i =>
        i -> (0 until 8).map(j => s"solo${i}tok$j").mkString(" "))
    docsSeq.toDF("doc_id", "text").repartition(8)
  }

  test("salted span coverage (q70 path) equals the window formulation on a Zipfian corpus") {
    val df = zipfCorpus
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val plain = graft.operators.Dedup.spanCoverage(df, 5, 0)
      .collect().map(key).toSet
    val salted = graft.operators.Dedup.spanCoverage(df, 5, 7)
      .collect().map(key).toSet
    assert(salted == plain)
    // sanity: the hot header is detected as duplicated coverage
    val hotCovered = graft.operators.Dedup.spanCoverage(df, 5, 7)
      .where(col("doc_id") < 120 && col("covered_tokens") >= 5).count()
    assert(hotCovered == 120, s"hot-header docs covered: $hotCovered")
    // and solo docs have zero coverage
    val soloCovered = graft.operators.Dedup.spanCoverage(df, 5, 7)
      .where(col("doc_id") >= 300 && col("covered_tokens") > 0).count()
    assert(soloCovered == 0)
  }

  test("span-dedup APPLY (q83): removes duplicated spans, salted path identical") {
    val df = zipfCorpus
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    val plain = graft.operators.Dedup.spanDedupApply(df, 5, 0)
      .collect().map(key).toSet
    val salted = graft.operators.Dedup.spanDedupApply(df, 5, 7)
      .collect().map(key).toSet
    assert(salted == plain)
    val out = graft.operators.Dedup.spanDedupApply(df, 5, 0)
    // hot-header docs: the 5 shared header tokens are removed, the
    // unique tail survives verbatim
    val hot = out.where(col("doc_id") === 3L).collect()(0)
    assert(hot.getLong(2) == hot.getLong(1) - 5, hot.toString)
    assert(hot.getString(3) ==
      "filler3a filler3b filler3c filler3d u3x u3y", hot.toString)
    assert(!hot.getString(3).contains("alpha"), hot.toString)
    // solo docs keep every token, text unchanged
    val solo = out.where(col("doc_id") === 300L).collect()(0)
    assert(solo.getLong(2) == solo.getLong(1), solo.toString)
    assert(solo.getString(3) ==
      (0 until 8).map(j => s"solo300tok$j").mkString(" "), solo.toString)
    // pair docs lose their shared 10-token body (spans cover all 10
    // positions), keep their unique 2-token tail
    val pair = out.where(col("doc_id") === 200L).collect()(0)
    assert(pair.getLong(2) == 2, pair.toString)
    assert(pair.getString(3) == "u200x u200y", pair.toString)
  }

  test("intra-doc span dedup (q84): removes repeated spans within a doc, ignores cross-doc repeats") {
    import spark.implicits._
    val phrase = "alpha beta gamma delta epsilon"
    val df = Seq(
      // the 5-gram repeats within doc 1: second occurrence removed
      1L -> s"$phrase filler $phrase tail",
      // doc 2 contains the SAME phrase once: untouched (cross-doc
      // repetition is q83's job, not q84's)
      2L -> s"intro $phrase outro2 outro3",
      // no repetition at all
      3L -> "one two three four five six seven")
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.intraDocDedupApply(df, 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (12L, 7L, s"$phrase filler tail"), out(1L).toString)
    assert(out(2L) == (8L, 8L, s"intro $phrase outro2 outro3"), out(2L).toString)
    assert(out(3L) == (7L, 7L, "one two three four five six seven"), out(3L).toString)
  }

  test("salted boilerplate segments (q67 path) equals the window formulation on a Zipfian corpus") {
    val df = zipfCorpus
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val plain = graft.operators.Curation.boilerplateSegments(df, 3, 0)
      .collect().map(key).toSet
    val salted = graft.operators.Curation.boilerplateSegments(df, 3, 11)
      .collect().map(key).toSet
    assert(salted == plain)
    // the salted plan's first span-key shuffle is on (seg, salt) —
    // a partial aggregate, not a window over the raw hot key
    val p = graft.operators.Curation.boilerplateSegments(df, 3, 11)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"salted path must not window on the hot key:\n$p")
  }
}
