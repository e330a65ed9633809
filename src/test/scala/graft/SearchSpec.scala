package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search
import graft.sources.Tables

/** BM25 retrieval (q72): differential test against a plain-Scala
  * replay of the scoring formula over the same corpus — the ranking
  * the operator returns must be EXACTLY the ranking a sequential
  * reference implementation computes, integer points and all. */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def referenceBm25(p: Search.Bm25Params): Seq[(Long, Long, Long)] =
    Bm25Reference.score(
      Tables.load(spark, TestSpark.sfDir, "documents")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq, p)

  test("q72 bm25 matches a sequential reference implementation exactly") {
    for (p <- Seq(Search.DefaultQuery, Search.AltQuery)) {
      val got = Search.bm25(spark, TestSpark.sfDir, p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == referenceBm25(p), s"params $p")
      assert(got.nonEmpty)
    }
  }

  test("bm25 ranks a saturating tf above a longer diluted doc") {
    // rarer terms contribute more: with the same tf, a term with lower
    // df must yield >= points (odds idf is monotone decreasing in df)
    val p = Search.DefaultQuery
    val dfs = Search.bm25(spark, TestSpark.sfDir, p)
    assert(dfs.columns.toSeq == Seq("doc_id", "n_terms", "score"))
    val scores = dfs.collect().map(_.getLong(2))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
  }

  test("q82 tfidf keywords: 3 ranked keywords per doc, present in the doc, points non-increasing") {
    val rows = Search.tfidfKeywords(spark, TestSpark.sfDir, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val texts = Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == texts.size)
    byDoc.foreach { case (id, ks) =>
      assert(ks.map(_._2).sorted.toSeq == Seq(1, 2, 3), s"doc $id ranks")
      val ordered = ks.sortBy(_._2)
      ordered.zip(ordered.tail).foreach { case (hi, lo) =>
        assert(hi._4 >= lo._4, s"doc $id points not monotone") }
      ks.foreach { case (_, _, w, _) =>
        assert(texts(id)(w), s"doc $id keyword $w not in doc") }
    }
  }

  test("bm25 plan broadcasts df and stats; corpus side never shuffles for the join") {
    val plan = Search.bm25(spark, TestSpark.sfDir, Search.DefaultQuery)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
