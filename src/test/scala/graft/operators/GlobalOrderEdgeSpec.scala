package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge pins for the q90/q98 curriculum-order machinery after the
  * r11 driver-side prefix-sum rewrite: null text (null md5 → null
  * bucket) must behave exactly like the replaced window version —
  * such rows never joined back through the (band, bkt) equi-join, so
  * they are dropped, not NPE'd on. */
class GlobalOrderEdgeSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("null text rows drop from the global order instead of crashing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, null.asInstanceOf[String]),
      (3L, "delta epsilon zeta"),
      (4L, "eta theta iota")).toDF("doc_id", "text")
    val out = Curation.globalOrderBy(docs, lit(0L), seed = "s")
      .orderBy("global_pos").collect()
    // three non-null docs get positions 1..3; the null-text doc is
    // dropped (old window + equi-join behavior)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(!out.map(_.getLong(0)).contains(2L))
  }

  test("fractional band expressions are rejected, not truncate-merged") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    // a double band under cast("long") would silently merge bands 0.4
    // and 0.6 into band 0 — the r11 advice finding; the guard rejects
    val e = intercept[IllegalArgumentException] {
      Curation.globalOrderBy(docs, col("doc_id") / 2.0, seed = "s")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // integral widths other than long still pass (exact conversion)
    val ok = Curation.globalOrderBy(docs,
      (col("doc_id") % 2).cast("int"), seed = "s").collect()
    assert(ok.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }

  test("positions stay a permutation across bands") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"doc number $i words"))
      .toDF("doc_id", "text")
    val out = Curation.globalOrderBy(docs,
      (col("doc_id") % 5).cast("long"), seed = "x").collect()
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to 50L).toSeq)
    // band monotonicity: positions of band b all precede band b+1
    val byBand = out.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(2))).toMap
    for (b <- 0L until 4L)
      assert(byBand(b).max < byBand(b + 1).min,
        s"band $b must wholly precede band ${b + 1}")
  }
}
