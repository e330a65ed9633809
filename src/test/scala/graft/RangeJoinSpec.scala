package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Boundary semantics of the binned range join (q99's
  * `Relational.rangeJoinBinned`) on planted timestamps, plus the
  * brute-force equivalence that proves two bucket replicas suffice.
  * Window [ta, ta+W): the left edge is INCLUSIVE, the right edge
  * EXCLUSIVE, and a match must be found whether it lands in the
  * view's own bucket or the next one. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 1000L // tiny bucket width to make boundaries exact

  private def run(views: Seq[(Long, Long)], buys: Seq[(Long, Double)]) =
    graft.operators.Relational.rangeJoinBinned(
      views.toDF("event_id", "ta"), buys.toDF("tb", "value"), W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

  test("window edges: [ta, ta+W) inclusive-exclusive, both buckets probed") {
    // view 1: ta mid-bucket (250) — window spans bucket 0 and bucket 1
    // view 2: ta bucket-aligned (3000) — window is exactly bucket 3
    val views = Seq((1L, 250L), (2L, 3000L))
    val buys = Seq(
      (250L, 1.0),   // == ta        -> included (left edge)
      (1249L, 2.0),  // ta+W-1, in NEXT bucket -> included
      (1250L, 4.0),  // == ta+W      -> excluded (right edge)
      (249L, 8.0),   // before ta    -> excluded
      (3999L, 16.0), // view 2: last µs of its aligned window -> included
      (4000L, 32.0)) // view 2: == ta+W -> excluded
    assert(run(views, buys).toSeq ===
      Seq((1L, 2L, 3.0), (2L, 1L, 16.0)))
  }

  test("a view with no purchases in window appears zero-filled") {
    val out = run(Seq((7L, 100L)), Seq((5000L, 9.0)))
    assert(out.toSeq === Seq((7L, 0L, 0.0)))
  }

  test("bucket-boundary crossing counts once — no double count from the two replicas") {
    // purchase in the view's own bucket AND one in the next bucket;
    // each must be counted exactly once
    val out = run(Seq((1L, 900L)), Seq((950L, 1.0), (1100L, 2.0)))
    assert(out.toSeq === Seq((1L, 2L, 3.0)))
  }

  test("matches brute force on random timestamps") {
    val rng = new scala.util.Random(99)
    val views = (1L to 200L).map(i => (i, rng.nextLong(20000L)))
    val buys = (0 until 500).map(_ =>
      (rng.nextLong(20000L), (rng.nextInt(100) + 1).toDouble))
    val expected = views.map { case (id, ta) =>
      val inWin = buys.filter { case (tb, _) => tb >= ta && tb < ta + W }
      (id, inWin.size.toLong,
       BigDecimal(inWin.map(_._2).sum).setScale(2,
         BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(run(views, buys).toSeq === expected)
  }
}
