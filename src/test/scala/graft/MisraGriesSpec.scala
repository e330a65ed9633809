package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.expressions.{MgSummary, MisraGriesAgg}

/** The custom Catalyst aggregate behind q57b: Misra-Gries bounded
  * summaries must (a) retain every item above the n/(capacity+1)
  * frequency threshold — the superset guarantee the exact recount
  * pass relies on — under BOTH the streaming update and the
  * summary-merge rule, and (b) make the end-to-end heavy-hitter query
  * partition-layout independent. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactOver(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("summary superset guarantee on adversarial single-stream folds") {
    val rng = new scala.util.Random(41)
    for (cap <- Seq(3, 7, 16); trial <- 0 until 20) {
      // skewed stream: few heavy tokens + a long tail
      val heavy = Seq.fill(rng.nextInt(4) + 1)("H" + rng.nextInt(3))
      val items = rng.shuffle(
        (0 until 400).map(_ =>
          if (rng.nextInt(100) < 40) heavy(rng.nextInt(heavy.size))
          else "t" + rng.nextInt(150)))
      val s = new MgSummary(cap)
      items.foreach(s.add)
      assert(s.n == items.size)
      assert(s.counts.size <= cap)
      val exact = exactOver(items)
      exact.foreach { case (k, c) =>
        if (c * (cap + 1) > items.size.toLong)
          assert(s.tokens.contains(k),
            s"cap=$cap trial=$trial lost heavy hitter $k ($c/${items.size})")
      }
    }
  }

  test("merge rule preserves the guarantee across arbitrary merge trees") {
    val rng = new scala.util.Random(43)
    for (cap <- Seq(4, 16); trial <- 0 until 15) {
      val shards = (0 until 6).map { _ =>
        (0 until 150).map(_ =>
          if (rng.nextInt(100) < 35) "hot" + rng.nextInt(2)
          else "c" + rng.nextInt(120))
      }
      val merged = shards
        .map { sh => val s = new MgSummary(cap); sh.foreach(s.add); s }
        .reduce { (a, b) => a.mergeWith(b); a }
      val all = shards.flatten
      assert(merged.n == all.size)
      assert(merged.counts.size <= cap)
      exactOver(all).foreach { case (k, c) =>
        if (c * (cap + 1) > all.size.toLong)
          assert(merged.tokens.contains(k),
            s"cap=$cap trial=$trial merge lost $k ($c/${all.size})")
      }
    }
  }

  test("serialize round-trips the buffer exactly") {
    val s = new MgSummary(5)
    Seq("a", "b", "a", "c", "a", "d", "e", "f", "b").foreach(s.add)
    val back = MgSummary.fromBytes(s.toBytes)
    assert(back.capacity == s.capacity)
    assert(back.n == s.n)
    assert(back.counts == s.counts)
  }

  test("mg_summary is SQL-registered via GraftExtensions") {
    Seq("a", "a", "a", "b", "c").toDF("tok").createOrReplaceTempView("mg_t")
    val r = spark.sql(
      "SELECT s.n AS n, s.cands AS cands FROM " +
        "(SELECT mg_summary(tok, 2) AS s FROM mg_t)").head
    assert(r.getLong(0) == 5L)
    assert(r.getSeq[String](1).contains("a")) // freq 3 > 5/3
  }

  test("streaming face: running summary equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocStream.heavyHittersStream(stream, 7)
      .writeStream.format("memory").queryName("mg_hh")
      .outputMode("complete").start()
    try {
      input.addData((1L, "a a a b c"), (2L, "a d e f g"))
      q.processAllAvailable()
      input.addData((3L, "a a h i j"), (4L, "k l m n o"))
      q.processAllAvailable()
      val r = spark.table("mg_hh").head
      assert(r.getLong(0) == 20L)
      // the guarantee (not buffer-identity — merge order differs
      // between the state store and a sequential fold): bounded size,
      // and every token above n/(cap+1) resident. 'a' has freq 6 >
      // 20/8; nothing else exceeds it.
      assert(r.getSeq[String](1).size <= 7)
      assert(r.getSeq[String](1).contains("a"))
    } finally q.stop()
  }

  test("end-to-end aggregate: exact recount is partition-layout independent") {
    val rng = new scala.util.Random(47)
    val items = (0 until 3000).map(_ =>
      if (rng.nextInt(100) < 30) "heavy" + rng.nextInt(3)
      else "tail" + rng.nextInt(800))
    val exact = exactOver(items)
    val n = items.size.toLong
    val cap = 63
    val want = exact.filter { case (_, c) => c * (cap + 1) > n }

    val results = Seq(1, 3, 13).map { parts =>
      val toks = items.toDF("tok").repartition(parts)
      val row = toks.agg(MisraGriesAgg.mgSummary(col("tok"), cap).as("s"))
        .head.getStruct(0)
      assert(row.getLong(0) == n)
      val cands = row.getSeq[String](1)
      assert(cands.size <= cap)
      // candidates must cover the true heavy hitters; the recount
      // + threshold then yields the exact answer
      want.keySet.foreach(k => assert(cands.contains(k)))
      toks.filter(col("tok").isin(cands: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .where(col("freq") * lit(cap + 1L) > lit(n))
        .as[(String, Long)].collect().toMap
    }
    results.foreach(r => assert(r == want))
  }

  test("mistyped input is rejected at analysis, not as an executor CCE") {
    import spark.implicits._
    val nums = Seq(1L, 2L, 2L).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      nums.agg(MisraGriesAgg.mgSummary(col("v"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"),
      s"expected a type error naming STRING, got: ${e.getMessage}")
  }
}
