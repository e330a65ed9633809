package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerKey

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("custom top-k operator matches the window formulation") {
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCustom = TopKPerKey(
      orders.select("o_custkey", "o_orderkey", "o_totalprice"),
      keys = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> true, "o_orderkey" -> false),
      k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaCustom == viaWindow)
  }

  test("custom operator plans without a sort, with one hash exchange") {
    val orders = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Sort "), s"unexpected sort in:\n$p")
    assert(p.contains("hashpartitioning(o_custkey"), p)
  }

  test("extension-registered SQL functions work without manual registration") {
    val r = spark.sql(
      """SELECT simhash64(array('a','b','c')) AS sh,
        |       size(minhash_sig(array('a','b','c'), 16)) AS mw,
        |       word_shingles(array('a','b','c'), 2) AS ws""".stripMargin)
      .collect().head
    assert(!r.isNullAt(0))
    assert(r.getInt(1) == 16)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
  }

  test("ties and k larger than group size behave like the window version") {
    import spark.implicits._
    val df = Seq((1, 5.0, 1L), (1, 5.0, 2L), (1, 3.0, 3L), (2, 1.0, 4L))
      .toDF("k", "v", "id")
    val got = TopKPerKey(df, Seq("k"),
      Seq("v" -> true, "id" -> false), 2)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(got == Set((1, 1L), (1, 2L), (2, 4L)))
  }
}

class RankToTopKRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def windowTopK(pred: String) = {
    graft.sources.Tables.load(spark, dir, "orders")
      .createOrReplaceTempView("rtk_orders")
    spark.sql(
      s"""SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
         |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         |  FROM rtk_orders) WHERE $pred""".stripMargin)
  }

  test("window row_number <= k rewrites to TopKPerKey and matches results") {
    val df = windowTopK("rn <= 3")
    assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"),
      df.queryExecution.optimizedPlan.toString)
    // results identical to the un-rewritten window (computed via rn kept)
    val expected = spark.sql(
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM rtk_orders) WHERE rn <= 3""".stripMargin)
      .drop("rn").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("rn = 1 and rn < k variants rewrite; rank-in-output does not") {
    assert(windowTopK("rn = 1").queryExecution.optimizedPlan
      .toString.contains("TopKPerKeyPlan"))
    assert(windowTopK("rn < 4").queryExecution.optimizedPlan
      .toString.contains("TopKPerKeyPlan"))
    // rank kept in output -> must NOT rewrite
    val kept = spark.sql(
      """SELECT o_orderkey, rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC) AS rn
        |  FROM rtk_orders) WHERE rn <= 3""".stripMargin)
    assert(!kept.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
    assert(kept.count() == 15)
  }
}
