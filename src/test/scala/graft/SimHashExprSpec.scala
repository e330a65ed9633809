package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.SimHash64Expr

class SimHashExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expression is bit-compatible with the HOF formulation") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .limit(100)
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val both = docs.select(
      col("doc_id"),
      Text.simhash64(col("toks")).as("hof"),
      SimHash64Expr.simhash64(col("toks")).as("native"))
    val mismatches = both.where(col("hof") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("SQL registration works and handles null/empty arrays") {
    SimHash64Expr.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS h1,
        |       simhash64(array()) AS h2,
        |       simhash64(CAST(NULL AS ARRAY<STRING>)) AS h3""".stripMargin)
      .collect().head
    assert(!r.isNullAt(0))
    assert(r.getLong(1) == 0L) // empty array: all vote sums 0 -> no bits set
    assert(r.isNullAt(2)) // null input propagates null
  }

  test("native expression is faster than the HOF version") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(Text.tokens(col("text")).as("toks")).cache()
    docs.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm-up both paths
    docs.select(Text.simhash64(col("toks"))).foreach(_ => ())
    docs.select(SimHash64Expr.simhash64(col("toks"))).foreach(_ => ())
    val hof = time(docs.select(Text.simhash64(col("toks"))).foreach(_ => ()))
    val native = time(docs.select(SimHash64Expr.simhash64(col("toks"))).foreach(_ => ()))
    info(f"HOF: $hof%.3fs native: $native%.3fs speedup: ${hof / native}%.1fx")
    assert(native < hof, s"native ($native s) should beat HOF ($hof s)")
    docs.unpersist()
  }
}
