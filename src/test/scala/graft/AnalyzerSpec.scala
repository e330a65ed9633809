package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryAnalyzer

class AnalyzerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("simple select analyzes as SIMPLE") {
    val a = QueryAnalyzer.analyze(spark, "SELECT c_name FROM customer WHERE c_custkey = 1 LIMIT 1")
    assert(a.statementType == "SELECT")
    assert(a.tables == Seq("customer"))
    assert(!a.hasJoins && !a.hasAggregations && a.complexity == "SIMPLE")
  }

  test("implicit multi-table join + agg analyzes as COMPLEX with hints") {
    val a = QueryAnalyzer.analyze(spark,
      "SELECT * FROM customer, orders WHERE c_custkey = o_custkey GROUP BY c_name")
    assert(a.hasJoins && a.hasAggregations)
    assert(a.complexity == "COMPLEX")
    assert(a.hints.exists(_.contains("SELECT *")))
  }

  test("IN subquery detected") {
    val a = QueryAnalyzer.analyze(spark,
      "SELECT c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)")
    assert(a.hasSubqueries)
    assert(a.tables.toSet == Set("customer", "orders"))
  }
}
