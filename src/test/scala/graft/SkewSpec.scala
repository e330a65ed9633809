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
}
