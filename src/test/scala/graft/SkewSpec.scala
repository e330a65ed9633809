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
}
