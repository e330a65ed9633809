package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.ArrayOps

class ArrayOpsExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native shingles match the HOF formulation as sets") {
    val df = Seq("a b c d e", "x y", "p p p p").toDF("text")
      .select(
        array_sort(array_distinct(Text.shingles(Text.tokens(col("text")), 2))).as("hof"),
        array_sort(ArrayOps.wordShingles(Text.tokens(col("text")), 2)).as("native"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("native minhash: identical sets agree, different sets differ, width respected") {
    val df = Seq("a b c d e f g h", "a b c d e f g h", "q r s t u v w x")
      .toDF("text")
      .select(ArrayOps.minhashSig(
        ArrayOps.wordShingles(Text.tokens(col("text")), 2), 32).as("mh"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1) && rows(0) != rows(2) && rows(0).length == 32)
  }

  test("native dot product matches HOF aggregate bit-for-bit") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
      .select(
        ArrayOps.dotProduct(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
    val r = df.collect().head
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
  }

  test("hyperplane bucket: deterministic, opposite vectors land apart") {
    val planes = Seq.fill(4)(Seq.fill(3)(1.0)) // all-ones planes
    val df = Seq(Seq(1.0, 1.0, 1.0), Seq(-1.0, -1.0, -1.0)).toDF("v")
      .select(ArrayOps.hyperplaneBucket(col("v"), planes).as("b"))
    val bs = df.collect().map(_.getLong(0))
    assert(bs(0) == 15L && bs(1) == 0L)
  }

  test("sortedHashes skips null elements instead of hashing them to 0") {
    // round-7 ADVICE: a 0L placeholder made nulls collide with each
    // other (and with any string hashing to 0) in sorted-intersect
    val df = Seq(1).toDF("x").select(
      ArrayOps.sortedHashes(
        expr("array('a', CAST(NULL AS STRING), 'b')")).as("withNull"),
      ArrayOps.sortedHashes(expr("array('a', 'b')")).as("noNull"),
      ArrayOps.sortedHashes(
        expr("array(CAST(NULL AS STRING), CAST(NULL AS STRING))"))
        .as("allNull"))
    val r = df.collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](2).isEmpty)
  }

  test("intraDocDedup tolerates null tokens (rebuilds them as empty)") {
    val df = Seq(1).toDF("x").select(
      ArrayOps.intraDocDedup(
        expr("array('a', CAST(NULL AS STRING), 'b')"), 2).as("d"))
    val r = df.select(col("d.kept_tokens"), col("d.kept_text")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getString(1) == "a  b") // null renders empty, stays counted
  }
}

class IntersectCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native intersect count matches array_intersect size") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("x"), Seq("y")),
      (Seq[String](), Seq("a")))
      .toDF("a", "b")
      .select(
        ArrayOps.intersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    df.collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
