package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.ParquetWriter

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("approx sketches land within tolerance of exact") {
    // q51 asserts the sketch error bounds inside the query (the *_ok
    // boolean columns the oracle pins to TRUE) and carries the exact
    // stats alongside; verify the booleans hold and the exact counts
    // agree with an independent aggregation.
    val rows = Similarity.queries("q51_approx_stats")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("hll_orders_ok", "hll_parts_ok", "p50_ok", "p95_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"$c false for ${r.getString(0)}")
      }
    }
    val exact = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("exact_orders")) == exact(r.getString(0)))
    }
  }
}

class ParquetWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rotation: maxRecordsPerFile splits output; codec applied; roundtrip") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pw").toString
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .coalesce(1)
    ParquetWriter.write(df, s"$tmp/out", codec = "zstd",
      maxRecordsPerFile = 3000)
    val files = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"rotation produced ${files.length} files")
    assert(files.forall(_.getName.contains("zstd")))
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 10000)
    assert(back.agg(sum("id")).collect().head.getLong(0) == 50005000L)
  }

  test("unknown codec rejected") {
    import spark.implicits._
    assertThrows[IllegalArgumentException](
      ParquetWriter.write(Seq(1).toDF("x"), "/tmp/nope", codec = "rar"))
  }
}
