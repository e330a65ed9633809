package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.ParquetWriter

class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("approx sketches land within tolerance of exact") {
    val approx = Similarity.queries("q51_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](3))).toMap
    val exact = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orders"),
           expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (orders, p50)) =>
      val (aOrders, quantiles) = approx(flag)
      assert(math.abs(aOrders - orders).toDouble / orders < 0.05,
        s"$flag HLL off: $aOrders vs $orders")
      assert(math.abs(quantiles.head - p50) / p50 < 0.05,
        s"$flag p50 off: ${quantiles.head} vs $p50")
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
