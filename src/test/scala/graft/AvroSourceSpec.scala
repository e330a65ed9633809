package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvroSource

/** Reads the reference's own Avro fixtures (read-only test data). */
class AvroSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val fixtures = "/root/reference/testdata"

  test("flat avro file reads with correct schema and rows") {
    val f = new java.io.File(s"$fixtures/simple_users.avro")
    assume(f.exists(), "reference fixture not present")
    val df = AvroSource.read(spark, f.getPath)
    assert(df.count() > 0)
    assert(df.schema.fieldNames.nonEmpty)
    // every row materializes without conversion errors
    df.collect().foreach(r => assert(r.length == df.schema.length))
  }

  test("deeply nested avro (github commits) reads: records, arrays, timestamps") {
    val f = new java.io.File(s"$fixtures/githubsamplecommits.avro")
    assume(f.exists(), "reference fixture not present")
    val df = AvroSource.read(spark, f.getPath)
    assert(df.count() > 0)
    val names = df.schema.fieldNames.toSet
    assert(names.contains("commit") && names.contains("author"))
    // nested author struct with a timestamp-typed date field survives
    val author = df.schema("author").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(author.fieldNames.contains("date"))
    // array columns decode
    val first = df.select("parent").collect().head
    assert(first.get(0) == null || first.get(0).isInstanceOf[scala.collection.Seq[_]])
    // and the frame supports normal relational ops downstream
    assert(df.selectExpr("commit", "author.name").where("commit IS NOT NULL").count() > 0)
  }
}

/** Hive-partitioned parquet discovery over the reference's demo dataset. */
class PartitionDiscoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("year=/month= directories become partition columns with pruning") {
    val dir = new java.io.File("/root/reference/demo")
    assume(dir.isDirectory, "reference demo dataset not present")
    val df = spark.read.parquet(dir.getPath)
    val cols = df.schema.fieldNames.map(_.toLowerCase).toSet
    assert(cols.contains("year") && cols.contains("month"))
    val one = df.where("month = 3")
    assert(one.count() > 0)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
           scan.contains("month"), s"partition pruning missing:\n$scan")
  }
}
