package graft

import org.scalatest.funsuite.AnyFunSuite

/** spark.sql(...) accepts the ranger dialect directly via the injected
  * GraftSqlParser (no facade needed). */
class DialectParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spark.sql runs dialect CREATE TABLE; standard SQL untouched") {
    spark.sql("CREATE DATABASE IF NOT EXISTS dp")
    spark.sql("DROP TABLE IF EXISTS dp.direct")
    spark.sql(
      """CREATE TABLE dp.direct (
        |  id int64 NOT NULL,
        |  tags list<string>,
        |  bal decimal(10,2)
        |) STORAGE memory SETTINGS compression=snappy""".stripMargin)
    val schema = spark.table("dp.direct").schema
    assert(schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(schema("tags").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    spark.sql("INSERT INTO dp.direct VALUES (1, array('x'), 9.50)")
    assert(spark.sql("SELECT count(*) FROM dp.direct").collect().head.getLong(0) == 1)
    // standard Spark DDL still parses (delegate path)
    spark.sql("DROP TABLE IF EXISTS dp.std")
    spark.sql("CREATE TABLE dp.std (a BIGINT) USING parquet")
    assert(spark.table("dp.std").schema("a").dataType ==
      org.apache.spark.sql.types.LongType)
    // dialect errors surface (bad codec)
    assertThrows[Exception](spark.sql(
      "CREATE TABLE dp.bad (a int32) STORAGE memory SETTINGS compression=rar"))
    spark.sql("DROP TABLE dp.direct")
    spark.sql("DROP TABLE dp.std")
  }

  test("unqualified dialect CREATE lands in the current database") {
    spark.sql("CREATE DATABASE IF NOT EXISTS dp2")
    spark.sql("USE dp2")
    try {
      spark.sql("CREATE TABLE unq (id int64) STORAGE filesystem")
      assert(spark.sql("SHOW TABLES IN dp2").collect()
        .map(_.getString(1)).contains("unq"))
      spark.sql("DROP TABLE unq")
    } finally spark.sql("USE default")
  }
}
