package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryEngine

/** Decision record for the Iceberg `time` type (round-12 verdict Next
  * #10, SURVEY §7.3 risk 1): the reference maps `time` to Arrow
  * Time64ns (/root/reference/server/storage/parquet/schema.go:163-164);
  * Spark has NO time-of-day type, so graft stores it as LongType
  * MICROS-OF-DAY with the declared type carried in the
  * `graft.type.<col>` property — this spec pins the whole mapping
  * end-to-end: DDL accepts it, storage is int64 micros, SHOW surfaces
  * `time` (not bigint), the Iceberg metadata mirror emits spec type
  * `time`, and values round-trip arithmetically. */
class TimeTypeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)

  test("time column: DDL -> int64-micros storage -> SHOW/metadata round-trip") {
    engine.execute("CREATE DATABASE IF NOT EXISTS timedb")
    engine.execute("DROP TABLE IF EXISTS timedb.t")
    engine.execute(
      """CREATE TABLE timedb.t (id int64 NOT NULL, open_at time)
        |STORAGE filesystem""".stripMargin)
    // micros-of-day: 09:30:00 = 34_200_000_000
    engine.execute(
      "INSERT INTO timedb.t VALUES (1, 34200000000), (2, 61200000000)")

    // storage is long micros (Spark schema)
    val dt = spark.table("timedb.t").schema("open_at").dataType
    assert(dt == org.apache.spark.sql.types.LongType,
      s"time must store as int64 micros-of-day, got $dt")

    // values are arithmetically usable as micros-of-day
    val hours = engine.execute(
      "SELECT id, open_at div 3600000000 AS hour FROM timedb.t ORDER BY id")
    assert(hours.data == Seq(Seq(1L, 9L), Seq(2L, 17L)))

    // SHOW surfaces the DECLARED type, not the storage type
    val showCols = engine.execute("SHOW COLUMNS FROM timedb.t")
    val openAt = showCols.data.find(_.head == "open_at").get
    assert(openAt.exists(v => v != null && v.toString.toLowerCase == "time"),
      s"SHOW COLUMNS must report 'time': $openAt")
    val showCreate = engine.execute("SHOW CREATE TABLE timedb.t")
      .data.flatten.mkString(" ").toLowerCase
    assert(showCreate.contains("open_at") &&
      showCreate.matches("(?s).*open_at[` ]+time\\b.*"),
      s"SHOW CREATE TABLE must render the time type:\n$showCreate")

    // the Iceberg mirror (commit-log default-on) emits spec type 'time'
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("timedb.t")).location)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val md = {
      val hintIn = fs.open(new org.apache.hadoop.fs.Path(
        graft.engine.IcebergMetadata.metadataDir(loc), "version-hint.text"))
      val v = try scala.io.Source.fromInputStream(hintIn, "UTF-8")
        .mkString.trim finally hintIn.close()
      val in = fs.open(new org.apache.hadoop.fs.Path(
        graft.engine.IcebergMetadata.metadataDir(loc), s"v$v.metadata.json"))
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    }
    val fields = md.get("schemas").get(0).get("fields")
    val tf = (0 until fields.size).map(fields.get)
      .find(_.get("name").asText == "open_at").get
    assert(tf.get("type").asText == "time",
      s"iceberg mirror must emit spec type 'time': $tf")
  }
}
