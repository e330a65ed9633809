package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.QueryEngine

/** Streaming upsert sink: one MERGE per micro-batch keeps an engine
  * table current; in-batch duplicate keys collapse to the latest
  * version; the merge is idempotent (the recovery leg). */
class UpsertStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("val", StringType),
    StructField("ver", LongType)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeJson(dir: String, name: String,
                        lines: Seq[String]): Unit = {
    val stage = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(stage, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(stage, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def row(id: Long, v: String, ver: Long) =
    s"""{"id": $id, "val": "$v", "ver": $ver}"""

  private def runUpsert(src: String, ckpt: String, table: String): Unit = {
    val stream = spark.readStream.schema(schema).json(src)
    val q = graft.streaming.UpsertStream
      .upsertWriter(stream, engine, table, Seq("id"), "ver")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
  }

  private def state(table: String): Seq[List[Any]] =
    engine.execute(s"SELECT id, val, ver FROM $table ORDER BY id")
      .data.map(_.toList)

  test("stream of row versions maintains the table across restarts") {
    engine.execute("CREATE DATABASE IF NOT EXISTS ups")
    engine.execute("DROP TABLE IF EXISTS ups.t")
    engine.execute(
      "CREATE TABLE ups.t (id int64 NOT NULL, val string, ver int64) STORAGE filesystem")
    val (src, ckpt) = (tmp("ups_src"), tmp("ups_ckpt"))

    // batch 1: new keys + an in-batch duplicate (id=2 twice; ver wins)
    writeJson(src, "b1.json",
      Seq(row(1, "a", 1), row(2, "b", 1), row(2, "b2", 2)))
    runUpsert(src, ckpt, "ups.t")
    assert(state("ups.t") == Seq(
      List(1L, "a", 1L), List(2L, "b2", 2L)))

    // query killed here; second life from the SAME checkpoint
    writeJson(src, "b2.json", Seq(row(2, "b3", 3), row(3, "c", 1)))
    runUpsert(src, ckpt, "ups.t")
    assert(state("ups.t") == Seq(
      List(1L, "a", 1L), List(2L, "b3", 3L), List(3L, "c", 1L)))
  }

  test("the per-batch merge is idempotent — the at-least-once recovery leg") {
    engine.execute("CREATE DATABASE IF NOT EXISTS ups")
    engine.execute("DROP TABLE IF EXISTS ups.t2")
    engine.execute(
      "CREATE TABLE ups.t2 (id int64 NOT NULL, val string, ver int64) STORAGE filesystem")
    engine.execute("INSERT INTO ups.t2 VALUES (1,'a',1)")
    import spark.implicits._
    val batch = Seq((1L, "a2", 2L), (5L, "e", 1L)).toDF("id", "val", "ver")
    val r1 = engine.upsert("ups.t2", batch, Seq("id"))
    assert(r1.message == "MERGE 1 updated, 0 deleted, 1 inserted")
    val after1 = state("ups.t2")
    // redelivery of the same batch (foreachBatch retry): same state
    engine.upsert("ups.t2", batch, Seq("id"))
    assert(state("ups.t2") == after1)
    assert(after1 == Seq(List(1L, "a2", 2L), List(5L, "e", 1L)))
  }

  test("micro-batch upserts ride the FILE-level CoW path on an indexed table") {
    // a zonemap on the key lets each per-batch MERGE replace only the
    // files holding that batch's keys — a micro-batch against a big
    // table must not rewrite the table (r11 file-level merge scope)
    engine.execute("CREATE DATABASE IF NOT EXISTS ups")
    engine.execute("DROP TABLE IF EXISTS ups.fc")
    engine.execute(
      "CREATE TABLE ups.fc (id int64 NOT NULL, val string, ver int64) STORAGE filesystem")
    for (base <- Seq(0L, 100L, 200L, 300L)) {
      val vals = (base until base + 5L)
        .map(i => s"($i, 'v$i', 1)").mkString(", ")
      engine.execute(s"INSERT INTO ups.fc VALUES $vals")
    }
    engine.execute("CREATE INDEX zi ON ups.fc (id)")
    val before = spark.table("ups.fc").inputFiles.toSet
    assert(before.size >= 4)

    val (src, ckpt) = (tmp("ups_fc_src"), tmp("ups_fc_ckpt"))
    writeJson(src, "b1.json", Seq(row(102, "updated", 9), row(9000, "new", 1)))
    runUpsert(src, ckpt, "ups.fc")

    val after = spark.table("ups.fc").inputFiles.toSet
    val replaced = before -- after
    assert(replaced.nonEmpty && replaced.size <= 1,
      s"micro-batch should replace only the file holding id=102\n" +
        s"before=$before\nafter=$after")
    assert(engine.execute("SELECT val, ver FROM ups.fc WHERE id = 102")
      .data == Seq(Seq("updated", 9L)))
    assert(engine.execute("SELECT val FROM ups.fc WHERE id = 9000")
      .data == Seq(Seq("new")))
    assert(engine.execute("SELECT count(*) AS n FROM ups.fc")
      .data.head.head == 21L)
  }

  test("latestPerKey collapses duplicates deterministically by version") {
    import spark.implicits._
    val batch = Seq((7L, "x", 1L), (7L, "y", 3L), (7L, "z", 2L),
                    (8L, "w", 1L)).toDF("id", "val", "ver")
    val got = graft.streaming.UpsertStream
      .latestPerKey(batch, Seq("id"), "ver")
      .orderBy(col("id")).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((7L, "y", 3L), (8L, "w", 1L)))
  }
}
