package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DocStream recovery contract, pinned (round-7 verdict item 7):
  * with a replayable (file) source, a pinned checkpointLocation, and
  * the file sink's commit log, a killed-and-restarted query emits each
  * input row's derivation EXACTLY once; without the checkpoint, the
  * restart is a new query and the full history re-emits. `stop()`
  * between micro-batches stands in for the kill — the checkpoint and
  * sink-log mechanics exercised are the same ones a mid-batch crash
  * relies on (an uncommitted batch simply re-plans on restart). */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeJson(dir: String, name: String,
                        lines: Seq[String]): Unit = {
    // write whole files atomically-enough for the file source (write
    // to a dot-temp, then move into place)
    val stage = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(stage,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(stage, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def docLine(id: Long, nTokens: Int): String = {
    val text = (1 to nTokens).map(i => s"d${id}w$i").mkString(" ")
    s"""{"doc_id": $id, "text": "$text", "ts": "2026-01-01T00:0$id:00.000Z"}"""
  }

  private def runChunkQuery(src: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.schema(docSchema).json(src)
    val q = graft.streaming.DocStream.chunkStream(stream)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  test("chunkStream restart from its checkpoint emits every chunk exactly once") {
    val (src, out, ckpt) = (tmp("rec_src"), tmp("rec_out"), tmp("rec_ckpt"))
    writeJson(src, "b1.json", Seq(docLine(1, 80), docLine(2, 40)))
    runChunkQuery(src, out, ckpt) // first life of the query
    // kill happened here; second life, SAME checkpoint, new data
    writeJson(src, "b2.json", Seq(docLine(3, 60)))
    runChunkQuery(src, out, ckpt)
    val chunks = spark.read.parquet(out)
    // no (doc, chunk) emitted twice across the restart
    val dupes = chunks.groupBy(col("doc_id"), col("chunk_idx"))
      .count().where(col("count") > 1).count()
    assert(dupes == 0, s"$dupes duplicate chunks after restart")
    // both lives' data present, chunk counts matching the batch
    // operator's geometry on the same inputs
    val byDoc = chunks.groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    import spark.implicits._
    val batchEquiv = graft.operators.Curation.chunkWithOverlap(
      Seq((1L, (1 to 80).map(i => s"d1w$i").mkString(" ")),
          (2L, (1 to 40).map(i => s"d2w$i").mkString(" ")),
          (3L, (1 to 60).map(i => s"d3w$i").mkString(" ")))
        .toDF("doc_id", "text"))
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == batchEquiv, "restarted stream diverged from batch")
  }

  test("restart WITHOUT the checkpoint is a new query: history re-emits") {
    val (src, out1, ckpt1) = (tmp("rec2_src"), tmp("rec2_out"), tmp("rec2_ck"))
    writeJson(src, "b1.json", Seq(docLine(1, 80)))
    runChunkQuery(src, out1, ckpt1)
    val firstCount = spark.read.parquet(out1).count()
    assert(firstCount > 0)
    // "restart" with a FRESH checkpoint (and its own sink dir): the
    // file source re-reads b1.json from offset zero — this is the
    // re-emission hazard the recovery contract documents
    val (out2, ckpt2) = (tmp("rec2_out_b"), tmp("rec2_ck_b"))
    runChunkQuery(src, out2, ckpt2)
    assert(spark.read.parquet(out2).count() == firstCount,
      "fresh-checkpoint restart should replay the full history")
  }

  test("vecIngestStream restart from its checkpoint assigns each vector exactly once") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("ts", TimestampType)))
    def vecLine(id: Long): String = {
      val emb = (1 to 8).map(j => (id + j) % 5 * 0.25f).mkString("[", ",", "]")
      s"""{"vec_id": $id, "embedding": $emb, "ts": "2026-01-01T00:0$id:00.000Z"}"""
    }
    val cents = Seq(Seq.fill(8)(0.0), Seq.fill(8)(1.0))
    val (src, out, ckpt) = (tmp("vrec_src"), tmp("vrec_out"), tmp("vrec_ck"))
    def run(): Unit = {
      val stream = spark.readStream.schema(vecSchema).json(src)
      val q = graft.streaming.DocStream.vecIngestStream(stream, cents)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeJson(src, "v1.json", Seq(vecLine(1), vecLine(2)))
    run()
    writeJson(src, "v2.json", Seq(vecLine(3)))
    run()
    val rows = spark.read.parquet(out).groupBy(col("vec_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"expected one assignment per vector, got $rows")
  }
}
