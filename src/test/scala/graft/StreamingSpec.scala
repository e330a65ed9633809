package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.EventsStream

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)
case class EvU(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
case class Doc(doc_id: Long, text: String, source: String, ts: Timestamp)
case class Vec(vec_id: Long, embedding: Array[Float], ts: Timestamp)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventsStream.windowedAgg(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:40:00"), "click", 2.0),
        Ev(3, ts("2024-01-01 11:10:00"), "click", 4.0),
        Ev(4, ts("2024-01-01 10:20:00"), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .orderBy("event_type", "window_start").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq ==
        Seq(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventsStream.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:01"), "click", 1.0), // dup id
        Ev(2, ts("2024-01-01 10:00:02"), "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Ev(2, ts("2024-01-01 10:00:03"), "view", 2.0), // dup across batches
        Ev(3, ts("2024-01-01 10:00:04"), "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to preceding clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EvU]
    val purchases = MemoryStream[EvU]
    val q = EventsStream
      .attributionStream(clicks.toDF(), purchases.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      val cData = Seq(
        EvU(1, ts("2024-01-01 10:00:00"), 100, 0),
        EvU(2, ts("2024-01-01 11:00:00"), 100, 0),
        EvU(3, ts("2024-01-01 10:05:00"), 200, 0))
      val pData = Seq(
        EvU(10, ts("2024-01-01 10:20:00"), 100, 9.99), // 20m after click 1
        EvU(11, ts("2024-01-01 10:50:00"), 200, 5.0),  // 45m after click 3: out
        EvU(12, ts("2024-01-01 11:10:00"), 100, 7.5))  // 10m after click 2
      clicks.addData(cData: _*)
      purchases.addData(pData: _*)
      q.processAllAvailable()
      val got = spark.table("attr").select("click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 12L)))
      // the SAME plan in batch (offline backfill) agrees row-for-row
      val batch = EventsStream
        .attributionStream(cData.toDF(), pData.toDF(), "30 minutes")
        .select("click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("file-source ingestion lands micro-batches in a table") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/src")
    spark.sql("CREATE DATABASE IF NOT EXISTS ds")
    spark.sql("DROP TABLE IF EXISTS ds.ingested")
    spark.sql("CREATE TABLE ds.ingested (id BIGINT, v STRING) USING parquet")
    val q = EventsStream.ingest(spark, s"$tmp/src", "ds.ingested", s"$tmp/ckpt")
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    assert(spark.table("ds.ingested").count() == 2)
    // batch parity: same transform runs on the batch table
    val batch = EventsStream.windowedAgg(
      graft.sources.Tables.load(spark, TestSpark.sfDir, "events"))
    assert(batch.count() > 0)
  }
}

class StatefulSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = graft.streaming.EventsStream.sessionizeStream(input.toDS(), 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0),
        (2L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 12:30:00"), 4.0)) // gap > 30min
      q.processAllAvailable()
      // the second batch starts a NEW session for user 1 and the first
      // session is emitted as closed
      val closed = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      assert(closed.contains((1L, 2L, 3.0)),
        s"expected closed session (1,2,3.0) in ${closed.mkString(",")}")
    } finally q.stop()
  }

  test("tableChanges streams committed INSERTs as an append change feed") {
    val engine = new graft.engine.QueryEngine(spark)
    engine.execute("CREATE DATABASE IF NOT EXISTS cdc")
    engine.execute("DROP TABLE IF EXISTS cdc.t")
    engine.execute("CREATE TABLE cdc.t (id int64, v string) STORAGE filesystem")
    engine.execute("INSERT INTO cdc.t VALUES (1,'a')")
    val q = graft.streaming.EventsStream.tableChanges(spark, "cdc.t")
      .writeStream.format("memory").queryName("cdc_feed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_feed").count() == 1)
      // a second commit flows through the SAME running stream
      engine.execute("INSERT INTO cdc.t VALUES (2,'b'),(3,'c')")
      q.processAllAvailable()
      val seen = spark.table("cdc_feed").collect().map(_.getLong(0)).sorted
      assert(seen.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
    engine.execute("DROP TABLE cdc.t")
  }

  test("curateStream: quality gate + cross-batch content dedup on a doc stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = ("the data " * 15).trim // 30 tokens, stopword ratio 0.5
    val short = "too short"            // fails the 20-token floor
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream.curateStream(input.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, good, "s1", ts("2024-01-01 10:00:00")),
        Doc(2, short, "s1", ts("2024-01-01 10:00:01")),
        Doc(3, good + " extra tail tokens", "s2", ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      input.addData( // same content as doc 1, later micro-batch
        Doc(4, good, "s3", ts("2024-01-01 10:00:03")))
      q.processAllAvailable()
      val ids = spark.table("curated").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 3L),
        s"expected quality reject (2) and cross-batch dup (4) dropped: ${ids.toSeq}")
    } finally q.stop()
  }

  test("nearDupAgainstCorpus flags a planted near-dup, passes novel docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.sources.Tables
      .load(spark, TestSpark.sfDir, "documents")
      .selectExpr("doc_id AS corpus_id", "text")
    val base = corpus.orderBy("corpus_id").limit(1).collect()(0)
    val (baseId, baseText) = (base.getLong(0), base.getString(1))
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream
      .nearDupAgainstCorpus(input.toDF(), corpus)
      .writeStream.format("memory").queryName("neardup_flags")
      .outputMode("append").start()
    try {
      input.addData(
        // near-copy of a corpus doc (one token appended -> jaccard ~1)
        Doc(9001, baseText + " tail", "s1", ts("2024-01-01 10:00:00")),
        // novel content sharing no shingles with the corpus
        Doc(9002, "qq ww ee rr tt yy uu ii oo pp", "s1",
            ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      val flags = spark.table("neardup_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(flags.exists { case (d, c, j) => d == 9001 && c == baseId && j >= 0.5 },
        s"planted near-dup not flagged: ${flags.mkString(",")}")
      assert(!flags.exists(_._1 == 9002), s"novel doc flagged: ${flags.mkString(",")}")
    } finally q.stop()
  }

  test("chunkStream emits the batch operator's chunks, stateless, with event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream.chunkStream(input.toDF())
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, words(40), "s1", ts("2024-01-01 10:00:00")),
        Doc(2, words(10), "s1", ts("2024-01-01 10:00:01")))
      q.processAllAvailable() // stateless: rows emit without watermark advance
      val got = spark.table("chunks").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4)))
        .sortBy(c => (c._1, c._2)).toSeq
      // the stream shares the batch code path — outputs must be equal
      val batch = graft.operators.Curation.chunkWithOverlap(
          Seq((1L, words(40)), (2L, words(10))).toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4)))
        .sortBy(c => (c._1, c._2)).toSeq
      assert(got == batch, s"stream/batch drift:\n$got\nvs\n$batch")
      assert(got.map(c => (c._1, c._2, c._3, c._4)) ==
        Seq((1L, 0, 0, 32), (1L, 1, 24, 16), (2L, 0, 0, 10)))
    } finally q.stop()
  }

  test("lmRarityStream scores arriving docs against the materialized corpus LM") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c a b"))
      .toDF("doc_id", "text")
    val lm = graft.operators.Curation.lmVocab(corpus)
    val lmMap = lm.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream.lmRarityStream(input.toDF(), lm)
      .writeStream.format("memory").queryName("lm_scores")
      .outputMode("append").start()
    try {
      input.addData(
        // all bigrams known to the LM: (a,b), (b,c), (c,a)
        Doc(100, "a b c a b", "s1", ts("2024-01-01 10:00:00")),
        // no bigram the LM has seen -> unscorable, no row
        Doc(101, "zz qq zz", "s1", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      // 1-token docs produce ZERO bigrams yet MUST advance the
      // watermark: pre-fix, docBigrams' where(size >= 2) was pushed
      // below the watermark node, so a run of short docs never
      // reached the event-time collector and doc 100 never emitted
      input.addData(Doc(102, "advance", "s1", ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      input.addData(Doc(103, "again", "s1", ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val rows = spark.table("lm_scores").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      val bigrams = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "b"))
      val want = bigrams.map(lmMap).sum
      assert(rows.toSeq == Seq((100L, 4L, want, want / 4)),
        s"expected doc 100 scored ${(4L, want, want / 4)}, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("spanCoverageStream scores arriving docs against the corpus dup-span set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two corpus docs share one exact 5-token phrase -> one dup span
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon one1 two1"),
      (2L, "pre2 alpha beta gamma delta epsilon x2"))
      .toDF("doc_id", "text")
    val dupSpans = graft.streaming.DocStream.corpusDupSpans(corpus)
    assert(dupSpans.count() == 1, "expected exactly the shared 5-gram")
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream
      .spanCoverageStream(input.toDF(), dupSpans)
      .writeStream.format("memory").queryName("span_cov")
      .outputMode("append").start()
    try {
      input.addData(
        // contains the corpus boilerplate phrase -> 5 covered tokens
        Doc(100, "zz alpha beta gamma delta epsilon yy", "s1",
            ts("2024-01-01 10:00:00")),
        // novel content -> no coverage row
        Doc(101, "qq ww ee rr tt yy uu", "s1", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      // advance the watermark past the scored docs' event time —
      // deliberately with SHORT docs (< SpanW tokens): they produce
      // zero spans but must still reach the event-time collector
      // (the operator has no pre-watermark length filter for exactly
      // this reason; a short-doc-only stream must not stall emission)
      input.addData(Doc(102, "short advance", "s1",
          ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      input.addData(Doc(103, "another advance", "s1",
          ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val rows = spark.table("span_cov").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((100L, 7L, 5L)),
        s"expected doc 100 with 5/7 covered, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("nearDupAgainstBands probes a MATERIALIZED bucketed band table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.sources.Tables
      .load(spark, TestSpark.sfDir, "documents")
      .selectExpr("doc_id AS corpus_id", "text")
    // ingest-time: band once, write bucketed on the band key — every
    // micro-batch then probes the table instead of re-banding the
    // corpus (the 100 TB shape; SCALING.md "streaming curation")
    spark.sql("CREATE DATABASE IF NOT EXISTS bandix2")
    spark.sql("DROP TABLE IF EXISTS bandix2.corpus_bands")
    graft.streaming.DocStream.corpusBands(corpus)
      .write.format("parquet").bucketBy(8, "bh")
      .saveAsTable("bandix2.corpus_bands")
    val base = corpus.orderBy("corpus_id").limit(1).collect()(0)
    val input = MemoryStream[Doc]
    val q = graft.streaming.DocStream
      .nearDupAgainstBands(input.toDF(), spark.table("bandix2.corpus_bands"))
      .writeStream.format("memory").queryName("neardup_banded")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(9101, base.getString(1) + " tail", "s1", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      val flags = spark.table("neardup_banded").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(flags.exists { case (d, c, j) =>
        d == 9101 && c == base.getLong(0) && j >= 0.5 },
        s"banded-table probe missed the planted dup: ${flags.mkString(",")}")
    } finally q.stop()
    spark.sql("DROP TABLE bandix2.corpus_bands")
  }

  test("streaming IVF ingest: stream assignments equal the batch path; cell-load monitor accounts every vector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = graft.operators.Similarity
      .lloydCodebook(spark, TestSpark.sfDir, 16, 2)
    val vecs = graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .orderBy("vec_id").limit(20).collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray,
                    ts("2024-01-01 10:05:00")))
    val expected = graft.streaming.DocStream
      .vecIngestStream(vecs.toSeq.toDF(), cents)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet

    val input = MemoryStream[Vec]
    val q = graft.streaming.DocStream.vecIngestStream(input.toDF(), cents)
      .writeStream.format("memory").queryName("vec_ingest")
      .outputMode("append").start()
    val q2 = graft.streaming.DocStream.cellLoadStream(input.toDF(), cents)
      .writeStream.format("memory").queryName("cell_load")
      .outputMode("complete").start()
    try {
      input.addData(vecs.toIndexedSeq)
      q.processAllAvailable(); q2.processAllAvailable()
      val got = spark.table("vec_ingest").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
      assert(got == expected, "stream and batch assignment diverged")
      val load = spark.table("cell_load").collect()
      assert(load.map(_.getLong(2)).sum == 20L, "monitor lost vectors")
      // the monitor's distortion sums are the per-cell sums of d_q
      val byCell = spark.table("vec_ingest").collect()
        .groupBy(_.getInt(2)).view.mapValues(_.map(_.getLong(3)).sum).toMap
      load.foreach(r =>
        assert(r.getLong(3) == byCell(r.getInt(1)), s"cell ${r.getInt(1)}"))
    } finally { q.stop(); q2.stop() }
  }
}
