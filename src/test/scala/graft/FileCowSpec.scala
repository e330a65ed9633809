package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryEngine

/** FILE-level copy-on-write DML (r11): on an unpartitioned table with
  * a zonemap index, UPDATE/DELETE rewrite ONLY the files whose
  * [min, max] can contain matched rows — every other file keeps its
  * path (and its bytes). At warehouse scale this is a point DELETE
  * rewriting one file instead of the whole table. Pins:
  *  - untouched files keep their exact paths across DELETE and UPDATE;
  *  - results and matched counts are identical to the whole-table path;
  *  - no usable index → whole-table fallback (still correct);
  *  - VERSION AS OF keeps resolving: replaced files surface from the
  *    archive, untouched ones from their live paths;
  *  - index maintenance rides the commit (zonemap stays fresh). */
class FileCowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)

  private val Db = "fcow"

  /** id-range-per-file layout: one INSERT per range. */
  private def freshTable(name: String, ranges: Int = 4): String = {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.$name")
    engine.execute(
      s"CREATE TABLE $Db.$name (id int64 NOT NULL, v string) STORAGE filesystem")
    (0 until ranges).foreach { r =>
      val vals = (r * 100 until r * 100 + 10)
        .map(i => s"($i, 'row $i')").mkString(", ")
      engine.execute(s"INSERT INTO $Db.$name VALUES $vals")
    }
    s"$Db.$name"
  }

  private def files(t: String): Set[String] =
    spark.table(t).inputFiles.toSet

  test("point DELETE rewrites only the candidate file; others keep their paths") {
    val t = freshTable("d1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val before = files(t)
    assert(before.size >= 4)

    val del = engine.execute(s"DELETE FROM $t WHERE id = 105")
    assert(del.message == "DELETE 1")
    val after = files(t)
    val untouchedBefore = before.filter(f => !f.contains("cow-"))
    // exactly one original file replaced; the others' paths unchanged
    assert((before intersect after).size == before.size - 1,
      s"expected 1 replaced file\nbefore=$before\nafter=$after")
    assert(after.exists(_.contains("cow-")), "replacement file should be staged in")
    // data correct: the row is gone, neighbors intact
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 39L)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t WHERE id = 105")
      .data.head.head == 0L)
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 104").data == Seq(Seq("row 104")))
  }

  test("point UPDATE rewrites only the candidate file with SET applied") {
    val t = freshTable("u1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val before = files(t)
    val up = engine.execute(s"UPDATE $t SET v = 'changed' WHERE id = 203")
    assert(up.message == "UPDATE 1")
    val after = files(t)
    assert((before intersect after).size == before.size - 1,
      s"expected 1 replaced file\nbefore=$before\nafter=$after")
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 203").data == Seq(Seq("changed")))
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 202").data == Seq(Seq("row 202")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 40L)
  }

  test("no usable index -> whole-table fallback, same results") {
    val t = freshTable("f1")
    val before = files(t)
    val del = engine.execute(s"DELETE FROM $t WHERE id = 105")
    assert(del.message == "DELETE 1")
    // full rewrite: no original path survives
    assert((before intersect files(t)).isEmpty)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 39L)
  }

  test("VERSION AS OF resolves across a file-level DELETE (archive-else-live)") {
    val t = freshTable("s1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val del = engine.execute(s"DELETE FROM $t WHERE id BETWEEN 100 AND 104")
    assert(del.message == "DELETE 5")
    // snapshot 1 = pre-DELETE state: replaced file from the archive,
    // untouched files from their live paths
    val old = engine.execute(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
    assert(old.data.head.head == 40L)
    assert(engine.execute(
      s"SELECT count(*) AS n FROM $t VERSION AS OF 1 WHERE id = 102")
      .data.head.head == 1L)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 35L)
  }

  test("PARTITIONED table: data-column DELETE rewrites one file, siblings in the partition survive") {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.pd")
    engine.execute(
      s"""CREATE TABLE $Db.pd (id int64 NOT NULL, v string, p string)
         |STORAGE filesystem PARTITION BY (p)""".stripMargin)
    // 3 inserts × 2 partitions = 6 files; insert i holds ids
    // [i*100, i*100+4] in 'a' and [i*100+5, i*100+9] in 'b'
    for (i <- 0 until 3) {
      val a = (0 until 5).map(k => s"(${i * 100 + k}, 'row ${i * 100 + k}', 'a')")
      val b = (5 until 10).map(k => s"(${i * 100 + k}, 'row ${i * 100 + k}', 'b')")
      engine.execute(s"INSERT INTO $Db.pd VALUES ${(a ++ b).mkString(", ")}")
    }
    engine.execute(s"CREATE INDEX zi ON $Db.pd (id)")
    val before = files(s"$Db.pd")
    assert(before.size >= 6)

    // id=103 lives only in insert-1's 'a' file
    val del = engine.execute(s"DELETE FROM $Db.pd WHERE id = 103")
    assert(del.message == "DELETE 1")
    val after = files(s"$Db.pd")
    assert((before intersect after).size == before.size - 1,
      s"one file replaced\nbefore=$before\nafter=$after")
    // the replacement landed INSIDE the partition dir
    assert(after.exists(f => f.contains("p=a") && f.contains("cow-")),
      s"replacement must live in p=a: $after")
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pd").data.head.head == 29L)
    assert(engine.execute(
      s"SELECT v FROM $Db.pd WHERE id = 102").data == Seq(Seq("row 102")))
    assert(engine.execute(
      s"SELECT count(*) AS n FROM $Db.pd WHERE p = 'b'").data.head.head == 15L)

    // file-level UPDATE on a data column inside a partition
    val up = engine.execute(s"UPDATE $Db.pd SET v = 'fixed' WHERE id = 205")
    assert(up.message == "UPDATE 1")
    assert(engine.execute(s"SELECT v FROM $Db.pd WHERE id = 205").data == Seq(Seq("fixed")))
    assert(engine.execute(s"SELECT v FROM $Db.pd WHERE id = 206").data == Seq(Seq("row 206")))

    // partition-column SET falls back to the safe path, still correct
    val mv = engine.execute(s"UPDATE $Db.pd SET p = 'b' WHERE id = 0")
    assert(mv.message == "UPDATE 1")
    assert(engine.execute(
      s"SELECT p FROM $Db.pd WHERE id = 0").data == Seq(Seq("b")))
  }

  test("PARTITIONED table: a partition emptied file-by-file leaves the catalog") {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.pe")
    engine.execute(
      s"""CREATE TABLE $Db.pe (id int64 NOT NULL, v string, p string)
         |STORAGE filesystem PARTITION BY (p)""".stripMargin)
    engine.execute(s"INSERT INTO $Db.pe VALUES (1, 'a', 'x'), (100, 'b', 'y')")
    engine.execute(s"CREATE INDEX zi ON $Db.pe (id)")
    val del = engine.execute(s"DELETE FROM $Db.pe WHERE id = 100")
    assert(del.message == "DELETE 1")
    val partsShown = spark.sql(s"SHOW PARTITIONS $Db.pe")
      .collect().map(_.getString(0)).toSeq
    assert(partsShown == Seq("p=x"),
      s"emptied partition should drop from the catalog, got $partsShown")
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pe").data.head.head == 1L)
  }

  test("MERGE with narrow source keys rewrites only candidate files") {
    val t = freshTable("mg1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val before = files(t)
    // source touches ids 100-102 (insert-1's file) + one new id
    val m = engine.execute(
      s"""MERGE INTO $t AS tg
         |USING (SELECT * FROM (VALUES (100, 'u100'), (102, 'u102'),
         |  (9000, 'new')) AS v(id, v)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(m.message == "MERGE 2 updated, 0 deleted, 1 inserted", m.message)
    val after = files(t)
    // only files holding key rows (ids 100/102 — VALUES chunking may
    // split them across two files) are replaced; every other original
    // file keeps its path (inserts ride the staged files)
    val replaced = before -- after
    assert(replaced.nonEmpty && replaced.size <= 2,
      s"expected <=2 replaced files\nbefore=$before\nafter=$after")
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 100").data == Seq(Seq("u100")))
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 101").data == Seq(Seq("row 101")))
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 9000").data == Seq(Seq("new")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 41L)
  }

  test("MERGE from a NON-DETERMINISTIC source materializes it once (no duplicate inserts)") {
    // a rand()-derived key set would re-evaluate per job: the
    // file-scope key collection could see keys the merge join does
    // not — a genuine match outside the scope resurrects as a
    // duplicate insert (the round-11 advice finding). The engine now
    // localCheckpoints such sources; every key must land exactly once.
    val t = freshTable("mnd")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    for (round <- 1 to 3) {
      val m = engine.execute(
        s"""MERGE INTO $t AS tg
           |USING (SELECT CAST(floor(rand() * 400) AS BIGINT) AS id,
           |              'upserted' AS v) AS s
           |ON tg.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.v)""".stripMargin)
      assert(m.rowCount == 1, s"round $round: ${m.message}")
      val dups = engine.execute(
        s"SELECT id FROM $t GROUP BY id HAVING count(*) > 1")
      assert(dups.rowCount == 0,
        s"round $round: duplicate keys after merge: ${dups.data}")
    }
  }

  test("MERGE whose keys miss every file is a pure append (no file replaced)") {
    val t = freshTable("mg2")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val before = files(t)
    val m = engine.execute(
      s"""MERGE INTO $t AS tg
         |USING (SELECT * FROM (VALUES (5000, 'a'), (5001, 'b')) AS v(id, v)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(m.message == "MERGE 0 updated, 0 deleted, 2 inserted", m.message)
    assert((before -- files(t)).isEmpty, "no original file may be replaced")
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 42L)
    // and the appended rows are findable (index synced over new file)
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 5001").data == Seq(Seq("b")))
  }

  test("MERGE with a DELETE clause stays exact under file-level scope") {
    val t = freshTable("mg3")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val m = engine.execute(
      s"""MERGE INTO $t AS tg
         |USING (SELECT * FROM (VALUES (200, 0), (201, 1)) AS v(id, del)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED AND s.del = 1 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = 'kept'""".stripMargin)
    assert(m.message == "MERGE 1 updated, 1 deleted, 0 inserted", m.message)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t WHERE id = 201").data.head.head == 0L)
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 200").data == Seq(Seq("kept")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 39L)
  }

  test("MERGE with >10 source keys (InSet form) still rides file-level scope") {
    // OptimizeIn rewrites the scope's IN predicate to InSet past 10
    // values — the rule must read that form or every 11..1000-key
    // MERGE silently degrades to the whole-table rewrite
    val t = freshTable("mg4")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    val before = files(t)
    val keys = (100 to 109).map(i => s"($i, 'u$i')") :+ "(205, 'u205')" :+ "(9000, 'new')"
    val m = engine.execute(
      s"""MERGE INTO $t AS tg
         |USING (SELECT * FROM (VALUES ${keys.mkString(", ")}) AS v(id, v)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(m.message == "MERGE 11 updated, 0 deleted, 1 inserted", m.message)
    // keys live in the 100- and 200-range files only: the 0- and
    // 300-range files must keep their exact paths
    val survivors = before intersect files(t)
    assert(survivors.size >= 2,
      s"12-key merge must stay file-scoped\nbefore=$before\nafter=${files(t)}")
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 205").data == Seq(Seq("u205")))
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 305").data == Seq(Seq("row 305")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 41L)
  }

  test("MERGE inserting a NULL partition value aborts to the coarser path, once-snapshotted") {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.pnull")
    engine.execute(
      s"""CREATE TABLE $Db.pnull (id int64 NOT NULL, v string, p string)
         |STORAGE filesystem PARTITION BY (p)""".stripMargin)
    engine.execute(s"INSERT INTO $Db.pnull VALUES (1, 'one', 'a'), (2, 'two', 'b')")
    engine.execute(s"CREATE INDEX zi ON $Db.pnull (id)")
    val m = engine.execute(
      s"""MERGE INTO $Db.pnull AS tg
         |USING (SELECT * FROM (VALUES (1, 'u1', 'a'),
         |  (9000, 'ghost', CAST(NULL AS STRING))) AS s(id, v, p)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)""".stripMargin)
    assert(m.message == "MERGE 1 updated, 0 deleted, 1 inserted", m.message)
    assert(engine.execute(s"SELECT v FROM $Db.pnull WHERE id = 1").data == Seq(Seq("u1")))
    assert(engine.execute(s"SELECT v FROM $Db.pnull WHERE id = 9000").data == Seq(Seq("ghost")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pnull").data.head.head == 3L)
    // the aborted file-level attempt must not leave a SECOND snapshot
    // for the same statement
    val snaps = engine.execute(s"SHOW SNAPSHOTS FROM $Db.pnull").data
    assert(snaps.count(_.exists(_ == "MERGE")) == 1,
      s"one MERGE statement, one snapshot: $snaps")
  }

  test("PARTITIONED MERGE: file-level upsert registers a freshly minted partition") {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.pm")
    engine.execute(
      s"""CREATE TABLE $Db.pm (id int64 NOT NULL, v string, p string)
         |STORAGE filesystem PARTITION BY (p)""".stripMargin)
    for (i <- 0 until 3) {
      val a = (0 until 5).map(k => s"(${i * 100 + k}, 'row ${i * 100 + k}', 'a')")
      val b = (5 until 10).map(k => s"(${i * 100 + k}, 'row ${i * 100 + k}', 'b')")
      engine.execute(s"INSERT INTO $Db.pm VALUES ${(a ++ b).mkString(", ")}")
    }
    engine.execute(s"CREATE INDEX zi ON $Db.pm (id)")
    val before = files(s"$Db.pm")

    // upsert: one matched row in p=a, one insert into a NEW partition
    val m = engine.execute(
      s"""MERGE INTO $Db.pm AS tg
         |USING (SELECT * FROM (VALUES (103, 'u103', 'a'),
         |  (9000, 'new', 'z')) AS s(id, v, p)) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)""".stripMargin)
    assert(m.message == "MERGE 1 updated, 0 deleted, 1 inserted", m.message)
    val after = files(s"$Db.pm")
    val replaced = before -- after
    assert(replaced.size == 1 && replaced.head.contains("p=a"),
      s"only the matched file in p=a may be replaced: $replaced")
    // the new partition is REGISTERED: catalog-tracked listing sees it
    val partsShown = spark.sql(s"SHOW PARTITIONS $Db.pm")
      .collect().map(_.getString(0)).toSet
    assert(partsShown.contains("p=z"), s"minted partition must register: $partsShown")
    assert(engine.execute(s"SELECT v FROM $Db.pm WHERE id = 9000").data == Seq(Seq("new")))
    assert(engine.execute(s"SELECT v FROM $Db.pm WHERE id = 103").data == Seq(Seq("u103")))
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pm").data.head.head == 31L)
    // untouched partition intact
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pm WHERE p = 'b'")
      .data.head.head == 15L)
  }

  test("minted partition VALUES with quotes/backslashes register exactly") {
    // registration goes through the catalog API, not SQL text — a
    // value like O'Brien\x must neither fail the post-commit
    // registration nor register corrupted
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.pq")
    engine.execute(
      s"""CREATE TABLE $Db.pq (id int64 NOT NULL, v string, p string)
         |STORAGE filesystem PARTITION BY (p)""".stripMargin)
    engine.execute(s"INSERT INTO $Db.pq VALUES (1, 'one', 'plain')")
    engine.execute(s"CREATE INDEX zi ON $Db.pq (id)")
    val tricky = """O'Brien\x"""
    val m = engine.execute(
      s"""MERGE INTO $Db.pq AS tg
         |USING (SELECT 9000 AS id, 'new' AS v,
         |  concat('O', chr(39), 'Brien', chr(92), 'x') AS p) AS s
         |ON tg.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, p) VALUES (s.id, s.v, s.p)""".stripMargin)
    assert(m.message == "MERGE 0 updated, 0 deleted, 1 inserted", m.message)
    // the row is reachable through a catalog-tracked partition read
    assert(engine.execute(
      s"SELECT v FROM $Db.pq WHERE p = concat('O', chr(39), 'Brien', chr(92), 'x')")
      .data == Seq(Seq("new")))
    val registered = spark.sessionState.catalog.listPartitions(
      spark.sessionState.sqlParser.parseTableIdentifier(s"$Db.pq"))
      .map(_.spec("p")).toSet
    assert(registered.contains(tricky),
      s"exact value must register, got $registered")
    // ...and the post-DML index sync must have read the new file
    // through the registered location (a URI-encoding slip here
    // surfaces as a stale-marked index)
    assert(!graft.engine.IndexManager.isStale(spark, s"$Db.pq", "zi"),
      "index sync must succeed over the minted partition's location")
    // a further write exercises the synced index's listing once more
    engine.execute(s"INSERT INTO $Db.pq VALUES (2, 'two', 'plain')")
    assert(engine.execute(s"SELECT count(*) AS n FROM $Db.pq").data.head.head == 3L)
  }

  test("OPTIMIZE compacts accumulated cow files; zonemap survives the rewrite") {
    // every point DML adds a small cow- file — the compaction story
    // closes the lifecycle: OPTIMIZE bin-packs them and the index
    // file-diff re-derives shards for the new layout
    val t = freshTable("oc1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    for (id <- Seq(5L, 105L, 205L, 305L))
      engine.execute(s"DELETE FROM $t WHERE id = $id")
    assert(files(t).count(_.contains("cow-")) >= 3,
      s"file-level deletes should accumulate cow files: ${files(t)}")
    engine.execute(s"OPTIMIZE $t")
    assert(files(t).size < 8, s"compaction should shrink the file count: ${files(t)}")
    // data intact, index fresh, pruning still live
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 36L)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t WHERE id = 105")
      .data.head.head == 0L)
    assert(engine.execute(s"SELECT v FROM $t WHERE id = 306").data == Seq(Seq("row 306")))
    // and file-level DML keeps working on the compacted layout
    engine.execute(s"DELETE FROM $t WHERE id = 306")
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 35L)
  }

  test("zonemap maintenance rides the file-level commit (prune stays fresh)") {
    val t = freshTable("m1")
    engine.execute(s"CREATE INDEX zi ON $t (id)")
    engine.execute(s"DELETE FROM $t WHERE id = 5")
    // the replaced file's shard was re-derived: a query for a now-
    // deleted id prunes correctly and finds nothing; neighbors intact
    assert(engine.execute(s"SELECT count(*) AS n FROM $t WHERE id = 5")
      .data.head.head == 0L)
    assert(engine.execute(s"SELECT count(*) AS n FROM $t WHERE id = 6")
      .data.head.head == 1L)
    // and a second file-level DELETE composes
    engine.execute(s"DELETE FROM $t WHERE id = 301")
    assert(engine.execute(s"SELECT count(*) AS n FROM $t").data.head.head == 38L)
  }
}
