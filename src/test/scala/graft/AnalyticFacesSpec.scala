package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.engine.QueryEngine
import graft.operators.Search

/** Index-aware analytic faces (round-9 verdict "Next #1"): the engine
  * answers near-dup candidates / BM25 / ANN through a persisted index
  * when a matching one exists, and through an equivalent scan-path
  * computation otherwise. The load-bearing pins:
  *
  *  - '''identical answers''' with and without the index (both paths
  *    share IndexManager's builders, but the equality is pinned, not
  *    assumed);
  *  - '''the index path really reads the index''' — its scan's input
  *    files live under `.graft-indexes`, the scan path's do not
  *    (otherwise "prefers the index" would be unfalsifiable);
  *  - '''column matching''' — an index on different columns is NOT
  *    picked up;
  *  - '''freshness''' — after an INSERT, the face (riding file-diff
  *    maintenance) still equals the scan path over the grown table.
  */
class AnalyticFacesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)

  private val Db = "facedb"

  private def freshDocs(name: String): String = {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.$name")
    engine.execute(
      s"CREATE TABLE $Db.$name (doc_id int64 NOT NULL, text string) STORAGE filesystem")
    engine.execute(
      s"""INSERT INTO $Db.$name VALUES
         |  (1, 'the quick brown fox jumps over the lazy dog'),
         |  (2, 'the quick brown fox jumps over the lazy cat'),
         |  (3, 'spark query join planning at warehouse scale'),
         |  (4, 'spark query join planning at datacenter scale'),
         |  (5, 'the quick brown fox jumps over the lazy dog')""".stripMargin)
    s"$Db.$name"
  }

  private def freshVecs(name: String, n: Int = 40): String = {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.$name")
    engine.execute(
      s"CREATE TABLE $Db.$name (vec_id int64 NOT NULL, emb list<float64>) STORAGE filesystem")
    val rows = (0 until n).map { i =>
      val v = (0 until 8).map(j =>
        math.sin(i * 37 + j * 11) * 10).map(x => f"${x}%.4fD").mkString(", ")
      s"($i, array($v))"
    }.mkString(",\n")
    engine.execute(s"INSERT INTO $Db.$name VALUES\n$rows")
    s"$Db.$name"
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def readsIndex(df: DataFrame): Boolean =
    df.inputFiles.exists(_.contains(".graft-indexes"))

  test("nearDupCandidates: scan == index, and the index path reads the index") {
    val t = freshDocs("docs1")
    val scan = engine.nearDupCandidates(t, "doc_id", "text")
    assert(!readsIndex(scan), "no index exists yet — must be scan-path")
    engine.execute(s"CREATE INDEX b1 ON $t (doc_id, text) USING bands")
    val idx = engine.nearDupCandidates(t, "doc_id", "text")
    assert(readsIndex(idx), "bands index exists — face must ride it")
    assert(sortedRows(idx) == sortedRows(scan))
    assert(scan.count() > 0, "fixture must produce candidates")
  }

  test("bm25Search: scan == index; identical integer points") {
    val t = freshDocs("docs2")
    val p = Search.Bm25Params(Seq("spark", "query", "join"))
    val scan = engine.bm25Search(t, "doc_id", "text", p)
    assert(!readsIndex(scan))
    engine.execute(s"CREATE INDEX p1 ON $t (doc_id, text) USING postings")
    val idx = engine.bm25Search(t, "doc_id", "text", p)
    assert(readsIndex(idx))
    assert(idx.collect().map(_.toSeq).toSeq ==
      scan.collect().map(_.toSeq).toSeq, "ranked output must be identical")
    assert(scan.count() == 2)
  }

  test("annNeighbors: scan == index while the codebook prefix is unchanged") {
    val t = freshVecs("vecs1")
    val keys = Seq(0L, 1L, 2L)
    val scan = engine.annNeighbors(t, "vec_id", "emb", keys, 3)
    assert(!readsIndex(scan))
    engine.execute(s"CREATE INDEX iv1 ON $t (vec_id, emb) USING ivf")
    val idx = engine.annNeighbors(t, "vec_id", "emb", keys, 3)
    assert(readsIndex(idx))
    assert(sortedRows(idx) == sortedRows(scan))
    assert(scan.count() == keys.length * 3)
  }

  test("an index on other columns is not picked up") {
    val t = freshDocs("docs3")
    engine.execute(s"ALTER TABLE $t ADD COLUMN title string")
    engine.execute(s"CREATE INDEX b3 ON $t (doc_id, title) USING bands")
    val face = engine.nearDupCandidates(t, "doc_id", "text")
    assert(!readsIndex(face),
      "bands index is on (doc_id, title) — the (doc_id, text) face must scan")
  }

  test("freshness across DML: face == scan after INSERT grows the table") {
    val t = freshDocs("docs4")
    engine.execute(s"CREATE INDEX b4 ON $t (doc_id, text) USING bands")
    engine.execute(
      s"INSERT INTO $t VALUES (6, 'the quick brown fox jumps over the lazy dog')")
    val idx = engine.nearDupCandidates(t, "doc_id", "text")
    assert(readsIndex(idx))
    // scan path on a sibling un-indexed table with the same contents
    val t2 = freshDocs("docs4b")
    engine.execute(
      s"INSERT INTO $t2 VALUES (6, 'the quick brown fox jumps over the lazy dog')")
    val scan = engine.nearDupCandidates(t2, "doc_id", "text")
    assert(sortedRows(idx) == sortedRows(scan))
    assert(idx.collect().map(_.toSeq).exists(r => r.contains(6L)),
      "the appended doc must appear in candidates")
  }
}
