package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryEngine
import graft.operators.Search

/** SQL statement face for the persisted-index probes (r10 verdict
  * "Next #5"): `INDEX_PROBE(t, kind, ...)` in FROM position must
  * answer the q33/q72/q41-family questions with SQL text alone, with
  * results identical to the programmatic faces, and compose with the
  * surrounding SELECT. */
class IndexProbeSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)

  private val Db = "ips"

  private lazy val docsTable: String = {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.docs")
    engine.execute(
      s"CREATE TABLE $Db.docs (doc_id int64, text string) STORAGE filesystem")
    engine.execute(s"INSERT INTO $Db.docs VALUES " +
      "(1, 'the quick brown fox jumps over the lazy dog again and again'), " +
      "(2, 'the quick brown fox jumps over the lazy dog again and again'), " +
      "(3, 'completely different words entirely unrelated content here today')")
    engine.execute(s"CREATE INDEX bix ON $Db.docs (doc_id, text) USING bands")
    engine.execute(s"CREATE INDEX pix ON $Db.docs (doc_id, text) USING postings")
    s"$Db.docs"
  }

  private lazy val vecsTable: String = {
    engine.execute(s"CREATE DATABASE IF NOT EXISTS $Db")
    engine.execute(s"DROP TABLE IF EXISTS $Db.vecs")
    engine.execute(
      s"CREATE TABLE $Db.vecs (vec_id int64, embedding list<float32>) STORAGE filesystem")
    engine.execute(s"INSERT INTO $Db.vecs SELECT vec_id, embedding " +
      s"FROM parquet.`/root/testdata/sf0.001/embeddings.parquet`")
    engine.execute(s"CREATE INDEX vix ON $Db.vecs (vec_id, embedding) USING ivf")
    s"$Db.vecs"
  }

  test("neardup probe over SQL equals the programmatic face") {
    val r = engine.execute(
      s"SELECT doc1, doc2 FROM INDEX_PROBE($docsTable, 'neardup', doc_id, text) " +
        "ORDER BY doc1, doc2")
    val direct = engine.nearDupCandidates(docsTable, "doc_id", "text")
      .orderBy("doc1", "doc2").collect().map(_.toSeq).toSeq
    assert(r.data == direct)
    assert(r.data.contains(Seq(1L, 2L)), "identical texts must be candidates")
    assert(!r.data.flatten.contains(3L), "unrelated doc must not pair")
  }

  test("bm25 probe over SQL equals the programmatic face and composes") {
    val q = s"INDEX_PROBE($docsTable, 'bm25', doc_id, text, 'fox dog', 5)"
    val r = engine.execute(s"SELECT * FROM $q ORDER BY 1")
    val directDf = engine.bm25Search(docsTable, "doc_id", "text",
      Search.Bm25Params(Seq("fox", "dog"), 5))
    val direct = directDf.orderBy(directDf.columns.head)
      .collect().map(_.toSeq).toSeq
    assert(r.data == direct)
    assert(r.data.nonEmpty)
    // composes: aggregate over the probe
    val c = engine.execute(s"SELECT count(*) AS n FROM $q")
    assert(c.data == Seq(Seq(r.data.length.toLong)))
  }

  test("ann probe over SQL equals the programmatic face") {
    val r = engine.execute(
      s"SELECT query_id, neighbor_id, cosine " +
        s"FROM INDEX_PROBE($vecsTable, 'ann', vec_id, embedding, '0 1 2', 3, 4) " +
        "ORDER BY query_id, neighbor_id")
    val direct = engine.annNeighbors(vecsTable, "vec_id", "embedding",
        Seq(0L, 1L, 2L), 3, 4)
      .orderBy("query_id", "neighbor_id").collect().map(_.toSeq).toSeq
    assert(r.data == direct)
    assert(r.data.nonEmpty)
  }

  test("unknown kind and malformed args fail addressably") {
    val e1 = intercept[Exception](engine.execute(
      s"SELECT * FROM INDEX_PROBE($docsTable, 'wibble', a, b)"))
    assert(e1.getMessage.contains("neardup"))
    val e2 = intercept[Exception](engine.execute(
      s"SELECT * FROM INDEX_PROBE($docsTable)"))
    assert(e2.getMessage.toLowerCase.contains("index_probe"))
  }

  test("INDEX_PROBE inside a string literal is data, not a probe") {
    engine.execute(s"DROP TABLE IF EXISTS $Db.lit")
    engine.execute(s"CREATE TABLE $Db.lit (id int64, v string) STORAGE filesystem")
    engine.execute(s"INSERT INTO $Db.lit VALUES (1, 'INDEX_PROBE(x, y)')")
    val r = engine.execute(s"SELECT v FROM $Db.lit")
    assert(r.data == Seq(Seq("INDEX_PROBE(x, y)")))
  }
}
