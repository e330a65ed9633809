package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.Repl
import graft.engine.QueryEngine

/** CLI command surface (r10 verdict "Next #9"): the reference's
  * ranger-client commands — query / table list|describe|drop /
  * catalog namespaces|create-namespace|drop-namespace / import —
  * routed through the shared Backend face, output shapes pinned. */
class ReplSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val backend = new Repl.EngineBackend(new QueryEngine(spark))

  private def run(cmd: String*): (Int, Seq[String]) =
    runF(Map.empty, cmd: _*)

  private def runF(flags: Map[String, String], cmd: String*): (Int, Seq[String]) = {
    val out = Seq.newBuilder[String]
    val code = Repl.runCommand(backend, cmd.toSeq, flags, out += _)
    (code, out.result())
  }

  test("table renderer aligns columns and handles nulls") {
    val out = Repl.renderTable(Seq("id", "name"),
      Seq(Seq(1L, "ann"), Seq(22L, null)))
    val lines = out.linesIterator.toSeq
    assert(lines.head == "+----+------+")
    assert(lines(1) == "| id | name |")
    assert(lines.contains("| 22 | NULL |"))
    assert(lines.count(_.startsWith("+")) == 3)
  }

  test("flag parsing: --key value pairs, bare --overwrite, positionals in order") {
    val (flags, cmd) = Repl.parseArgs(Seq(
      "--server", "h:1", "import", "f.parquet", "--table", "t", "--overwrite"))
    assert(flags == Map("server" -> "h:1", "table" -> "t", "overwrite" -> "true"))
    assert(cmd == Seq("import", "f.parquet"))
  }

  test("catalog + table command lifecycle mirrors the reference output shapes") {
    val (c0, o0) = run("catalog", "create-namespace", "clidb")
    assert(c0 == 0 && o0 == Seq("Namespace clidb created"))
    val (c1, o1) = run("catalog", "namespaces")
    assert(c1 == 0 && o1.head == "Namespaces:" && o1.contains("   - clidb"))

    val (cq, _) = run("query",
      "CREATE TABLE clidb.people (id int64 NOT NULL, name string) STORAGE filesystem")
    assert(cq == 0)
    val (c2, o2) = runF(Map("database" -> "clidb"), "query",
      "INSERT INTO clidb.people VALUES (1, 'ann'), (2, 'bob')")
    assert(c2 == 0)

    val (c3, o3) = run("table", "list")
    assert(c3 == 0 && o3.head == "Tables:")
    // embedded backend lists the current database; use describe for the pin
    val (c4, o4) = run("table", "describe", "clidb.people")
    assert(c4 == 0)
    assert(o4.take(2) == Seq("Table: clidb.people", "Schema:"))
    assert(o4.exists(_.matches("   - id: .*")), o4.mkString("|"))
    assert(o4.exists(_.matches("   - name: .*")), o4.mkString("|"))

    val (c5, o5) = run("query", "SELECT name FROM clidb.people ORDER BY id")
    assert(c5 == 0)
    assert(o5.exists(_.contains("| ann")), o5.mkString("\n"))
    assert(o5.last == "2 row(s)")

    val (c6, o6) = run("table", "drop", "clidb.people")
    assert(c6 == 0 && o6 == Seq("Table clidb.people dropped"))
    val (c7, o7) = run("table", "describe", "clidb.people")
    assert(c7 == 1 && o7.head.startsWith("ERROR:"))
  }

  test("import loads a parquet file through the engine funnel") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempDirectory("cli_imp").toString + "/people.parquet"
    Seq((10L, "zed"), (11L, "yam")).toDF("id", "name")
      .coalesce(1).write.parquet(f)

    run("catalog", "create-namespace", "clidb")
    run("query", "DROP TABLE IF EXISTS clidb.imp")
    // absent table: addressed error, reference-style
    val (ca, oa) = runF(Map("table" -> "imp", "namespace" -> "clidb"), "import", f)
    assert(ca == 1 && oa.head.contains("does not exist"), oa.mkString("|"))

    run("query", "CREATE TABLE clidb.imp (id int64 NOT NULL, name string) STORAGE filesystem")
    val (c1, _) = runF(Map("table" -> "imp", "namespace" -> "clidb"), "import", f)
    assert(c1 == 0)
    val (_, o2) = run("query", "SELECT count(*) AS n FROM clidb.imp")
    assert(o2.exists(_.contains("| 2")), o2.mkString("\n"))

    // overwrite replaces instead of appending
    val (c3, o3) = runF(
      Map("table" -> "imp", "namespace" -> "clidb", "overwrite" -> "true"),
      "import", f)
    assert(c3 == 0, o3.mkString("|"))
    val (_, o4) = run("query", "SELECT count(*) AS n FROM clidb.imp")
    assert(o4.exists(_.contains("| 2")), o4.mkString("\n"))

    // unsupported format: addressed error
    val (c5, o5) = runF(Map("table" -> "imp"), "import", "/etc/hostname")
    assert(c5 == 1 && o5.head.contains("parquet"), o5.mkString("|"))
  }

  test("import --overwrite validates the source BEFORE the destructive delete") {
    import spark.implicits._
    run("catalog", "create-namespace", "clidb")
    run("query", "DROP TABLE IF EXISTS clidb.ow")
    run("query", "CREATE TABLE clidb.ow (id int64 NOT NULL, name string) STORAGE filesystem")
    run("query", "INSERT INTO clidb.ow VALUES (1, 'keep')")

    // arity-mismatched source: the overwrite must FAIL without
    // emptying the table (the round-11 advice finding: DELETE-then-
    // INSERT stranded an empty table when the INSERT failed)
    val bad = java.nio.file.Files.createTempDirectory("cli_ow").toString + "/bad.parquet"
    Seq((10L, "x", 1.0)).toDF("id", "name", "extra").coalesce(1).write.parquet(bad)
    val (c, o) = runF(
      Map("table" -> "ow", "namespace" -> "clidb", "overwrite" -> "true"),
      "import", bad)
    assert(c == 1 && o.exists(_.contains("not overwriting")), o.mkString("|"))
    val (_, kept) = run("query", "SELECT count(*) AS n FROM clidb.ow")
    assert(kept.exists(_.contains("| 1")), kept.mkString("\n"))

    // unreadable source path: same contract (fails server-side, table intact)
    val (c2, o2) = runF(
      Map("table" -> "ow", "namespace" -> "clidb", "overwrite" -> "true"),
      "import", "/nonexistent/nope.parquet")
    assert(c2 == 1, o2.mkString("|"))
    val (_, kept2) = run("query", "SELECT count(*) AS n FROM clidb.ow")
    assert(kept2.exists(_.contains("| 1")), kept2.mkString("\n"))
  }

  test("unknown command prints usage and fails") {
    val (c, o) = run("frobnicate")
    assert(c == 1)
    assert(o.exists(_.contains("unknown command: frobnicate")))
    assert(o.exists(_.contains("table list")))
  }
}
