package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryEngine
import graft.server.native.{NativeClient, NativeServer, Signals, Wire}

/** Native binary protocol round-trips, mirroring the reference's SDK
  * integration tests (pkg/sdk/integration_tests/native_test.go:16-263:
  * connection, handshake, query execution, query-with-results, batch
  * operations, error handling, multiple connections). */
class NativeProtocolSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val engine = new QueryEngine(spark)
  lazy val server: NativeServer = {
    val s = new NativeServer(engine, port = 0) // ephemeral port for tests
    s.start()
    s
  }
  def connect(): NativeClient = new NativeClient("127.0.0.1", server.boundPort)

  test("handshake: ClientHello -> ServerHello with protocol fields") {
    val c = connect()
    val hello = c.hello()
    assert(hello.serverName == "Graft Server")
    assert(hello.major == 1 && hello.minor == 0)
    assert(hello.revision == Signals.ProtocolVersion)
    assert(hello.timezone == "UTC")
    c.close()
  }

  test("query execution: SELECT returns columns and rows, then EndOfStream") {
    val c = connect()
    c.hello()
    val (cols, rows) = c.query("SELECT 1 AS one, 'x' AS s")
    assert(cols == Seq("one", "s"))
    assert(rows == Seq(Seq("1", "x")))
    // the connection stays usable for the next query (stream fully drained)
    val (cols2, rows2) = c.query("SELECT 41 + 1 AS answer")
    assert(cols2 == Seq("answer") && rows2.head.head == "42")
    c.close()
  }

  test("DDL + batch ClientData ingestion + readback (TestNativeServerBatchOperations)") {
    val c = connect()
    c.hello()
    c.query("CREATE DATABASE IF NOT EXISTS np")
    c.query("DROP TABLE IF EXISTS np.users")
    val (_, created) = c.query(
      "CREATE TABLE np.users (id int64 NOT NULL, name string, age int32) STORAGE filesystem")
    assert(created.head.head.contains("created"))
    // wire values are strings; the server coerces by schema
    c.insert("np.users", Seq("id", "name", "age"),
      Seq(Seq("1", "ann", "34"), Seq("2", "bob", "19"), Seq("3", "cho", "45")))
    // ClientData has no success reply — confirm via a query on the same conn
    val (_, rows) = c.query(
      "SELECT count(*) AS n, sum(age) AS total FROM np.users")
    assert(rows.head == Seq("3", "98"))
    c.query("DROP TABLE np.users")
    c.close()
  }

  test("errors surface as ServerException and the connection survives") {
    val c = connect()
    c.hello()
    val e = intercept[RuntimeException](c.query("SELECT * FROM nonexistent_xyz"))
    assert(e.getMessage.toLowerCase.contains("table"))
    // blocked statement type (reference keyword blocklist)
    val e2 = intercept[RuntimeException](c.query("PRAGMA version"))
    assert(e2.getMessage.contains("not allowed"))
    // still usable afterwards
    assert(c.query("SELECT 7 AS x")._2.head.head == "7")
    c.close()
  }

  test("cancel round-trip: registered query acknowledges, unknown errors") {
    val c = connect()
    c.hello()
    val info = engine.executions.register("SELECT long_running")
    val ack = c.cancel(info.id)
    assert(ack == s"Query ${info.id} cancelled successfully")
    val e = intercept[RuntimeException](c.cancel("query_nope"))
    assert(e.getMessage.contains("cancellation failed"))
    c.close()
  }

  test("ping/pong and multiple concurrent connections") {
    val clients = (1 to 4).map(_ => connect())
    clients.foreach(_.hello())
    assert(clients.head.ping() > 0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence(clients.zipWithIndex.map { case (cl, i) =>
        Future(cl.query(s"SELECT $i AS v")._2.head.head)
      }), 60.seconds).toList
    assert(results == List("0", "1", "2", "3"))
    clients.foreach(_.close())
  }

  test("USE in one connection does not leak into another (session isolation)") {
    val a = connect(); val b = connect()
    a.hello(); b.hello()
    a.query("CREATE DATABASE IF NOT EXISTS iso_a")
    a.query("DROP TABLE IF EXISTS iso_a.only_here")
    a.query("CREATE TABLE iso_a.only_here (id int64) STORAGE filesystem")
    a.query("USE iso_a")
    // unqualified name resolves for A...
    assert(a.query("SELECT count(*) AS n FROM only_here")._2.head.head == "0")
    // ...but B's current database is untouched (default): same
    // unqualified name must fail there
    val e = intercept[RuntimeException](b.query("SELECT count(*) AS n FROM only_here"))
    assert(e.getMessage.toLowerCase.contains("table"))
    // catalog stays shared: B sees the table with qualification
    assert(b.query("SELECT count(*) AS n FROM iso_a.only_here")._2.head.head == "0")
    a.query("DROP TABLE iso_a.only_here")
    a.close(); b.close()
  }

  test("hello database is honored; large results stream in blocks") {
    val c = connect()
    c.hello()
    c.query("CREATE DATABASE IF NOT EXISTS hellodb")
    c.query("DROP TABLE IF EXISTS hellodb.hd")
    c.query("CREATE TABLE hellodb.hd (id int64) STORAGE filesystem")
    c.query("INSERT INTO hellodb.hd VALUES (7)")
    c.close()
    // a fresh connection whose HELLO names the database resolves
    // unqualified tables there (round-2 review: the field was dropped)
    val d = connect()
    d.hello(database = "hellodb")
    assert(d.query("SELECT id FROM hd")._2.head.head == "7")
    // > RowsPerBlock rows arrive across multiple ServerData frames
    val (cols, rows) = d.query("SELECT id FROM range(25000)")
    assert(cols == Seq("id") && rows.length == 25000)
    assert(rows.head.head == "0" && rows.last.head == "24999")
    d.query("DROP TABLE hellodb.hd")
    d.close()
  }

  test("connection cap refuses the N+1th client with an exception frame") {
    val small = new NativeServer(engine, port = 0, maxConnections = 2)
    small.start()
    try {
      val a = new NativeClient("127.0.0.1", small.boundPort)
      val b = new NativeClient("127.0.0.1", small.boundPort)
      a.hello(); b.hello()
      assert(small.activeConnections == 2)
      val c = new NativeClient("127.0.0.1", small.boundPort)
      // the refusal is an exception frame followed by an immediate
      // close; depending on timing the client sees either
      val e = intercept[Exception](c.hello())
      assert(e.getMessage.contains("too many connections")
        || e.isInstanceOf[java.io.IOException], s"unexpected: $e")
      a.close(); b.close(); c.close()
      // capacity frees up after close
      val deadline = System.currentTimeMillis() + 10000
      while (small.activeConnections > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val d = new NativeClient("127.0.0.1", small.boundPort)
      assert(d.hello().serverName == "Graft Server")
      d.close()
    } finally small.stop()
  }

  test("slow query emits ServerProgress heartbeats; ProfileInfo matches row count") {
    spark.conf.set("spark.graft.progress.interval.ms", "50")
    try {
      val c = connect()
      c.hello()
      // slow enough that several 50ms ticks elapse mid-execution
      val (_, rows) = c.query(
        "SELECT count(*) AS n FROM " +
          "(SELECT sha2(cast(id AS string), 512) AS h FROM range(8000000)) " +
          "WHERE h LIKE '%abc%'")
      assert(rows.length == 1)
      assert(c.progressFrames >= 1,
        s"expected >=1 ServerProgress frame, saw ${c.progressFrames}")
      // totals are extrapolated from task completion: whenever an
      // estimate exists it can never be below the observed reads
      c.lastProgress.foreach { p =>
        assert(p.totalRows >= p.rowsRead,
          s"estimated totalRows ${p.totalRows} < rowsRead ${p.rowsRead}")
        assert(p.totalBytes >= p.bytesRead)
      }
      // ProfileInfo arrives before EndOfStream and reports rows sent
      assert(c.lastProfile.isDefined)
      assert(c.lastProfile.get.rowsRead == 1L)
      // a result-bearing query reports its own count
      val (_, rs) = c.query("SELECT id FROM range(123)")
      assert(rs.length == 123 && c.lastProfile.get.rowsRead == 123L)
      c.close()
    } finally spark.conf.unset("spark.graft.progress.interval.ms")
  }

  test("wide 100k-row result streams block-by-block off the partition iterator") {
    val c = connect()
    c.hello()
    val (cols, rows) = c.query(
      "SELECT id, repeat('x', 200) AS pad FROM range(100000)")
    assert(cols == Seq("id", "pad"))
    assert(rows.length == 100000)
    assert(rows.last(1).length == 200)
    // the server sent it as many bounded blocks, not one materialized
    // result: ProfileInfo's bytes reflect ~20 MB across >= 10 frames
    assert(c.lastProfile.get.rowsRead == 100000L)
    c.close()
  }

  test("auth middleware: hello credentials checked, unauthenticated queries refused") {
    val secured = new NativeServer(engine, port = 0,
      auth = Some(new graft.server.SimpleAuthProvider()))
    secured.start()
    try {
      // reference default users: admin/admin123 and default/""
      val a = new NativeClient("127.0.0.1", secured.boundPort)
      assert(a.hello(user = "admin", password = "admin123")
        .serverName == "Graft Server")
      assert(a.query("SELECT 1 AS x")._2.head.head == "1")
      a.close()
      val d = new NativeClient("127.0.0.1", secured.boundPort)
      assert(d.hello().serverName == "Graft Server") // default/""
      d.close()
      // wrong password: exception frame, connection torn down
      val bad = new NativeClient("127.0.0.1", secured.boundPort)
      val e = intercept[Exception](bad.hello(user = "admin", password = "nope"))
      assert(e.getMessage.contains("authentication failed")
        || e.isInstanceOf[java.io.IOException], s"unexpected: $e")
      bad.close()
      // no hello at all: the requireAuth gate refuses the query
      val sneak = new NativeClient("127.0.0.1", secured.boundPort)
      val e2 = intercept[Exception](sneak.query("SELECT 1"))
      assert(e2.getMessage.contains("authentication required")
        || e2.isInstanceOf[java.io.IOException], s"unexpected: $e2")
      sneak.close()
    } finally secured.stop()
  }

  test("idle timeout from the hello: ServerClose(reason) then teardown") {
    val sock = new java.net.Socket("127.0.0.1", server.boundPort)
    val in = sock.getInputStream
    val out = sock.getOutputStream
    Wire.writeMessage(out, Signals.ClientHello,
      Signals.Hello("spec", 1, 0, Signals.ProtocolVersion,
        "default", "default", "", idleTimeoutSec = 1).pack())
    val Some((h, _)) = Wire.readMessage(in)
    assert(h == Signals.ServerHello)
    // no frames for > 1s: the server announces the close and drops us
    val Some((tpe, payload)) = Wire.readMessage(in)
    assert(tpe == Signals.ServerClose)
    assert(Signals.Close.unpack(payload).reason == "Connection idle timeout")
    assert(Wire.readMessage(in).isEmpty) // clean EOF after close
    sock.close()
    // a connection WITHOUT the hello field never times out
    val c = connect()
    c.hello()
    Thread.sleep(1500)
    assert(c.query("SELECT 1 AS x")._2.head.head == "1")
    c.close()
  }

  test("circuit breaker: failure storm opens, recovery trial closes") {
    val cb = new graft.server.CircuitBreaker(
      failureThreshold = 2, recoveryTimeoutMs = 500)
    val guarded = new NativeServer(engine, port = 0, breaker = cb)
    guarded.start()
    try {
      val c = new NativeClient("127.0.0.1", guarded.boundPort)
      c.hello()
      // two consecutive failures trip the breaker...
      intercept[RuntimeException](c.query("SELECT * FROM missing_cb_a"))
      intercept[RuntimeException](c.query("SELECT * FROM missing_cb_b"))
      // ...so a perfectly valid query is refused while the circuit is open
      val e = intercept[RuntimeException](c.query("SELECT 1 AS x"))
      assert(e.getMessage.contains("circuit breaker is open"), s"got: $e")
      // after the recovery timeout the half-open trial succeeds and closes
      Thread.sleep(600)
      assert(c.query("SELECT 1 AS x")._2.head.head == "1")
      assert(c.query("SELECT 2 AS x")._2.head.head == "2")
      c.close()
    } finally guarded.stop()
  }

  test("wire codec round-trips every signal") {
    val h = Signals.Hello("cli", 1, 2, Signals.ProtocolVersion, "db", "u", "pw", 30, 60)
    assert(Signals.Hello.unpack(h.pack()) == h)
    val q = Signals.Query("SELECT 1", "qid-7", "default", "u", "")
    assert(Signals.Query.unpack(q.pack()) == q)
    val d = Signals.DataBlock("t", Seq("a", "b"), Seq(Seq("1", "x"), Seq("2", "y")))
    assert(Signals.DataBlock.unpack(d.pack()) == d)
    val sd = Signals.Data(Seq("a" -> "String"), Seq(Seq("1"), Seq("2")))
    assert(Signals.Data.unpack(sd.pack()) == sd)
    val ex = Signals.Exception("E1", "boom", "stack")
    assert(Signals.Exception.unpack(ex.pack()) == ex)
    val sh = Signals.ServerHelloMsg("s", 1, 0, 54460L, "UTC", "d", 0)
    assert(Signals.ServerHelloMsg.unpack(sh.pack()) == sh)
    // uvarint edge: multi-byte lengths
    val big = Signals.Exception("E", "x" * 300, "")
    assert(Signals.Exception.unpack(big.pack()).message.length == 300)
    // progress (4 uvarints + 8-byte BE micros) and profile (6 uvarints)
    val pr = Signals.Progress(1234567, 89012345, 0, 0, 1.5)
    val pr2 = Signals.Progress.unpack(pr.pack())
    assert(pr2.rowsRead == 1234567 && pr2.bytesRead == 89012345)
    assert(math.abs(pr2.elapsedSec - 1.5) < 1e-6)
    val pi = Signals.ProfileInfo(7, 8, 100000, 0, 5, 6)
    assert(Signals.ProfileInfo.unpack(pi.pack()) == pi)
    // frame roundtrip through a stream
    val bos = new java.io.ByteArrayOutputStream()
    Wire.writeMessage(bos, Signals.ClientQuery, q.pack())
    val Some((tpe, payload)) =
      Wire.readMessage(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(tpe == Signals.ClientQuery && Signals.Query.unpack(payload) == q)
  }
}
