package graft.server.native

import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicBoolean
import scala.util.control.NonFatal

import graft.engine.QueryEngine

/** The reference's PRIMARY entry point re-expressed over the Spark
  * engine: a TCP server speaking the ClickHouse-style signal protocol
  * (reference: server/protocols/native/server.go, connection.go:
  * 121-248 signal loop, :354-436 handlers; default port 2849).
  *
  * One thread per connection (the reference runs one goroutine per
  * connection); all connections share the single SparkSession behind
  * [[QueryEngine]], which is how Spark is meant to multiplex — each
  * query becomes an independently scheduled job group, so concurrent
  * clients interleave at the task level and ClientCancel can kill one
  * client's jobs without touching the others.
  */
final class NativeServer(engine: QueryEngine, port: Int = 2849,
                         maxConnections: Int = 100,
                         auth: Option[graft.server.AuthProvider] = None,
                         breaker: graft.server.CircuitBreaker =
                           new graft.server.CircuitBreaker(),
                         host: String = "0.0.0.0") {

  @volatile private var server: ServerSocket = _
  private val running = new AtomicBoolean(false)
  private val active = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Live connection count (gateway.go:236-262 caps). */
  def activeConnections: Int = active.get()

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = server.getLocalPort

  def start(): Unit = {
    server = new ServerSocket(port, 50,
      java.net.InetAddress.getByName(host))
    running.set(true)
    val acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          if (active.incrementAndGet() > maxConnections) {
            // connection-cap refusal, the gateway's behavior: send an
            // exception frame and close rather than hanging the client
            active.decrementAndGet()
            try sendException(sock.getOutputStream,
              new IllegalStateException(s"too many connections (max $maxConnections)"))
            catch { case NonFatal(_) => () }
            finally { try sock.close() catch { case NonFatal(_) => () } }
          } else {
            val t = new Thread(() => {
              try handle(sock) finally active.decrementAndGet()
            }, s"native-conn-${sock.getPort}")
            t.setDaemon(true)
            t.start()
          }
        } catch {
          case _: SocketException => () // closed during accept = shutdown
          case NonFatal(_) => ()
        }
      }
    }, "native-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  /** The signal loop (connection.go:139-248): read a frame, dispatch
    * by type, reply; exceptions become ServerException signals rather
    * than connection teardown wherever the reference does the same. */
  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out = sock.getOutputStream
    // isolated session per connection: USE/conf changes stay
    // client-local while the catalog, cache, and execution registry
    // stay shared (the reference keeps Database in its per-connection
    // QueryContext, types/query.go:4-9)
    val engine = this.engine.newConnectionEngine()
    // serializes frame writes: the progress timer thread and the
    // result-streaming connection thread share one OutputStream
    val wlock = new Object
    // with no provider every connection is authenticated (the
    // reference's middleware `enabled=false` path)
    var authed = auth.isEmpty
    try {
      var open = true
      while (open) {
        val msg =
          try Wire.readMessage(in)
          catch {
            case _: java.net.SocketTimeoutException =>
              // the hello's idleTimeoutSec elapsed with no frame:
              // ServerClose then teardown (connection.go:557-576)
              wlock.synchronized {
                Wire.writeMessage(out, Signals.ServerClose,
                  Signals.Close("Connection idle timeout").pack())
              }
              open = false
              None
          }
        if (open) msg match {
          case None => open = false // client disconnected
          case Some((tpe, payload)) =>
            tpe match {
              case Signals.ClientHello =>
                val hello = Signals.Hello.unpack(payload)
                // idle-timeout request from the hello (the reference
                // arms a per-connection idle timer): enforced via a
                // read timeout on the socket
                if (hello.idleTimeoutSec > 0)
                  sock.setSoTimeout((hello.idleTimeoutSec * 1000).toInt)
                // auth middleware (middleware/auth.go): the hello's
                // user/password check FAILS the handshake with an
                // exception frame, then tears the connection down
                val authOk = auth.forall(_.authenticate(
                  hello.user, hello.password, hello.database))
                if (!authOk) {
                  sendException(out, new IllegalStateException(
                    s"authentication failed for user '${hello.user}'"))
                  open = false
                } else {
                  authed = true
                  // the hello's database is the connection's default
                  // (connection.go:354-373 keeps it in QueryContext); a
                  // bad database FAILS the handshake — exception only,
                  // never a trailing ServerHello the client would desync on
                  val dbOk =
                    try {
                      if (hello.database.nonEmpty)
                        engine.spark.catalog.setCurrentDatabase(hello.database)
                      true
                    } catch {
                      case NonFatal(e) => sendException(out, e); false
                    }
                  if (dbOk)
                    Wire.writeMessage(out, Signals.ServerHello,
                      Signals.ServerHelloMsg("Graft Server", 1, 0,
                        Signals.ProtocolVersion, "UTC",
                        "Graft Analytics Server", 0).pack())
                }

              case _ if !authed =>
                // requireAuth gate (auth.go OnRead): nothing but a
                // hello passes before authentication
                sendException(out, new IllegalStateException(
                  "authentication required"))
                open = false

              case Signals.ClientQuery =>
                val q = Signals.Query.unpack(payload)
                // flipped to false INSIDE the write lock before the
                // final frames, so a late timer tick can never emit a
                // Progress frame after EndOfStream
                val progressOpen = new AtomicBoolean(true)
                val progress = new ProgressEmitter(
                  engine.spark.sparkContext,
                  p => wlock.synchronized {
                    if (progressOpen.get)
                      Wire.writeMessage(out, Signals.ServerProgress, p.pack())
                  },
                  engine.spark.conf
                    .getOption("spark.graft.progress.interval.ms")
                    .map(_.toLong).getOrElse(1000L))
                try {
                  if (q.database.nonEmpty)
                    engine.spark.catalog.setCurrentDatabase(q.database)
                  var streamed = false
                  var rowsSent = 0L
                  var bytesSent = 0L
                  // SELECTs stream block-by-block straight off the
                  // partition iterator — the server never materializes
                  // the result (round-2 verdict #6). The circuit
                  // breaker (middleware/circuit_breaker.go) refuses
                  // queries outright after a failure storm instead of
                  // letting retrying clients occupy the engine.
                  val res = breaker.protect(
                    engine.executeStreamed(q.query, progress.start) {
                      (cols, rows) =>
                        streamed = true
                        val sent = streamBlocks(out, wlock, cols,
                          rows.map(_.map(render)))
                        rowsSent = sent._1; bytesSent = sent._2
                    })
                  val (rowsRead, bytesRead) = progress.stop()
                  if (!streamed) {
                    // DDL/DML/SHOW: reference layout or single message row
                    val cols =
                      if (res.columns.nonEmpty) res.columns else Seq("result")
                    val rows =
                      if (res.columns.nonEmpty) res.data.iterator.map(_.map(render))
                      else Iterator(Seq(
                        if (res.message.nonEmpty) res.message else "OK"))
                    val sent = streamBlocks(out, wlock, cols, rows)
                    rowsSent = sent._1; bytesSent = sent._2
                  }
                  // ProfileInfo before EndOfStream (server_profile_info.go).
                  // Timer.cancel does not wait for an in-flight tick, so
                  // every frame here stays under the connection's write
                  // lock — a racing Progress frame can never interleave
                  wlock.synchronized {
                    progressOpen.set(false)
                    Wire.writeMessage(out, Signals.ServerProfileInfo,
                      Signals.ProfileInfo(
                        rowsRead, bytesRead,
                        if (res.message.startsWith("result truncated"))
                          engine.maxResultRows else 0L,
                        0L, rowsSent, bytesSent).pack())
                    Wire.writeMessage(out, Signals.ServerEndOfStream,
                      Array.emptyByteArray)
                  }
                } catch {
                  case NonFatal(e) =>
                    progress.stop()
                    wlock.synchronized {
                      progressOpen.set(false)
                      sendException(out, e)
                    }
                }

              case Signals.ClientData =>
                // ingestion block -> engine.insertData (connection.go:
                // 402-417 routes to InsertData; no reply on success).
                // Wire values are strings ("types are not sent — the
                // server knows the schema", client_data.go:55): coerce
                // by the table schema before validation.
                val block = Signals.DataBlock.unpack(payload)
                try engine.insertData(block.table, block.columns,
                  coerce(engine, block.table, block.columns, block.rows))
                catch { case NonFatal(e) => sendException(out, e) }

              case Signals.ClientCancel =>
                val c = Signals.Cancel.unpack(payload)
                val okCancel = engine.executions.cancel(c.queryId)
                if (okCancel)
                  sendResult(out, Seq("result"),
                    Seq(Seq(s"Query ${c.queryId} cancelled successfully")))
                else
                  sendException(out, new IllegalArgumentException(
                    s"Query ${c.queryId} cancellation failed: not found"))

              case Signals.ClientPing =>
                val b = new java.io.ByteArrayOutputStream()
                Wire.writeU64(b, System.currentTimeMillis())
                Wire.writeMessage(out, Signals.ServerPong, b.toByteArray)

              case other =>
                sendException(out,
                  new IllegalArgumentException(s"Unknown message type: $other"))
                open = false // reference tears the connection down here
            }
        }
      }
    } catch {
      case NonFatal(_) => () // broken pipe etc.
    } finally {
      try sock.close() catch { case NonFatal(_) => () }
    }
  }

  /** ServerData + ServerEndOfStream, the reference's result framing
    * (connection.go:471-545). All values ship as strings with column
    * type "String" — exactly what the reference does (:481). Large
    * result sets stream as MULTIPLE ServerData blocks (ClickHouse
    * semantics; the codec's 64 MiB frame bound would otherwise desync
    * the connection on a wide 100k-row result). */
  private val RowsPerBlock = 10000
  private val BytesPerBlock = 32L * 1024 * 1024 // half the 64 MiB frame bound

  /** Stream ServerData blocks straight off a row iterator: at most one
    * block (bounded by rows AND bytes) is in memory at a time, so the
    * result-set size never bounds server heap. Always emits at least
    * one (possibly empty) block so the client sees the column header.
    * Returns (rows, approx bytes) sent. */
  private def streamBlocks(out: java.io.OutputStream, wlock: Object,
                           columns: Seq[String],
                           rows: Iterator[Seq[String]]): (Long, Long) = {
    val cols = columns.map(_ -> "String")
    var total = 0L
    var totalBytes = 0L
    val buf = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var nBytes = 0L
    def flush(): Unit = {
      wlock.synchronized {
        Wire.writeMessage(out, Signals.ServerData,
          Signals.Data(cols, buf.toSeq).pack())
      }
      buf.clear(); nBytes = 0
    }
    rows.foreach { r =>
      val rBytes = r.iterator.map(v => v.length + 1L).sum
      if (buf.nonEmpty &&
          (buf.size >= RowsPerBlock || nBytes + rBytes > BytesPerBlock)) flush()
      buf += r; nBytes += rBytes; total += 1; totalBytes += rBytes
    }
    flush() // final (possibly empty: the header block)
    (total, totalBytes)
  }
  private def sendResult(out: java.io.OutputStream, columns: Seq[String],
                         rows: Seq[Seq[String]]): Unit = {
    // blocks bounded by BOTH row count and serialized bytes — a block
    // of wide rows must stay under the codec's 64 MiB frame bound
    val blocks = Seq.newBuilder[Seq[Seq[String]]]
    var cur = Seq.newBuilder[Seq[String]]
    var nRows = 0
    var nBytes = 0L
    rows.foreach { r =>
      val rBytes = r.iterator.map(v => v.length + 1L).sum
      if (nRows > 0 && (nRows >= RowsPerBlock || nBytes + rBytes > BytesPerBlock)) {
        blocks += cur.result(); cur = Seq.newBuilder; nRows = 0; nBytes = 0
      }
      cur += r; nRows += 1; nBytes += rBytes
    }
    blocks += cur.result() // final (possibly empty: the header block)
    blocks.result().foreach { block =>
      Wire.writeMessage(out, Signals.ServerData,
        Signals.Data(columns.map(_ -> "String"), block).pack())
    }
    Wire.writeMessage(out, Signals.ServerEndOfStream, Array.emptyByteArray)
  }

  private def sendException(out: java.io.OutputStream, e: Throwable): Unit =
    Wire.writeMessage(out, Signals.ServerException,
      Signals.Exception(e.getClass.getSimpleName,
        Option(e.getMessage).getOrElse("error"), "").pack())

  private def render(v: Any): String = v match {
    case null => "NULL"
    case other => other.toString
  }

  private def coerce(engine: QueryEngine, table: String, columns: Seq[String],
                     rows: Seq[Seq[String]]): Seq[Seq[Any]] =
    graft.server.WireCoerce(engine.spark, table, columns, rows)
}

/** Emits ServerProgress heartbeats for one query
  * (server_progress.go:10-63): a SparkListener scoped to the query's
  * job group accumulates task input metrics, and a timer frames them
  * every `intervalMs` — long queries give clients a heartbeat instead
  * of silence. `stop()` returns the accumulated (rows, bytes) read,
  * which feed the end-of-query ProfileInfo. */
private final class ProgressEmitter(sc: org.apache.spark.SparkContext,
                                    send: Signals.Progress => Unit,
                                    intervalMs: Long) {
  import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

  private val rows = new java.util.concurrent.atomic.AtomicLong
  private val bytes = new java.util.concurrent.atomic.AtomicLong
  private val totalTasks = new java.util.concurrent.atomic.AtomicLong
  private val doneTasks = new java.util.concurrent.atomic.AtomicLong
  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  @volatile private var queryId: String = _
  private val t0 = System.nanoTime()
  @volatile private var timer: java.util.Timer = _

  private val listener = new SparkListener {
    override def onJobStart(job: SparkListenerJobStart): Unit = {
      val gid = Option(job.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      if (gid != null && gid == queryId)
        job.stageInfos.foreach { si =>
          if (stages.add(si.stageId)) totalTasks.addAndGet(si.numTasks.toLong)
        }
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (stages.contains(te.stageId) && te.taskMetrics != null) {
        doneTasks.incrementAndGet()
        rows.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
        bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      }
  }

  /** Called with the engine-assigned query id just before execution. */
  def start(id: String): Unit = {
    queryId = id
    sc.addSparkListener(listener)
    val t = new java.util.Timer("graft-progress", true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      def run(): Unit =
        try {
          // totals are ESTIMATES: rows-so-far extrapolated by the
          // query's scheduled-task completion ratio (the number a
          // progress bar wants; server_profile_info.go carries the
          // exact totals at end of stream). Zero until the first task
          // lands — never a fabricated figure.
          val (r, b) = (rows.get, bytes.get)
          val (tt, dt) = (totalTasks.get, doneTasks.get)
          val (estR, estB) =
            if (dt > 0 && tt > dt) (r * tt / dt, b * tt / dt) else (r, b)
          send(Signals.Progress(r, b, estR, estB,
            (System.nanoTime() - t0) / 1e9))
        } catch { case scala.util.control.NonFatal(_) => cancel() }
    }, intervalMs, intervalMs)
    timer = t
  }

  /** Idempotent; returns accumulated (rowsRead, bytesRead). */
  def stop(): (Long, Long) = {
    val t = timer
    if (t != null) { timer = null; t.cancel() }
    sc.removeSparkListener(listener)
    (rows.get, bytes.get)
  }
}

/** Minimal blocking client for the native protocol — the analog of the
  * reference Go SDK's connection core (pkg/sdk/client.go), used by the
  * protocol spec and the CLI. */
final class NativeClient(host: String, port: Int) {
  private val sock = new Socket(host, port)
  private val in = sock.getInputStream
  private val out = sock.getOutputStream

  @volatile private var serverHello: Option[Signals.ServerHelloMsg] = None

  /** "name major.minor" from the handshake (reference ServerVersion). */
  def serverName: String = serverHello
    .map(h => s"${h.serverName} ${h.major}.${h.minor}").getOrElse("unknown")

  def hello(database: String = "default", user: String = "default",
            password: String = "",
            idleTimeoutSec: Long = 0): Signals.ServerHelloMsg = {
    Wire.writeMessage(out, Signals.ClientHello,
      Signals.Hello("graft-scala-client", 1, 0, Signals.ProtocolVersion,
        database, user, password, idleTimeoutSec).pack())
    val h = expect(Signals.ServerHello, Signals.ServerHelloMsg.unpack)
    serverHello = Some(h)
    h
  }

  /** Progress frames seen and the last ProfileInfo received — the
    * server emits both during/after queries (reference signals 103/106). */
  @volatile var progressFrames: Int = 0
  @volatile var lastProgress: Option[Signals.Progress] = None
  @volatile var lastProfile: Option[Signals.ProfileInfo] = None

  /** Runs a query; returns (columns, rows), accumulating every
    * ServerData block until EndOfStream (results stream in chunks).
    * Progress heartbeats and the ProfileInfo summary are recorded on
    * the side. */
  def query(sql: String, queryId: String = "",
            database: String = ""): (Seq[String], Seq[Seq[String]]) = {
    Wire.writeMessage(out, Signals.ClientQuery,
      Signals.Query(sql, queryId, database, "default", "").pack())
    var columns: Seq[String] = Seq.empty
    val rows = Seq.newBuilder[Seq[String]]
    var streaming = true
    while (streaming) {
      Wire.readMessage(in) match {
        case Some((Signals.ServerData, payload)) =>
          val d = Signals.Data.unpack(payload)
          columns = d.columns.map(_._1)
          rows ++= d.rows
        case Some((Signals.ServerProgress, payload)) =>
          progressFrames += 1
          lastProgress = Some(Signals.Progress.unpack(payload))
        case Some((Signals.ServerProfileInfo, payload)) =>
          lastProfile = Some(Signals.ProfileInfo.unpack(payload))
        case Some((Signals.ServerEndOfStream, _)) => streaming = false
        case Some((Signals.ServerException, payload)) =>
          val e = Signals.Exception.unpack(payload)
          throw new RuntimeException(s"${e.code}: ${e.message}")
        case Some((Signals.ServerClose, payload)) =>
          throw new RuntimeException(
            s"server closed connection: ${Signals.Close.unpack(payload).reason}")
        case Some((other, _)) =>
          throw new RuntimeException(s"unexpected signal $other in result stream")
        case None => throw new RuntimeException("connection closed")
      }
    }
    (columns, rows.result())
  }

  /** Batch-insert block; no server reply on success. */
  def insert(table: String, columns: Seq[String],
             rows: Seq[Seq[String]]): Unit =
    Wire.writeMessage(out, Signals.ClientData,
      Signals.DataBlock(table, columns, rows).pack())

  def cancel(queryId: String): String = {
    Wire.writeMessage(out, Signals.ClientCancel, Signals.Cancel(queryId).pack())
    val data = expect(Signals.ServerData, Signals.Data.unpack)
    expect(Signals.ServerEndOfStream, _ => ())
    data.rows.head.head
  }

  def ping(): Long = {
    val b = new java.io.ByteArrayOutputStream()
    Wire.writeU64(b, System.currentTimeMillis())
    Wire.writeMessage(out, Signals.ClientPing, b.toByteArray)
    val p = expect(Signals.ServerPong, p => new Wire.Cursor(p).u64())
    p
  }

  private def expect[A](tpe: Int, unpack: Array[Byte] => A): A =
    Wire.readMessage(in) match {
      case Some((`tpe`, payload)) => unpack(payload)
      case Some((Signals.ServerException, payload)) =>
        val e = Signals.Exception.unpack(payload)
        throw new RuntimeException(s"${e.code}: ${e.message}")
      case Some((other, _)) =>
        throw new RuntimeException(s"unexpected signal $other (wanted $tpe)")
      case None => throw new RuntimeException("connection closed")
    }

  def close(): Unit = sock.close()
}
