package graft.server.pgwire

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean
import scala.util.control.NonFatal

import graft.engine.{QueryAnalyzer, QueryEngine}

/** Postgres-wire ("JDBC") protocol slice: startup handshake + simple
  * query (Q) + CommandComplete tags, the reference's second entry
  * point (server/protocols/jdbc/protocol.go:11-44 message types,
  * handler.go:33-161 connection/query flow,
  * query/jdbc/sql_parser_middleware.go:377-418 tag generation).
  *
  * The slice speaks enough of the v3 protocol for psql and a JDBC
  * driver in simple-query mode: SSLRequest refused with 'N', startup
  * params accepted, AuthenticationOk + ParameterStatus + BackendKeyData
  * + ReadyForQuery, then a Q/CommandComplete loop. Extended-protocol
  * messages (Parse/Bind/Execute) get a polite ErrorResponse, exactly
  * like the reference's unimplemented handlers.
  */
final class PgWireServer(engine: QueryEngine, port: Int = 2848) {

  // message type bytes (protocol.go:11-44)
  private val SslRequestCode = 80877103
  private val CancelRequestCode = 80877102
  private val GssEncRequestCode = 80877104

  @volatile private var server: ServerSocket = _
  private val running = new AtomicBoolean(false)

  def boundPort: Int = server.getLocalPort

  def start(): Unit = {
    server = new ServerSocket(port)
    running.set(true)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val ct = new Thread(() => handle(sock), s"pgwire-conn-${sock.getPort}")
          ct.setDaemon(true)
          ct.start()
        } catch {
          case _: SocketException => ()
          case NonFatal(_) => ()
        }
      }
    }, "pgwire-acceptor")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  // ---------------------------------------------------------- connection

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      if (!startup(in, out)) return
      var open = true
      while (open) {
        val tpe =
          try in.readUnsignedByte()
          catch { case _: EOFException => return }
        val len = in.readInt()
        val payload = new Array[Byte](len - 4)
        in.readFully(payload)
        (tpe: @unchecked) match {
          case 'Q' =>
            val sql = cString(payload, 0)._1.trim
            runQuery(out, sql)
          case 'X' => open = false // Terminate
          case 'S' => readyForQuery(out) // Sync
          case other =>
            // Parse/Bind/Execute/Describe/Close: not in the slice
            errorResponse(out, "0A000",
              s"message type '${other.toChar}' not supported (simple query protocol only)")
            readyForQuery(out)
        }
      }
    } catch {
      case NonFatal(_) => ()
    } finally {
      try sock.close() catch { case NonFatal(_) => () }
    }
  }

  /** Startup: optional SSLRequest ('N' refusal) then the real startup
    * packet; replies AuthenticationOk, ParameterStatus set,
    * BackendKeyData, ReadyForQuery (protocol.go:293-330). */
  private def startup(in: DataInputStream, out: DataOutputStream): Boolean = {
    var len = in.readInt()
    var code = in.readInt()
    if (code == SslRequestCode || code == GssEncRequestCode) {
      out.writeByte('N'); out.flush() // no TLS in the slice
      len = in.readInt()
      code = in.readInt()
    }
    if (code == CancelRequestCode) return false // keyless cancel: ignore
    val payload = new Array[Byte](len - 8)
    in.readFully(payload)
    val params = parseParams(payload)
    params.get("database").filter(_.nonEmpty).foreach { db =>
      try engine.spark.catalog.setCurrentDatabase(db)
      catch { case NonFatal(_) => () }
    }
    // AuthenticationOk
    message(out, 'R', b => b.writeInt(0))
    // ParameterStatus entries (protocol.go:300-310 layout)
    Seq(
      "server_version" -> "14.1 (Graft)",
      "client_encoding" -> "UTF8",
      "server_encoding" -> "UTF8",
      "DateStyle" -> "ISO, MDY",
      "TimeZone" -> "UTC",
      "integer_datetimes" -> "on",
      "standard_conforming_strings" -> "on"
    ).foreach { case (k, v) =>
      message(out, 'S', b => { writeCString(b, k); writeCString(b, v) })
    }
    // BackendKeyData (pid + secret)
    message(out, 'K', b => { b.writeInt(42); b.writeInt(7) })
    readyForQuery(out)
    true
  }

  // ---------------------------------------------------------- queries

  private def runQuery(out: DataOutputStream, sql: String): Unit = {
    if (sql.isEmpty || sql == ";") {
      message(out, 'I', _ => ()) // EmptyQueryResponse
      readyForQuery(out)
      return
    }
    try {
      val res = engine.execute(sql)
      if (res.columns.nonEmpty) {
        rowDescription(out, res.columns)
        res.data.foreach(dataRow(out, _))
      }
      commandComplete(out, tag(sql, res.rowCount))
    } catch {
      case NonFatal(e) =>
        errorResponse(out, "XX000",
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }
    readyForQuery(out)
  }

  /** CommandComplete tags, mirroring GenerateCommandCompleteTag
    * (sql_parser_middleware.go:377-418). */
  private def tag(sql: String, rowCount: Long): String = {
    val stmt = QueryAnalyzer.statementType(sql)
    stmt match {
      case "SELECT" => s"SELECT $rowCount"
      case "INSERT" => s"INSERT 0 $rowCount"
      case "UPDATE" => s"UPDATE $rowCount"
      case "DELETE" => s"DELETE $rowCount"
      case "CREATE TABLE" | "DROP TABLE" | "ALTER TABLE" | "CREATE DATABASE" |
           "DROP DATABASE" | "USE" | "SHOW" | "EXPLAIN" => stmt
      case _ => "OK"
    }
  }

  // ---------------------------------------------------------- wire writers

  private def message(out: DataOutputStream, tpe: Char,
                      body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    body(new DataOutputStream(buf))
    out.writeByte(tpe)
    out.writeInt(4 + buf.size())
    buf.writeTo(out)
    out.flush()
  }

  private def readyForQuery(out: DataOutputStream): Unit =
    message(out, 'Z', _.writeByte('I'))

  private def commandComplete(out: DataOutputStream, tag: String): Unit =
    message(out, 'C', writeCString(_, tag))

  private def errorResponse(out: DataOutputStream, code: String, msg: String): Unit =
    message(out, 'E', b => {
      b.writeByte('S'); writeCString(b, "ERROR")
      b.writeByte('C'); writeCString(b, code)
      b.writeByte('M'); writeCString(b, msg)
      b.writeByte(0)
    })

  /** Text-format row description; every column ships as text oid 25,
    * the reference's choice (handler.go:125-130). */
  private def rowDescription(out: DataOutputStream, cols: Seq[String]): Unit =
    message(out, 'T', b => {
      b.writeShort(cols.length)
      cols.foreach { c =>
        writeCString(b, c)
        b.writeInt(0) // table oid
        b.writeShort(0) // attr number
        b.writeInt(25) // type oid: text
        b.writeShort(-1) // type size
        b.writeInt(-1) // type modifier
        b.writeShort(0) // format: text
      }
    })

  private def dataRow(out: DataOutputStream, row: Seq[Any]): Unit =
    message(out, 'D', b => {
      b.writeShort(row.length)
      row.foreach {
        case null => b.writeInt(-1)
        case v =>
          val bytes = v.toString.getBytes(UTF_8)
          b.writeInt(bytes.length)
          b.write(bytes)
      }
    })

  private def writeCString(out: DataOutputStream, s: String): Unit = {
    out.write(s.getBytes(UTF_8)); out.writeByte(0)
  }

  private def cString(data: Array[Byte], from: Int): (String, Int) = {
    var end = from
    while (end < data.length && data(end) != 0) end += 1
    (new String(data, from, end - from, UTF_8), end + 1)
  }

  private def parseParams(data: Array[Byte]): Map[String, String] = {
    var pos = 0
    val out = Map.newBuilder[String, String]
    while (pos < data.length && data(pos) != 0) {
      val (k, p1) = cString(data, pos)
      val (v, p2) = cString(data, p1)
      out += k -> v
      pos = p2
    }
    out.result()
  }
}
