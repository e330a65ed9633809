package graft.server.native

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Wire codec for the reference's ClickHouse-style native protocol
  * (reference: server/protocols/native/protocol/codec.go,
  * constants.go, and the signals package).
  *
  * Message frame: [uint32 BE length][1 byte signal type][payload],
  * where length = 1 + payload bytes. Strings are either
  * 4-byte-BE-length-prefixed ("u32 string"), 1-byte-length-prefixed
  * (ClientHello fields), or LEB128-uvarint-length-prefixed
  * (ServerData/Exception fields) — each signal uses the exact layout
  * of its reference counterpart so the reference SDK could talk to
  * this server unchanged.
  */
object Wire {

  // -- primitive writers ------------------------------------------------

  def writeUvarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  def writeU32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  def writeU32String(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); writeU32(out, b.length); out.write(b, 0, b.length)
  }

  def writeByteString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 255, s"string too long for 1-byte length: ${b.length}")
    out.write(b.length); out.write(b, 0, b.length)
  }

  def writeUvarintString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); writeUvarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  def writeU64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 56
    while (i >= 0) { out.write(((v >>> i) & 0xFF).toInt); i -= 8 }
  }

  // -- primitive readers (over a byte array cursor) ---------------------

  final class Cursor(val data: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = data(pos) & 0xFF; pos += 1; v }
    def u32(): Int = {
      val v = ((data(pos) & 0xFF) << 24) | ((data(pos + 1) & 0xFF) << 16) |
        ((data(pos + 2) & 0xFF) << 8) | (data(pos + 3) & 0xFF)
      pos += 4; v
    }
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (data(pos + i) & 0xFFL); i += 1 }
      pos += 8; v
    }
    def uvarint(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do {
        b = data(pos) & 0xFF; pos += 1
        v |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; out
    }
    def u32String(): String = new String(bytes(u32()), UTF_8)
    def byteString(): String = new String(bytes(u8()), UTF_8)
    def uvarintString(): String = new String(bytes(uvarint().toInt), UTF_8)
  }

  // -- framing ----------------------------------------------------------

  /** Read one [len][type][payload] frame; None on clean EOF. */
  def readMessage(in: InputStream): Option[(Int, Array[Byte])] = {
    val din = new DataInputStream(in)
    val len =
      try din.readInt()
      catch { case _: EOFException => return None }
    require(len >= 1 && len <= 64 * 1024 * 1024, s"bad frame length: $len")
    val tpe = din.readUnsignedByte()
    val payload = new Array[Byte](len - 1)
    din.readFully(payload)
    Some((tpe, payload))
  }

  def writeMessage(out: OutputStream, tpe: Int, payload: Array[Byte]): Unit = {
    val dout = new DataOutputStream(out)
    dout.writeInt(1 + payload.length)
    dout.writeByte(tpe)
    dout.write(payload)
    dout.flush()
  }
}

/** Signal types + pack/unpack, one-for-one with the reference's
  * signals package (constants.go:5-31). */
object Signals {
  // client -> server
  val ClientHello = 0; val ClientQuery = 1; val ClientData = 2
  val ClientCancel = 3; val ClientPing = 4
  // server -> client
  val ServerHello = 100; val ServerData = 101; val ServerException = 102
  val ServerProgress = 103; val ServerPong = 104; val ServerEndOfStream = 105
  val ServerProfileInfo = 106; val ServerClose = 116

  val ProtocolVersion = 54460L // DBMS_TCP_PROTOCOL_VERSION

  final case class Hello(clientName: String, major: Long, minor: Long,
                         protocolVersion: Long, database: String,
                         user: String, password: String,
                         idleTimeoutSec: Long = 0, readTimeoutSec: Long = 0) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeByteString(b, clientName)
      Wire.writeUvarint(b, major); Wire.writeUvarint(b, minor)
      Wire.writeUvarint(b, protocolVersion)
      Wire.writeByteString(b, database)
      Wire.writeByteString(b, user)
      Wire.writeByteString(b, password)
      Wire.writeUvarint(b, idleTimeoutSec); Wire.writeUvarint(b, readTimeoutSec)
      b.toByteArray
    }
  }
  object Hello {
    def unpack(p: Array[Byte]): Hello = {
      val c = new Wire.Cursor(p)
      Hello(c.byteString(), c.uvarint(), c.uvarint(), c.uvarint(),
        c.byteString(), c.byteString(), c.byteString(), c.uvarint(), c.uvarint())
    }
  }

  final case class Query(query: String, queryId: String, database: String,
                         user: String, password: String) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeU32String(b, query); Wire.writeU32String(b, queryId)
      Wire.writeU32String(b, database); Wire.writeU32String(b, user)
      Wire.writeU32String(b, password)
      b.toByteArray
    }
  }
  object Query {
    def unpack(p: Array[Byte]): Query = {
      val c = new Wire.Cursor(p)
      Query(c.u32String(), c.u32String(), c.u32String(), c.u32String(), c.u32String())
    }
  }

  final case class DataBlock(table: String, columns: Seq[String],
                             rows: Seq[Seq[String]]) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeU32String(b, table)
      Wire.writeU32(b, columns.length)
      Wire.writeU32(b, rows.length)
      columns.foreach(Wire.writeU32String(b, _))
      // row-major values; types are not sent — the server knows the
      // schema (client_data.go:55)
      rows.foreach(_.foreach(Wire.writeU32String(b, _)))
      b.toByteArray
    }
  }
  object DataBlock {
    def unpack(p: Array[Byte]): DataBlock = {
      val c = new Wire.Cursor(p)
      val table = c.u32String()
      val nCols = c.u32(); val nRows = c.u32()
      val cols = Seq.fill(nCols)(c.u32String())
      val rows = Seq.fill(nRows)(Seq.fill(nCols)(c.u32String()))
      DataBlock(table, cols, rows)
    }
  }

  final case class Cancel(queryId: String) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream(); Wire.writeU32String(b, queryId); b.toByteArray
    }
  }
  object Cancel {
    def unpack(p: Array[Byte]): Cancel = Cancel(new Wire.Cursor(p).u32String())
  }

  final case class ServerHelloMsg(serverName: String, major: Int, minor: Int,
                                  revision: Long, timezone: String,
                                  displayName: String, versionPatch: Long) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeU32String(b, serverName)
      b.write(major); b.write(minor)
      Wire.writeUvarint(b, revision)
      Wire.writeU32String(b, timezone)
      Wire.writeU32String(b, displayName)
      Wire.writeUvarint(b, versionPatch)
      b.toByteArray
    }
  }
  object ServerHelloMsg {
    def unpack(p: Array[Byte]): ServerHelloMsg = {
      val c = new Wire.Cursor(p)
      ServerHelloMsg(c.u32String(), c.u8(), c.u8(), c.uvarint(),
        c.u32String(), c.u32String(), c.uvarint())
    }
  }

  /** Result block. NOTE the reference's wire quirk, reproduced
    * faithfully: each column's values are joined with commas into ONE
    * uvarint-prefixed string (server_data.go:84-104) — values that
    * contain commas are not round-trippable. The reference SDK splits
    * on commas; so does [[NativeClient]]. */
  final case class Data(columns: Seq[(String, String)], rows: Seq[Seq[String]]) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeUvarint(b, columns.length.toLong)
      columns.foreach { case (n, t) =>
        Wire.writeUvarintString(b, n); Wire.writeUvarintString(b, t)
      }
      Wire.writeUvarint(b, 1L) // data block marker (server_data.go:67)
      Wire.writeUvarint(b, rows.length.toLong)
      columns.indices.foreach { i =>
        Wire.writeUvarintString(b, rows.map(_(i)).mkString(","))
      }
      b.toByteArray
    }
  }
  object Data {
    def unpack(p: Array[Byte]): Data = {
      val c = new Wire.Cursor(p)
      val nCols = c.uvarint().toInt
      val cols = Seq.fill(nCols)((c.uvarintString(), c.uvarintString()))
      c.uvarint() // data block marker
      val nRows = c.uvarint().toInt
      val colData = Seq.fill(nCols)(c.uvarintString())
      val split = colData.map(_.split(",", -1).toSeq)
      val rows = (0 until nRows).map(r => split.map(col =>
        if (r < col.length) col(r) else ""))
      Data(cols, rows)
    }
  }

  /** Execution heartbeat (server_progress.go:10-63): four uvarints +
    * elapsed time as 8-byte-BE microseconds. Totals are 0 when the
    * engine cannot estimate them up front — same as the reference. */
  final case class Progress(rowsRead: Long, bytesRead: Long,
                            totalRows: Long, totalBytes: Long,
                            elapsedSec: Double) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeUvarint(b, rowsRead); Wire.writeUvarint(b, bytesRead)
      Wire.writeUvarint(b, totalRows); Wire.writeUvarint(b, totalBytes)
      Wire.writeU64(b, (elapsedSec * 1e6).toLong)
      b.toByteArray
    }
  }
  object Progress {
    def unpack(p: Array[Byte]): Progress = {
      val c = new Wire.Cursor(p)
      Progress(c.uvarint(), c.uvarint(), c.uvarint(), c.uvarint(),
        c.u64() / 1e6)
    }
  }

  /** End-of-query execution summary (server_profile_info.go:10-22):
    * six uvarints. */
  final case class ProfileInfo(rowsReadBeforeLimit: Long,
                               bytesReadBeforeLimit: Long,
                               appliedLimit: Long, appliedOffset: Long,
                               rowsRead: Long, bytesRead: Long) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Seq(rowsReadBeforeLimit, bytesReadBeforeLimit, appliedLimit,
        appliedOffset, rowsRead, bytesRead).foreach(Wire.writeUvarint(b, _))
      b.toByteArray
    }
  }
  object ProfileInfo {
    def unpack(p: Array[Byte]): ProfileInfo = {
      val c = new Wire.Cursor(p)
      ProfileInfo(c.uvarint(), c.uvarint(), c.uvarint(), c.uvarint(),
        c.uvarint(), c.uvarint())
    }
  }

  /** Server-initiated close (server_close.go:20-60): u32-BE-length-
    * prefixed reason. Sent before the server drops an idle connection
    * (connection.go:557-576). */
  final case class Close(reason: String) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeU32String(b, reason)
      b.toByteArray
    }
  }
  object Close {
    def unpack(p: Array[Byte]): Close = Close(new Wire.Cursor(p).u32String())
  }

  final case class Exception(code: String, message: String, stackTrace: String) {
    def pack(): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      Wire.writeUvarintString(b, code)
      Wire.writeUvarintString(b, message)
      Wire.writeUvarintString(b, stackTrace)
      b.toByteArray
    }
  }
  object Exception {
    def unpack(p: Array[Byte]): Exception = {
      val c = new Wire.Cursor(p)
      Exception(c.uvarintString(), c.uvarintString(), c.uvarintString())
    }
  }
}
