package graft.engine

/** Line/column position tracking for dialect parse errors, mirroring
  * the reference's PositionTracker
  * (/root/reference/server/query/parser/position.go): 1-based line
  * and column, all three line-ending conventions (LF, CRLF, CR),
  * column counted in code points (the reference counts UTF-8 runes —
  * same value for any text), out-of-range offsets clamped, and a
  * DetailedError-style source line + caret renderer
  * (errors.go:137-190). */
object SqlPosition {

  /** Byte^W char offsets where each line starts. */
  private def lineStarts(source: String): IndexedSeq[Int] = {
    val starts = IndexedSeq.newBuilder[Int]
    starts += 0
    var i = 0
    val n = source.length
    while (i < n) {
      source.charAt(i) match {
        case '\n' => starts += i + 1; i += 1
        case '\r' =>
          if (i + 1 < n && source.charAt(i + 1) == '\n') i += 2 else i += 1
          starts += i
        case _ => i += 1
      }
    }
    starts.result()
  }

  /** 1-based (line, column) of `offset` in `source`; offsets past the
    * end clamp to the final position, negatives to (1, 1). */
  def lineColumn(source: String, offset: Int): (Int, Int) = {
    if (offset < 0 || source.isEmpty) return (1, 1)
    val off = math.min(offset, source.length)
    val starts = lineStarts(source)
    // last line start <= off
    var lo = 0; var hi = starts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (starts(mid) <= off) lo = mid else hi = mid - 1
    }
    val col = source.substring(starts(lo), off).codePointCount(0, off - starts(lo)) + 1
    (lo + 1, col)
  }

  /** The text of 1-based `line` (no terminator); "" out of range. */
  def sourceLine(source: String, line: Int): String = {
    val starts = lineStarts(source)
    if (line < 1 || line > starts.length) return ""
    val from = starts(line - 1)
    var to = from
    while (to < source.length &&
           source.charAt(to) != '\n' && source.charAt(to) != '\r') to += 1
    source.substring(from, to)
  }

  /** `"  42 | SELECT ...\n       |    ^"` — the reference's visual
    * context block (line number gutter + caret under the column). */
  def caret(source: String, offset: Int): String = {
    val (line, col) = lineColumn(source, offset)
    caretAt(source, line, col)
  }

  /** [[caret]] from an already-computed 1-based (line, column). */
  def caretAt(source: String, line: Int, col: Int): String = {
    val text = sourceLine(source, line)
    if (text.isEmpty) return ""
    val gutter = f"$line%4d | "
    val pointer = " " * (gutter.length + math.min(col - 1, text.length)) + "^"
    s"$gutter$text\n$pointer"
  }
}
