package graft.engine

/** Bounded, position-sorted parse-error accumulator, mirroring the
  * reference parser's ErrorCollector
  * (server/query/parser/error_recovery_test.go behaviors: empty
  * state, add-up-to-limit, position-ordered retrieval, and a
  * multi-error rendering headed "Found N parsing errors"). Used by
  * [[RangerDdl.parseCollecting]] so one malformed statement reports
  * every recoverable mistake in one round-trip. */
final class ErrorCollector(maxErrors: Int = 10) {
  require(maxErrors >= 1, s"maxErrors must be >= 1, got $maxErrors")

  private val buf = scala.collection.mutable.ArrayBuffer[RangerDdl.ParseError]()
  private var droppedCount = 0

  /** False once the limit is reached (the error is counted but not
    * kept — the rendering reports how many were dropped). */
  def add(e: RangerDdl.ParseError): Boolean =
    if (buf.length < maxErrors) { buf += e; true }
    else { droppedCount += 1; false }

  def hasErrors: Boolean = buf.nonEmpty
  def errorCount: Int = buf.length
  def dropped: Int = droppedCount

  /** Collected errors in source-position order (unpositioned errors,
    * line 0, sort first — they describe the statement as a whole). */
  def errors: Seq[RangerDdl.ParseError] =
    buf.sortBy(e => (e.line, e.column)).toSeq

  /** The reference's FormatAllErrors shape: a "Found N parsing
    * errors" header, then one "Error i:" block per error with the
    * source line + caret when the error is positioned. */
  def formatAll(source: String): String = {
    val es = errors
    if (es.isEmpty) return "No parsing errors"
    val blocks = es.zipWithIndex.map { case (e, i) =>
      val caret =
        if (e.line > 0) SqlPosition.caretAt(source, e.line, e.column)
        else ""
      s"Error ${i + 1}: ${e.message}" +
        (if (caret.nonEmpty) s"\n$caret" else "")
    }
    val head =
      if (es.length == 1) "Found 1 parsing error:"
      else s"Found ${es.length} parsing errors:"
    val tail =
      if (droppedCount > 0) s"\n\n(${droppedCount} further error(s) suppressed)"
      else ""
    head + "\n\n" + blocks.mkString("\n\n") + tail
  }
}
