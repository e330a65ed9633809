package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE base alphabet: the UTF-8 BYTES of a string, each
  * rendered through the GPT-2 byte-to-unicode table (public knowledge
  * — gpt-2/src/encoder.py `bytes_to_unicode`): printable non-space
  * bytes (33-126, 161-172, 174-255) map to themselves; the other 68
  * bytes (controls, space, DEL..160, 173) map to codepoints 256+n in
  * first-excluded order, so byte 0x20 renders as 'Ġ' (U+0120). The
  * remap is what makes byte-level BPE compose with the repo's
  * separator-invariant word rendering (" s1  s2 "): no symbol can BE
  * or CONTAIN a space, by construction — the same reason GPT-2 itself
  * remaps — and every one of the 256 byte symbols is a single
  * printable character. Coverage is total (all 256 bytes map), which
  * is the no-UNK property byte-level tokenizers exist for.
  *
  * Truly byte-level: evaluation walks `UTF8String.getBytes`, so a
  * 2-byte UTF-8 character ('é' = C3 A9) yields TWO symbols ('Ã',
  * '©'). JVM strings are always valid UTF-8 after encoding (unpaired
  * surrogates become '?' at 0x3F during UTF-8 conversion — the
  * documented JVM behavior; nothing is dropped and coverage stays
  * total).
  */
case class ByteSymbolsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_symbols"

  override def nullSafeEval(input: Any): Any =
    ByteSymbolsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.ByteSymbolsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteSymbolsExpr =
    copy(child = newChild)
}

/** Companion class exists so Scala emits a Java static forwarder for
  * `compute` — generated (Janino) code calls it without MODULE$. */
class ByteSymbolsImpl private ()

object ByteSymbolsImpl {

  /** byte (0-255) → rendered symbol, the GPT-2 table. Kept as the
    * formula (not a literal dump) so the DuckDB-oracle CASE in
    * Curation generates the provably-identical mapping; BpeByteSpec
    * cross-checks the two. */
  val symbolTable: Array[UTF8String] = {
    val out = new Array[UTF8String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      val cp = if (printable) b else { val c = 256 + n; n += 1; c }
      out(b) = UTF8String.fromString(new String(Character.toChars(cp)))
      b += 1
    }
    out
  }

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = symbolTable(bytes(i) & 0xff)
      i += 1
    }
    new GenericArrayData(out)
  }
}
