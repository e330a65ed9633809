package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Native Catalyst expression for 64-bit SimHash over a token array.
  *
  * Replaces the higher-order-function formulation in
  * [[graft.functions.Text.simhash64]] (64 nested aggregates =
  * O(64·N) interpreted lambda dispatches per row) with one tight
  * O(N) JVM loop that participates in whole-stage codegen via a
  * static call — the custom-Expression tier of the build brief
  * ("(b) a custom Catalyst Expression" before mapPartitions).
  *
  * Bit-compatible with the HOF version AND with DuckDB oracle SQL:
  * the token hash comes from the cross-engine md5 family
  * (see [[ArrayOpsImpl]]) — vote bits 0-31 from md5 hex chars 1-8,
  * bits 32-63 from chars 9-16; fingerprint bit i = sign of the +/-1
  * vote sum of each token's hash bit i.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Companion class exists so Scala emits a Java static forwarder for
  * `compute` — generated (Janino) code calls it without MODULE$. */
class SimHashImpl private ()

object SimHashImpl {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // lo = md5 hex chars 1-8 (bytes 0..3 BE), hi = chars 9-16
        val lo = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        val hi = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        var b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((hi >>> b) & 1L) == 1L) votes(b + 32) += 1 else votes(b + 32) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object SimHash64Expr {
  /** Column API entry point. */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))

  /** Make `simhash64(...)` usable from SQL text. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
}
