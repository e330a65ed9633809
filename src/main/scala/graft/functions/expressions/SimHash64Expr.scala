package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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
  * Bit-compatible with the HOF version: token hash = xxhash64(token)
  * (Spark default seed 42), bit i of the fingerprint = sign of the
  * +/-1 vote sum of each token's hash bit i.
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
  private val Seed = 42L // xxhash64's default seed in Spark

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = if (s == null) 0L else XXH64.hashUTF8String(s, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
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
