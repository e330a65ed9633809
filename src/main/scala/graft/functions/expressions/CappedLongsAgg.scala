package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Primitive capped long accumulator — the aggregation buffer of
  * [[CappedLongsAgg]]. Growth stops at `cap` elements; all appends
  * past the cap are dropped (the caller's size filter discards such
  * groups anyway — see the aggregate's contract below). */
final class LongVec(val cap: Int, var arr: Array[Long], var n: Int) {
  def this(cap: Int) = this(cap, new Array[Long](math.min(cap, 8)), 0)
  def add(v: Long): Unit = if (n < cap) {
    if (n == arr.length)
      arr = java.util.Arrays.copyOf(arr, math.min(cap, math.max(8, arr.length * 2)))
    arr(n) = v
    n += 1
  }
}

/** `capped_longs(id, cap)` — collect_list for BIGINT ids that stops
  * accumulating past `cap` elements (partial buffers and merges are
  * both capped). Contract: the result equals `collect_list(id)`
  * EXACTLY for groups of size <= cap - 1 when called with
  * cap = threshold + 1, and any larger group still reports
  * size >= cap, so a downstream `size(ids) <= threshold` filter makes
  * the two formulations result-identical. Built for the LSH bucket
  * pipelines (r17): collect_list's generic ObjectHashAggregate buffer
  * (boxed ArrayBuffer + per-row serializer) measured ~1.8 s CPU above
  * a declarative count on the identical keys, and an uncapped list
  * means a degenerate mega-bucket (boilerplate key at 100 TB)
  * materializes its full membership per map task before the filter
  * drops it — this kernel bounds that memory at cap longs per group
  * by construction. */
case class CappedLongsAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVec] with UnaryLike[Expression] {

  require(cap >= 1, s"capped_longs cap must be >= 1, got $cap")

  // update() casts straight to Long — reject mistyped calls at
  // ANALYSIS (the MisraGriesAgg route: AbstractDataType is
  // private[sql], so the check is declared directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): LongVec = new LongVec(cap)

  override def update(buf: LongVec, input: InternalRow): LongVec = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long]) // null-skip = collect_list
    buf
  }

  override def merge(buf: LongVec, other: LongVec): LongVec = {
    var i = 0
    while (i < other.n && buf.n < cap) { buf.add(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: LongVec): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.n))

  override def serialize(buf: LongVec): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVec = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    val arr = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new LongVec(cap, arr, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "capped_longs"

  override def withNewMutableAggBufferOffset(offset: Int): CappedLongsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CappedLongsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CappedLongsAgg =
    copy(child = newChild)
}

object CappedLongsAgg {
  /** Column form: `cappedLongs(doc_id, BucketCap + 1)` under a
    * groupBy whose consumer filters `size(ids) <= BucketCap`. */
  def cappedLongs(c: Column, cap: Int): Column =
    GraftBridge.column(
      CappedLongsAgg(GraftBridge.expression(c), cap).toAggregateExpression())
}
