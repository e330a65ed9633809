package graft.functions.expressions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership summary as a Catalyst aggregate — the
  * shard builder for the `bloom` index kind: one filter per
  * (base-table file, indexed column), consulted at PLANNING time by
  * the file-skipping rule for equality/IN predicates that min/max
  * zonemaps cannot serve (high-cardinality values in unclustered
  * layouts — every file spans the whole range, but each file holds
  * only its own value set). Same design as ClickHouse's
  * `bloom_filter` skipping index and Parquet's column bloom filters,
  * hoisted to file granularity so a point query resolves its file
  * list without opening any footer.
  *
  * Soundness is the bloom contract: `mightContain == false` proves no
  * row in the file holds the value (no false negatives, ever — an
  * over-saturated filter only loses PRUNING POWER, never correctness).
  * NULL inputs are skipped: a `col = literal` predicate never matches
  * a NULL row, so their absence from the filter cannot unsoundly
  * prune.
  *
  * Value representation (must match the probe side exactly,
  * [[graft.plans.ZonemapPruneRule]]):
  *  - integral columns arrive cast to LONG and enter via `putLong` —
  *    exact for every integral width, and equality through a widening
  *    integral cast compares the same long value;
  *  - string columns enter as their raw UTF-8 bytes via `putBinary`
  *    (never through java.lang.String — invalid UTF-8 from parquet's
  *    permissive BINARY read must hash as-is, not as U+FFFD).
  *
  * Spark's own `BloomFilter` sketch (spark-sketch) supplies the bit
  * array, hashing and the serialized form — one implementation for
  * build (executors), merge (partial aggregation) and probe (driver,
  * `readFrom`), so representation drift is impossible within a
  * build. `expectedItems`/`fpp` are frozen in the index meta at
  * CREATE ([[graft.engine.IndexManager]]); filters created with the
  * same parameters are merge-compatible by construction.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT or STRING argument, got ${dt.sql}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buf.putLong(l)
      case s: UTF8String => buf.putBinary(s.getBytes)
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {
  /** Column form: `bloomAgg(col, 1 << 20, 0.03)` under an agg(). */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())
}
