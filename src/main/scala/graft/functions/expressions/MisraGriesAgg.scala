package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory Misra-Gries frequent-items summary.
  *
  * `capacity` counters guarantee that every item whose true frequency
  * exceeds n/(capacity+1) is present in the summary (Misra & Gries
  * 1982), and the merge rule — sum counters, then subtract the
  * (capacity+1)-th largest count and drop non-positives — preserves
  * that guarantee under arbitrary merge trees (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). The summary is therefore a
  * provable candidate SUPERSET for exact heavy hitters: a second exact
  * count over just the candidates yields a result that is independent
  * of partition layout even though the summary itself is not.
  */
final class MgSummary(val capacity: Int) {
  /** Total items observed (exact — needed for the n/(c+1) threshold). */
  var n: Long = 0L
  /** Keys are UTF8String — the update path must not allocate a JVM
    * String per input row; probes are zero-copy, and a key is copied
    * only when it actually enters the map (the aggregation framework
    * reuses the input buffer between rows). Overflow sweeps are
    * amortized O(1)/row: each O(capacity) sweep retires capacity+1
    * observed units and only ~n/(capacity+1) sweeps can happen. */
  val counts = new java.util.HashMap[UTF8String, java.lang.Long]()

  def add(s: String): Unit = addKey(UTF8String.fromString(s))

  def addKey(k: UTF8String): Unit = {
    n += 1
    val cur = counts.get(k)
    if (cur != null) counts.put(k, cur + 1L)
    else if (counts.size < capacity) counts.put(k.copy(), 1L)
    else {
      // classic MG overflow: the new item and one unit of every counter
      // cancel; zeroed counters free their slots.
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Spec convenience: resident tokens as JVM strings. */
  def tokens: Set[String] = {
    val b = Set.newBuilder[String]
    val it = counts.keySet().iterator()
    while (it.hasNext) b += it.next().toString
    b.result()
  }

  def mergeWith(o: MgSummary): Unit = {
    n += o.n
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        if (e.getValue <= d) it2.remove() else e.setValue(e.getValue - d)
      }
    }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeLong(n)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object MgSummary {
  def fromBytes(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSummary(in.readInt())
    s.n = in.readLong()
    var k = in.readInt()
    while (k > 0) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      s.counts.put(UTF8String.fromBytes(kb), in.readLong())
      k -= 1
    }
    s
  }
}

/** The library's custom Catalyst AGGREGATE (the §2.10 surface next to
  * the scalar expressions): per-partition Misra-Gries summaries merged
  * by Spark's partial/final aggregation. Evaluates to
  * `struct(n BIGINT, cands ARRAY<STRING>)` — the exact stream length
  * plus the ≤capacity candidate tokens (sorted for stable display;
  * the SET may vary with partitioning, its heavy-hitter SUPERSET
  * property may not — see [[MgSummary]]). Driver/output state is
  * bounded by `capacity` regardless of vocabulary size, which is the
  * point: the full vocab (billions of n-grams at 100 TB) never
  * shuffles and never reaches the driver. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  // update() casts the value straight to UTF8String, so a mistyped
  // call (`mg_summary(bigint_col, k)`) must be rejected during
  // ANALYSIS, not surface as an executor ClassCastException
  // (AbstractDataType — the ExpectsInputTypes route — is private[sql]
  // in Spark 4, so the check is declared directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.addKey(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: MgSummary): Any = {
    val keys = new Array[UTF8String](buf.counts.size)
    var i = 0
    val it = buf.counts.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericInternalRow(Array[Any](
      buf.n, new GenericArrayData(keys.asInstanceOf[Array[Any]])))
  }

  override def serialize(buf: MgSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MgSummary =
    MgSummary.fromBytes(bytes)

  override def dataType: DataType = MisraGriesAgg.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "mg_summary"

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  val resultType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("cands", ArrayType(StringType, containsNull = false),
                nullable = false)))

  /** Column form: `mgSummary(tok, 255)` under an ungrouped agg(). */
  def mgSummary(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), capacity)
        .toAggregateExpression())
}
