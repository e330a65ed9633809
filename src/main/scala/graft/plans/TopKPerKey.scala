package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}

/** Per-key top-k as a first-class operator — the custom-operator tier
  * of the brief: LogicalPlan + SparkStrategy + SparkPlan, registered
  * via SparkSessionExtensions (graft.GraftExtensions).
  *
  * The composed form (`row_number().over(Window.partitionBy(keys)
  * .orderBy(ord)) <= k`) must fully SORT every partition group —
  * O(n log n) per key and a wide sort buffer. This operator keeps a
  * bounded k-element heap per key in one pass over each partition:
  * O(n log k), memory O(#keys·k) per partition, no sort exchange. At
  * 100 TB that's the difference between a sort spill per group and a
  * streaming pass. The shuffle (hash by key) still happens — it is the
  * operator's required distribution, and Catalyst inserts it. */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask Catalyst to co-locate each key's rows (inserts the hash
    * shuffle exactly once, reusing any compatible existing one). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ordering: "row a ranks before row b" per the requested order
      val rank = GenerateOrdering.generate(sortOrder, childOutput)
      // heap keeps the k best; head = currently worst of the kept
      val heapOrd = rank.reversed().asInstanceOf[java.util.Comparator[InternalRow]]
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rank.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        val rows = new Array[InternalRow](h.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // emit in rank order
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** DataFrame API: top `k` rows per `keys` group, ranked by `orderBy`
    * (name, descending?) pairs. Columns are resolved eagerly against
    * the child's analyzed output — Spark 4's lazy ColumnNode wrappers
    * are not resolved inside custom logical nodes by the analyzer. */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    // self-contained: ensure the strategy is installed even when the
    // session was built without graft.GraftExtensions
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not in ${child.output.map(_.name).mkString(", ")}"))
    val so = orderBy.map { case (n, descending) =>
      SortOrder(attr(n), if (descending) Descending else Ascending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys.map(attr), so, k, child))
  }
}
