package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator extension path (logical node → planner strategy →
  * physical exec, injected via SparkSessionExtensions): top-k rows per
  * key with an explicit rank column.
  *
  * Why a custom operator: the declarative formulation
  * (row_number window + filter rk<=k) must SORT every key's entire
  * partition before discarding all but k rows. This exec keeps a
  * bounded k-element heap per key - O(n log k) instead of
  * O(n log n) work and O(k) instead of O(n) memory per key - the
  * difference that matters when a hot key holds millions of rows at
  * 100 TB. Distribution still comes from Catalyst: the exec declares
  * ClusteredDistribution(keys) and the planner inserts the single
  * keyed exchange.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan,
                          // constructor member so `copy`/transform keeps
                          // the exprId stable for downstream references
                          rankAttr: AttributeReference =
                            AttributeReference("rk", LongType,
                              nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderExprs = order
    val keyExprs = keys
    val kk = k
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(outTypes)
      // per-key bounded heap: worst row on top for O(log k) eviction
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            kk + 1, ordering.reversed())
          heaps.put(key, heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { heap =>
        val rows = new Array[InternalRow](heap.size())
        var i = heap.size() - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
        var r = 0
        while (r < rows.length) {
          val joined = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(childOutput.size + 1)
          var c = 0
          while (c < childOutput.size) {
            joined.update(c, rows(r).get(c, childOutput(c).dataType))
            c += 1
          }
          joined.setLong(childOutput.size, r + 1L)
          out += toUnsafe(joined).copy()
          r += 1
        }
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the exec. */
case class TopKPerKeyStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, rankAttr) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}
