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
/** Which rank function's bound the operator enforces. `RowNumber`
  * keeps a strict k-row heap; `CompetitionRank` retains boundary tie
  * groups (rank() ties share a rank, so a tie group whose competition
  * rank can still be <= k must survive); `DenseRank` bounds DISTINCT
  * order values - it keeps every row whose order value is among the k
  * best distinct values, which is locally decidable with a bounded
  * value-group structure (cap distinct order keys, not rows).
  */
sealed trait RankSemantics extends Serializable
object RankSemantics {
  case object RowNumber extends RankSemantics
  case object CompetitionRank extends RankSemantics
  case object DenseRank extends RankSemantics
}

case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan,
                          // constructor member so `copy`/transform keeps
                          // the exprId stable for downstream references
                          rankAttr: AttributeReference =
                            AttributeReference("rk", LongType,
                              nullable = false)(),
                          semantics: RankSemantics =
                            RankSemantics.RowNumber) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan,
                          semantics: RankSemantics = RankSemantics.RowNumber)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // the heap trims rows WITHIN partitions - the child's (key-hash)
  // partitioning survives verbatim. Without this override the default
  // UnknownPartitioning makes every downstream same-key operator
  // (per-key agg after a group limit, a cumsum window after a budget
  // trim) re-exchange rows that are already exactly where they belong.
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    if (semantics == RankSemantics.DenseRank) doExecuteDense()
    else doExecuteHeap()

  private def doExecuteHeap(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderExprs = order
    val keyExprs = keys
    val kk = k
    val rankLikeFlag = semantics == RankSemantics.CompetitionRank
    val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(outTypes)
      // The heaps live on-heap, but their footprint is REGISTERED with
      // Spark's task memory manager (HeapLedger): the memory shows up
      // in execution-memory accounting, so co-resident spillable
      // consumers (sorts, aggregates) shrink to make room instead of
      // the task silently overcommitting. The ledger itself cannot
      // spill - the working set is the operator's O(#keys × k) minimum.
      val ledger = TopKMemoryLedger.forCurrentTask()
      val heaps = TopKBuild.buildHeaps(iter, keyProj, ordering, ledger,
        kk, rankLikeFlag)
      // Stream the output: one key's ≤k rows are materialized at a
      // time and handed to the consumer, instead of buffering the whole
      // partition's result. Post-consumption memory is the heap map
      // itself - O(#keys-in-partition × k) bounded rows, the operator's
      // inherent working set (a hot key holding millions of input rows
      // still costs only k). Each heap is drained (and its entry
      // removed) as it is emitted, so peak memory never exceeds the
      // build phase's.
      val entries = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var rows: Array[InternalRow] = Array.empty
        private var r = 0
        private var rk = 0
        private val joined = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(childOutput.size + 1)

        override def hasNext: Boolean = {
          while (r >= rows.length && entries.hasNext) {
            val heap = entries.next().getValue
            entries.remove()
            rows = new Array[InternalRow](heap.size())
            var i = heap.size() - 1
            while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
            r = 0
            rk = 0
          }
          r < rows.length
        }

        override def next(): InternalRow = {
          var c = 0
          while (c < childOutput.size) {
            joined.update(c, rows(r).get(c, childOutput(c).dataType))
            c += 1
          }
          // row_number mode: dense positional rank; rank() mode:
          // competition rank (ties share, next rank skips)
          if (!rankLikeFlag || r == 0 ||
              ordering.compare(rows(r - 1), rows(r)) != 0)
            rk = r + 1
          // rank type follows the node's rankAttr: Long for the direct
          // API, Int when substituted for a window function
          if (rankIsInt) joined.setInt(childOutput.size, rk)
          else joined.setLong(childOutput.size, rk.toLong)
          r += 1
          toUnsafe(joined)
        }
      }
    }
  }

  /** dense_rank bound: per key, a comparator-ordered map of at most k
    * DISTINCT order values, each holding its tie group. A row whose
    * value is already present joins its group; a new value is admitted
    * while fewer than k distinct values are held, or by evicting the
    * entire worst value group once it is strictly beaten (its dense
    * rank just exceeded k) - the local decidability a row-bounded heap
    * lacks. Work is O(n log k) comparisons; memory is O(#keys × k ×
    * tie-group size), the operator's inherent working set (dense_rank
    * semantics REQUIRE retaining whole tie groups), and registered
    * with the task memory manager like the heap path.
    */
  private def doExecuteDense(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderExprs = order
    val keyExprs = keys
    val kk = k
    val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(outTypes)
      val ledger = TopKMemoryLedger.forCurrentTask()
      val groups = TopKBuild.buildDense(iter, keyProj, ordering, ledger, kk)
      // stream one key at a time, draining entries as they're emitted
      // (same peak-memory argument as the heap path)
      val entries = groups.entrySet().iterator()
      new Iterator[InternalRow] {
        private var rows: Array[InternalRow] = Array.empty
        private var ranks: Array[Int] = Array.empty
        private var r = 0
        private val joined = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(childOutput.size + 1)

        override def hasNext: Boolean = {
          while (r >= rows.length && entries.hasNext) {
            val tree = entries.next().getValue
            entries.remove()
            val rowsB = Array.newBuilder[InternalRow]
            val ranksB = Array.newBuilder[Int]
            var rank = 0
            val git = tree.values().iterator()
            while (git.hasNext) {
              rank += 1
              val grp = git.next()
              var i = 0
              while (i < grp.size()) {
                rowsB += grp.get(i)
                ranksB += rank
                i += 1
              }
            }
            rows = rowsB.result()
            ranks = ranksB.result()
            r = 0
          }
          r < rows.length
        }

        override def next(): InternalRow = {
          var c = 0
          while (c < childOutput.size) {
            joined.update(c, rows(r).get(c, childOutput(c).dataType))
            c += 1
          }
          if (rankIsInt) joined.setInt(childOutput.size, ranks(r))
          else joined.setLong(childOutput.size, ranks(r).toLong)
          r += 1
          toUnsafe(joined)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** The bounded per-key build phase, shared by the final exec and the
  * map-side partial exec so the trimming semantics cannot drift. The
  * invariant every semantics variant maintains - a row is dropped only
  * once >= k locally strictly-better rows (or distinct values) exist -
  * is exactly what makes a per-partition pass a valid PARTIAL: locally
  * beaten implies globally beaten, and every row whose global rank can
  * be <= k survives.
  */
private[plans] object TopKBuild {

  def buildHeaps(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
                 ordering: Ordering[InternalRow], ledger: HeapLedger,
                 kk: Int, tieRetaining: Boolean):
      java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]] = {
    // per-key bounded heap: worst row on top for O(log k) eviction
    val heaps = new java.util.HashMap[InternalRow,
      java.util.PriorityQueue[InternalRow]]()
    // rank() mode: evict the worst TIE GROUP only once >= k rows are
    // strictly better than it (its competition rank exceeded k). The
    // heap invariantly holds exactly the rows whose rank can still be
    // <= k, so boundary ties are retained - rank's semantics - while
    // non-tied inputs degrade to the plain k-bounded heap.
    def trimWorstGroup(heap: java.util.PriorityQueue[InternalRow]): Unit = {
      var go = true
      while (go && heap.size() > kk) {
        val group = new java.util.ArrayList[InternalRow]()
        group.add(heap.poll())
        while (heap.size() > 0 &&
               ordering.compare(heap.peek(), group.get(0)) == 0)
          group.add(heap.poll())
        if (heap.size() >= kk) {
          // >= k strictly-better rows exist: group's rank > k, drop it
          var i = 0
          while (i < group.size()) { ledger.remove(group.get(i)); i += 1 }
        } else {
          heap.addAll(group)
          go = false
        }
      }
    }
    iter.foreach { row =>
      val key = keyProj(row).copy()
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](
          kk + 1, ordering.reversed())
        heaps.put(key, heap)
        ledger.add(key, TopKMemoryLedger.perKeyOverheadBytes(kk))
      }
      if (heap.size() < kk) {
        val copy = row.copy()
        heap.add(copy)
        ledger.add(copy, 0L)
      } else {
        val cmp = ordering.compare(row, heap.peek())
        if (cmp < 0) {
          val copy = row.copy()
          heap.add(copy)
          ledger.add(copy, 0L)
          if (tieRetaining) trimWorstGroup(heap)
          else ledger.remove(heap.poll())
        } else if (tieRetaining && cmp == 0) {
          // ties with the surviving worst group: same rank <= k, keep
          val copy = row.copy()
          heap.add(copy)
          ledger.add(copy, 0L)
        }
      }
    }
    heaps
  }

  def buildDense(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
                 ordering: Ordering[InternalRow], ledger: HeapLedger,
                 kk: Int):
      java.util.HashMap[InternalRow,
        java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]]] = {
    val groups = new java.util.HashMap[InternalRow,
      java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]]]()
    iter.foreach { row =>
      val key = keyProj(row).copy()
      var tree = groups.get(key)
      if (tree == null) {
        tree = new java.util.TreeMap[InternalRow,
          java.util.ArrayList[InternalRow]](ordering)
        groups.put(key, tree)
        ledger.add(key, TopKMemoryLedger.perKeyOverheadBytes(kk))
      }
      val existing = tree.get(row) // comparator lookup; row not stored
      if (existing != null) {
        val copy = row.copy()
        existing.add(copy)
        ledger.add(copy, 0L)
      } else if (tree.size() < kk) {
        val copy = row.copy()
        val grp = new java.util.ArrayList[InternalRow](1)
        grp.add(copy)
        tree.put(copy, grp)
        ledger.add(copy, 0L)
      } else if (ordering.compare(row, tree.lastKey()) < 0) {
        val copy = row.copy()
        val grp = new java.util.ArrayList[InternalRow](1)
        grp.add(copy)
        tree.put(copy, grp)
        ledger.add(copy, 0L)
        val evicted = tree.pollLastEntry().getValue
        var i = 0
        while (i < evicted.size()) { ledger.remove(evicted.get(i)); i += 1 }
      }
    }
    groups
  }
}

/** Map-side partial of TopKPerKeyExec: runs the SAME bounded trimming
  * per input partition BEFORE the exchange, so the shuffle ships at
  * most k rows (plus boundary tie groups) per key per map partition
  * instead of every row of a hot key - the combine step that makes the
  * operator skew-robust at 100 TB. Emits raw child rows (ranks are
  * assigned by the final exec over the merged survivors; the partial
  * invariant guarantees the survivors contain every row whose global
  * rank can be <= k, with its full better-set intact).
  */
case class TopKPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: SparkPlan,
                           semantics: RankSemantics = RankSemantics.RowNumber)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderExprs = order
    val keyExprs = keys
    val kk = k
    val dense = semantics == RankSemantics.DenseRank
    val tieRetaining = semantics == RankSemantics.CompetitionRank
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      val ledger = TopKMemoryLedger.forCurrentTask()
      if (dense) {
        val groups = TopKBuild.buildDense(iter, keyProj, ordering,
          ledger, kk)
        val entries = groups.entrySet().iterator()
        new Iterator[InternalRow] {
          private var rows: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!rows.hasNext && entries.hasNext) {
              val tree = entries.next().getValue
              entries.remove()
              val all = new java.util.ArrayList[InternalRow]()
              tree.values().forEach(g => all.addAll(g))
              rows = all.iterator()
            }
            rows.hasNext
          }
          override def next(): InternalRow = rows.next()
        }
      } else {
        val heaps = TopKBuild.buildHeaps(iter, keyProj, ordering,
          ledger, kk, tieRetaining)
        val entries = heaps.entrySet().iterator()
        new Iterator[InternalRow] {
          private var rows: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!rows.hasNext && entries.hasNext) {
              val heap = entries.next().getValue
              entries.remove()
              val all = new java.util.ArrayList[InternalRow](heap)
              rows = all.iterator()
            }
            rows.hasNext
          }
          override def next(): InternalRow = rows.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Heap bookkeeping interface: the exec talks to this, so partitions
  * evaluated outside a running task (driver-side/unit evaluation) get a
  * no-op implementation instead of an NPE on TaskContext.
  */
sealed trait HeapLedger {
  def add(row: InternalRow, extraBytes: Long): Unit
  def remove(row: InternalRow): Unit
  def close(): Unit
}

object NoOpHeapLedger extends HeapLedger {
  override def add(row: InternalRow, extraBytes: Long): Unit = ()
  override def remove(row: InternalRow): Unit = ()
  override def close(): Unit = ()
}

/** Execution-memory bookkeeping for TopKPerKeyExec's per-key heaps:
  * a non-spillable MemoryConsumer that acquires from the task memory
  * manager as held-row bytes grow (reconciled every `syncEvery`
  * mutations, so the hot loop pays two long adds) and frees everything
  * at task completion. `spill` returns 0 - the heaps are the
  * operator's bounded working set; registering them makes Spark's
  * memory arbitration see the pressure rather than pretending the
  * memory is free.
  */
final class TopKMemoryLedger(
    tmm: org.apache.spark.memory.TaskMemoryManager)
    extends org.apache.spark.memory.MemoryConsumer(
      tmm, tmm.pageSizeBytes(), org.apache.spark.memory.MemoryMode.ON_HEAP)
    with HeapLedger {

  private val syncEvery = 256
  private val perRowOverhead = 48L // PQ slot + map/object headers, approx
  private var heldBytes = 0L
  private var grantedBytes = 0L
  private var opsSinceSync = 0

  override def spill(size: Long,
                     trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L

  private def sizeOf(row: InternalRow): Long = (row match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
      u.getSizeInBytes.toLong
    case _ => 64L
  }) + perRowOverhead

  override def add(row: InternalRow, extraBytes: Long): Unit = {
    heldBytes += sizeOf(row) + extraBytes
    maybeSync()
  }

  override def remove(row: InternalRow): Unit = {
    heldBytes -= sizeOf(row)
    maybeSync()
  }

  private def maybeSync(): Unit = {
    opsSinceSync += 1
    if (opsSinceSync >= syncEvery) {
      opsSinceSync = 0
      if (heldBytes > grantedBytes)
        grantedBytes += acquireMemory(heldBytes - grantedBytes)
      else if (grantedBytes - heldBytes > (1L << 20)) {
        freeMemory(grantedBytes - heldBytes)
        grantedBytes = heldBytes
      }
    }
  }

  override def close(): Unit = {
    if (grantedBytes > 0) freeMemory(grantedBytes)
    grantedBytes = 0
    heldBytes = 0
  }
}

object TopKMemoryLedger {

  /** Estimated bytes for one key's empty heap structure: the PQ's
    * backing array (k+1 object slots), the PQ object itself, and the
    * HashMap entry - so high-key-cardinality partitions register their
    * per-key overhead in BYTES, not a symbolic constant.
    */
  def perKeyOverheadBytes(k: Int): Long = (k + 1) * 8L + 48L + 48L

  /** Ledger bound to the running task (freed on task completion); a
    * no-op ledger outside a task (e.g. driver-side unit evaluation).
    */
  def forCurrentTask(): HeapLedger = {
    val ctx = org.apache.spark.TaskContext.get()
    if (ctx == null) NoOpHeapLedger
    else {
      val ledger = new TopKMemoryLedger(
        org.apache.spark.GraftTaskBridge.taskMemoryManager(ctx))
      ctx.addTaskCompletionListener[Unit](_ => ledger.close())
      ledger
    }
  }
}

/** Planner strategy mapping the logical node to the exec. */
case class TopKPerKeyStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, rankAttr, semantics) =>
      // partial below the (EnsureRequirements-inserted) exchange: the
      // shuffle ships per-partition survivors, not every row of a key
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPartialExec(keys, order, k, planLater(child), semantics),
        semantics) :: Nil
    case _ => Nil
  }
}
