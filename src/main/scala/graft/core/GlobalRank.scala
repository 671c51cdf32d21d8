package graft.core

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global total-order rank without the global-window scale-killer.
  *
  * `Window.orderBy(...)` with no partitionBy funnels the entire
  * relation through ONE task; this computes the identical 1-based rank
  * with the sort spread across all partitions: range-partition on the
  * full (unique) order key, sort within partitions, then offset each
  * partition-local index by the cumulative size of earlier
  * (range-ordered) partitions. The size pass and the data pass share
  * one RDD lineage, so the partitioning the offsets were computed from
  * is exactly the partitioning the rows carry (unlike a self-join on
  * `spark_partition_id()`, where the two sides may re-sample different
  * range bounds). Same construction as the count-query sort variants
  * (`CountQueries.rankedPairGlobally`), generalized to any relation —
  * rows stay in the Tungsten representation end to end
  * (`queryExecution.toRdd` in, `GraftBridge.ofInternalRows` out).
  *
  * The per-partition size pass `.collect()` is bounded by the partition
  * COUNT (one long each), not the data; it eagerly materializes the
  * range shuffle, which the later data pass then reuses (same shuffle
  * dependency object).
  */
object GlobalRank {

  /** `df` plus a `LongType` 1-based rank column under `order` (which
    * must be a TOTAL order — add a unique tie-break key), and the total
    * row count (free from the size pass — callers needing `n` for rank
    * math avoid a second aggregation job).
    */
  def withRank(df: DataFrame, order: Seq[Column],
               rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val inSchema = sorted.schema
    val outSchema = StructType(
      inSchema.fields :+ StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.queryExecution.toRdd
    // Long accumulation: Iterator.size returns Int, which would wrap on
    // a >2^31-row range partition and silently corrupt every rank
    val counts = rdd.mapPartitions { it =>
      var c = 0L
      while (it.hasNext) { it.next(); c += 1L }
      Iterator.single(c)
    }.collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      var idx = offsets(pi)
      it.map[InternalRow] { ir =>
        // copy: unsafe-row iterators reuse the backing buffer
        val vals = ir.copy().toSeq(inSchema).toArray[Any]
        idx += 1
        new GenericInternalRow(vals :+ (idx: Any))
      }
    }
    (GraftBridge.ofInternalRows(spark, out, outSchema), n)
  }
}
