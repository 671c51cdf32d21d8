package graft.core

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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

  /** `df` plus an EXCLUSIVE running sum of `valueCol` (a non-null
    * LongType column) under the total order `order`: for each row, the
    * sum of `valueCol` over all strictly order-earlier rows. Also
    * returns the grand total (free from the size pass). Same
    * construction as `withRank` with the per-partition COUNT replaced
    * by a per-partition SUM - the global-cumsum shape
    * (`Window.orderBy(...).rowsBetween(unbounded, -1)`) without the
    * one-task window funnel.
    */
  def withPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
                    sumCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val inSchema = sorted.schema
    val vIdx = inSchema.fieldIndex(valueCol)
    require(inSchema(vIdx).dataType == LongType,
      s"$valueCol must be LongType, got ${inSchema(vIdx).dataType}")
    val outSchema = StructType(
      inSchema.fields :+ StructField(sumCol, LongType, nullable = false))
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd.mapPartitions { it =>
      var s = 0L
      while (it.hasNext) { s += it.next().getLong(vIdx) }
      Iterator.single(s)
    }.collect()
    val offsets = sums.scanLeft(0L)(_ + _)
    val total = offsets.last
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      var acc = offsets(pi)
      it.map[InternalRow] { ir =>
        val v = ir.getLong(vIdx)
        // copy: unsafe-row iterators reuse the backing buffer
        val vals = ir.copy().toSeq(inSchema).toArray[Any]
        val row = new GenericInternalRow(vals :+ (acc: Any)) // exclusive
        acc += v
        row
      }
    }
    (GraftBridge.ofInternalRows(spark, out, outSchema), total)
  }

  /** Multi-column variant of `withPrefixSum`: EXCLUSIVE running sums
    * of SEVERAL non-null LongType columns under ONE total order, in
    * one range shuffle + one size pass — chaining `withPrefixSum` per
    * column would re-sample, re-shuffle and re-collect per column,
    * pure scheduler overhead (the `longAxisRanks` argument). Returns
    * the augmented relation and each column's grand total.
    */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
                     valueCols: Seq[String],
                     sumCols: Seq[String]): (DataFrame, Seq[Long]) = {
    require(valueCols.nonEmpty && valueCols.length == sumCols.length,
      s"valueCols/sumCols arity mismatch: $valueCols vs $sumCols")
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val inSchema = sorted.schema
    val vIdx = valueCols.map(inSchema.fieldIndex).toArray
    vIdx.foreach(i => require(inSchema(i).dataType == LongType,
      s"${inSchema(i).name} must be LongType, got ${inSchema(i).dataType}"))
    val outSchema = StructType(inSchema.fields ++
      sumCols.map(c => StructField(c, LongType, nullable = false)))
    val k = vIdx.length
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd.mapPartitions { it =>
      val s = new Array[Long](k)
      while (it.hasNext) {
        val ir = it.next()
        var j = 0
        while (j < k) { s(j) += ir.getLong(vIdx(j)); j += 1 }
      }
      Iterator.single(s)
    }.collect()
    val offsets = sums.scanLeft(new Array[Long](k)) { (acc, p) =>
      Array.tabulate(k)(j => acc(j) + p(j))
    }
    val totals = offsets.last.toSeq
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      val acc = offsets(pi).clone()
      it.map[InternalRow] { ir =>
        // copy: unsafe-row iterators reuse the backing buffer
        val vals = ir.copy().toSeq(inSchema).toArray[Any]
        val row = new GenericInternalRow(
          vals ++ acc.map(a => (a: Any))) // exclusive
        var j = 0
        while (j < k) { acc(j) += ir.getLong(vIdx(j)); j += 1 }
        row
      }
    }
    (GraftBridge.ofInternalRows(spark, out, outSchema), totals)
  }

  /** SEVERAL global rankings of one relation in ONE range shuffle:
    * each row is tagged into `axes.length` skinny (key, axis, value)
    * rows, range-partitioned on (axis, value, key) — axis leading, so
    * every axis's rows form one contiguous ordered run — and ranked by
    * per-(partition, axis) offsets. Chaining `withRank` per axis costs
    * a RangePartitioner SAMPLING pass + a size pass + a shuffle per
    * axis (measured 3.6× wall on the RFM fixture, pure scheduler
    * overhead at dimension scale); here every axis shares one sampling
    * pass, one size pass and one shuffle of 3×n ~24-byte rows.
    *
    * `axes` must be non-null integral columns; `key` a unique
    * long tie-break. Returns (one row per input key with a LongType
    * 1-based rank column per axis; the row count; each axis's MAX
    * value — free from the size pass, so callers needing "latest
    * overall" never run a separate aggregation job).
    */
  def longAxisRanks(df: DataFrame, key: String, axes: Seq[String],
                    rankCols: Seq[String])
      : (DataFrame, Long, Seq[Long]) = {
    require(axes.nonEmpty && axes.length == rankCols.length)
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val nAxes = axes.length
    val tagged = df.select(col(key).cast(LongType).as("k"),
      posexplode(array(axes.map(a => col(a).cast(LongType)): _*))
        .as(Seq("axis", "v")))
    val order = Seq(col("axis").asc, col("v").asc, col("k").asc)
    val sorted = tagged
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val rdd = sorted.queryExecution.toRdd
    // one pass: per-(partition, axis) row counts + per-axis max value
    // (row layout after the projection above: k LONG, axis INT, v LONG)
    val stats = rdd.mapPartitions { it =>
      val counts = new Array[Long](nAxes)
      val maxs = Array.fill(nAxes)(Long.MinValue)
      while (it.hasNext) {
        val r = it.next()
        val a = r.getInt(1)
        counts(a) += 1L
        val v = r.getLong(2)
        if (v > maxs(a)) maxs(a) = v
      }
      Iterator.single((counts, maxs))
    }.collect()
    val n = stats.map(_._1(0)).sum
    val maxs = (0 until nAxes).map { a =>
      stats.map(_._2(a)).foldLeft(Long.MinValue)(math.max)
    }
    // offsets(pi)(a) = rows of axis a in range-earlier partitions
    val offsets = stats.map(_._1).scanLeft(new Array[Long](nAxes)) {
      (acc, c) => Array.tabulate(nAxes)(a => acc(a) + c(a))
    }
    val outSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("axis", IntegerType, nullable = false),
      StructField("rk", LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      val idx = offsets(pi).clone()
      it.map[InternalRow] { r =>
        val a = r.getInt(1)
        idx(a) += 1L
        new GenericInternalRow(Array[Any](r.getLong(0), a, idx(a)))
      }
    }
    val ranks = GraftBridge.ofInternalRows(spark, out, outSchema)
    val pivoted = ranks.groupBy(col("k").as(key))
      .agg(max(when(col("axis") === 0, col("rk"))).as(rankCols.head),
        rankCols.tail.zipWithIndex.map { case (rc, i) =>
          max(when(col("axis") === (i + 1), col("rk"))).as(rc)
        }: _*)
    (pivoted, n, maxs)
  }
}
