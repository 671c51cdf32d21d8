package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: where rows LIVE decides what a 100 TB scan
  * has to read. `pipe_layout_zorder` assigns every event a Morton
  * (z-order) key over (time bucket, value bucket) and a shard = the
  * key's top bits: writing the table partitioned by that shard gives
  * range queries on EITHER dimension a small candidate shard set - the
  * property no single-column sort can offer (a time-sorted layout
  * answers value-range queries by reading everything). The z-curve is
  * pure integer bit-interleaving on bucketized dimensions, identical
  * SQL in both engines, so the whole layout decision sits under the
  * bitwise oracle.
  *
  * Production use: `df.repartition(col("shard")).write.partitionBy
  * ("shard")` and prune with `shard IN (candidates(region))` - the
  * candidate enumeration for a query box is driver-side bit math over
  * at most 2^(2*zBits - shardShift) shard ids (LayoutSpec demonstrates
  * the end-to-end prune on files).
  */
object Layout {

  /** Bits per dimension (buckets = 2^zBits per dim). */
  val zBits = 8

  /** Shard = zkey >> shardShift: 2^(2*zBits - shardShift) = 64 shards. */
  val shardShift = 10

  /** 4-hour time buckets in microseconds; monotone over the synthetic
    * month of data (wraps only past 256 x 4 h ≈ 42 days - pinned by
    * the oracle, which wraps identically).
    */
  val tBucketUs = 14400000000L

  /** Value bucket width: division by 2 is an exact exponent shift in
    * IEEE double, so the bucket id has zero parity risk.
    */
  val vWidth = 2.0

  /** Value bucket, clamped to [0, 2^zBits - 1] on BOTH ends: without
    * the lower clamp a negative value yields vb < 0 whose low 8
    * two's-complement bits alias into a valid zkey (value = -1 → vb =
    * -1 → bits read as 255), landing the row in a normal shard that no
    * box read can ever reach (the residual vb predicate excludes
    * negatives). Clamping to bucket 0 keeps every row addressable -
    * out-of-range lows are findable under vbLo = 0, same as
    * out-of-range highs under the existing top clamp.
    */
  private def vbSpark(value: String): String =
    s"CAST(greatest(least(floor($value / CAST($vWidth AS DOUBLE)), " +
      s"${(1L << zBits) - 1}.0D), 0.0D) AS BIGINT)"

  private def vbDuck(value: String): String =
    s"CAST(greatest(least(floor($value / CAST($vWidth AS DOUBLE)), " +
      s"${(1L << zBits) - 1}.0), 0.0) AS BIGINT)"

  /** Bit-interleave expression over integer columns `a`, `b` - the
    * same text modulo each dialect's shift syntax (Spark: shiftleft /
    * shiftright functions; DuckDB: << / >> operators).
    */
  private def interleave(shl: (String, Int) => String,
                         shr: (String, Int) => String)
                        (a: String, b: String): String =
    (0 until zBits).map { i =>
      s"${shl(s"(${shr(a, i)} & 1)", 2 * i)} + " +
        s"${shl(s"(${shr(b, i)} & 1)", 2 * i + 1)}"
    }.mkString("(", " + ", ")")

  private val zSpark = interleave(
    (x, n) => s"shiftleft($x, $n)", (x, n) => s"shiftright($x, $n)")("tb", "vb")
  private val zDuck = interleave(
    (x, n) => s"($x << $n)", (x, n) => s"($x >> $n)")("tb", "vb")

  def zorder(spark: SparkSession, sfDir: String): DataFrame =
    zorderFrom(Graft.tableParallel(spark, sfDir, "events"))

  /** One narrow pass: bucketize, interleave, take the top bits. */
  private[graft] def zorderFrom(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"),
        expr(s"pmod(${ParityMath.fdivSql("graft_ts_us(ts)", s"${tBucketUs}L")}, ${1L << zBits})")
          .as("tb"),
        expr(vbSpark("value")).as("vb"))
      .withColumn("zkey", expr(zSpark))
      .withColumn("shard", expr(s"shiftright(zkey, $shardShift)"))
      .orderBy(col("event_id"))

  /** De-interleave a zkey back to its (tb, vb) buckets. */
  def deinterleave(z: Long): (Long, Long) = {
    var tb = 0L; var vb = 0L
    var i = 0
    while (i < zBits) {
      tb |= ((z >> (2 * i)) & 1L) << i
      vb |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (tb, vb)
  }

  /** Candidate shards for a query box - the prune procedure a reader
    * runs before touching files: walk the 2^(2*zBits) zkeys
    * (driver-side bit math, 65k iterations), keep shards whose region
    * intersects the box, and scan only `shard IN (...)` partitions.
    * Lossless by construction (LayoutSpec proves it on files).
    */
  def candidateShards(inBox: (Long, Long) => Boolean): Set[Long] =
    (0L until (1L << (2 * zBits)))
      .filter(z => inBox.tupled(deinterleave(z)))
      .map(_ >> shardShift).toSet

  /** Inclusive bucket-space query box over the two z-dimensions;
    * defaults leave a side unbounded.
    */
  final case class ZBox(tbLo: Long = 0L, tbHi: Long = (1L << zBits) - 1,
                        vbLo: Long = 0L, vbHi: Long = (1L << zBits) - 1) {
    def contains(tb: Long, vb: Long): Boolean =
      tb >= tbLo && tb <= tbHi && vb >= vbLo && vb <= vbHi
  }

  def candidateShards(box: ZBox): Set[Long] =
    candidateShards((tb, vb) => box.contains(tb, vb))

  /** The production write path: annotate each row with its (tb, vb,
    * zkey, shard) and write partitioned by shard - ALL original
    * columns ride along (unlike the oracle query, which projects the
    * key columns for comparison). Rows whose (ts, value) key is null
    * cannot be placed on the curve and land in a reserved shard -1,
    * so they are never silently dropped and never pollute a pruned
    * range read; out-of-range values clamp onto the curve's edge
    * buckets (see `vbSpark`) and stay addressable.
    *
    * 100 TB shape: one narrow keying pass + one repartition on the
    * shard id (so each output partition is written by one task, no
    * small-file explosion from 32 writers x 64 shards), then
    * directory-partitioned parquet - the layout `prunedRead` skips at
    * the FileIndex level, before any I/O.
    */
  def writeZOrdered(ev: DataFrame, dir: String): Unit =
    ev.withColumn("tb", expr(s"pmod(" +
        s"${ParityMath.fdivSql("graft_ts_us(ts)", s"${tBucketUs}L")}, " +
        s"${1L << zBits})"))
      // explicit null guard: least() SKIPS nulls, so a bare
      // least(floor(NULL), max) would silently bucket null values at
      // the top of the range instead of quarantining them
      .withColumn("vb", expr(
        s"CASE WHEN value IS NULL THEN CAST(NULL AS BIGINT) " +
          s"ELSE ${vbSpark("value")} END"))
      .withColumn("zkey", expr(zSpark))
      .withColumn("shard", coalesce(
        expr(s"shiftright(zkey, $shardShift)"), lit(-1L)))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(dir)

  /** Pruned box read over a `writeZOrdered` table: enumerate the box's
    * candidate shards on the driver (bit math, no I/O), then read with
    * a partition filter (`shard IN cands`) plus the exact residual
    * (tb, vb) predicate. Partition pruning happens in the FileIndex -
    * non-candidate directories are never listed into the scan - which
    * is the whole point of the layout at 100 TB.
    */
  def prunedRead(spark: SparkSession, dir: String, box: ZBox): DataFrame = {
    val cands = candidateShards(box)
    spark.read.parquet(dir)
      .filter(col("shard").cast("long").isin(cands.toSeq: _*))
      .filter(col("tb").between(box.tbLo, box.tbHi) &&
        col("vb").between(box.vbLo, box.vbHi))
  }

  val zorderSql: String =
    s"""WITH b AS (
       |  SELECT event_id,
       |    (((${ParityMath.fdivDuckSql("epoch_us(ts)", tBucketUs.toString)}) % ${1L << zBits})
       |     + ${1L << zBits}) % ${1L << zBits} AS tb,
       |    ${vbDuck("value")} AS vb
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
       |)
       |SELECT event_id, tb, vb, $zDuck AS zkey,
       |  ($zDuck >> $shardShift) AS shard
       |FROM b ORDER BY event_id""".stripMargin
}
