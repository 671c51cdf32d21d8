package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join - for each left row, the latest right row with
  * right.time <= left.time on the same key. Spark has no built-in; the
  * naive formulation (theta-join on key + time range, then argmax)
  * explodes to O(|L|·|R|) per key. This implementation is the scalable
  * union+window single pass:
  *
  *   1. tag left/right rows and union them (narrow);
  *   2. one shuffle on the key, in-partition sort by (time, side)
  *      with right-before-left at equal times (<= semantics);
  *   3. last_value(right attrs, ignoreNulls) over the running frame
  *      carries the most recent right row forward;
  *   4. keep the left rows.
  *
  * One keyed shuffle total, state = one carried row - the same plan
  * shape at any scale. Right side is pre-deduplicated to one row per
  * (key, time) (max value wins) so the result is deterministic, which
  * also matches DuckDB's native ASOF JOIN used as the oracle.
  */
object AsofJoin {

  /** events ⟕ asof latest order of the same customer (user_id ≙
    * o_custkey) with o_orderdate <= event time.
    */
  def qAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val right = Graft.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("rt"),
        col("o_orderkey"))
      .groupBy(col("k"), col("rt"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("k"), col("rt"), col("o_orderkey"),
        lit(0).as("side"), lit(null).cast("bigint").as("event_id"))
    val left = Graft.table(spark, sfDir, "events")
      .select(col("user_id").as("k"),
        expr("graft_ts_us(ts)").as("rt"),
        lit(null).cast("bigint").as("o_orderkey"),
        lit(1).as("side"), col("event_id"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("rt"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.unionAll(left)
      .withColumn("matched_order",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("matched_rt",
        last(when(col("side") === 0, col("rt")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("rt").as("t"),
        col("matched_order"), col("matched_rt"))
      .orderBy(col("event_id"))
  }

  /** DuckDB's native ASOF JOIN - an independent implementation of the
    * same semantics, which is exactly what an oracle should be.
    */
  val qAsofSql: String =
    """WITH r AS (
      |  SELECT o_custkey AS k, epoch_us(o_orderdate) AS rt,
      |         max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2
      |), l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t FROM events
      |)
      |SELECT l.event_id, l.user_id, l.t,
      |       r.o_orderkey AS matched_order, r.rt AS matched_rt
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.k AND l.t >= r.rt
      |ORDER BY l.event_id""".stripMargin
}
