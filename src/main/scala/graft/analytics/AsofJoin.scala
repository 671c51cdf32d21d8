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

  // ---- q_attribution: as-of with a staleness tolerance ---------------

  /** Last-touch lookback window: a view older than this cannot be
    * credited for a purchase.
    */
  val attributionLookbackUs: Long = 3600L * 1000000L // 1 hour

  /** Last-touch attribution - each purchase credited to the SAME
    * user's latest view at-or-before it, but only within the lookback
    * window (an as-of join with a tolerance: the standard guard
    * against crediting stale touchpoints, and the backward-looking
    * complement of the forward purchase→error interval join).
    * Same union+window single pass as `qAsof` - the tolerance is a
    * row-local predicate on the carried match, so the plan shape (one
    * keyed shuffle, one sort, O(1) carried state) is unchanged; a
    * too-stale match nulls out rather than falling back to an even
    * older view, which is exactly the ASOF-then-filter semantics
    * DuckDB's native operator + CASE reproduces independently.
    */
  def qAttribution(spark: SparkSession, sfDir: String): DataFrame =
    attributionFrom(Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id").as("k"), expr("graft_ts_us(ts)").as("rt"),
        col("event_id"), col("event_type")))

  /** Core over any (k, rt µs, event_id, event_type) relation. */
  private[graft] def attributionFrom(ev: DataFrame): DataFrame = {
    // ONE events scan: views and purchases ride the same relation with
    // a side tag (no per-side branch, no view-dedup aggregate - the
    // (rt, side, event_id) window order already makes last-view-wins
    // deterministic: among same-instant views the greatest event_id is
    // carried, exactly the max_by the oracle's dedup computes)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("rt"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin("view", "purchase"))
      .select(col("k"), col("rt"), col("event_id"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
      .withColumn("cand_view",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("cand_rt",
        last(when(col("side") === 0, col("rt")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("fresh",
        col("cand_rt").isNotNull &&
          col("rt") - col("cand_rt") <= attributionLookbackUs)
      .select(col("event_id"), col("k").as("user_id"), col("rt").as("t"),
        when(col("fresh"), col("cand_view")).as("attributed_view"),
        when(col("fresh"), col("cand_rt")).as("view_t"),
        col("fresh").as("attributed"))
      .orderBy(col("event_id"))
  }

  val qAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id AS k, epoch_us(ts) AS rt, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), v AS (
       |  SELECT k, rt, max(event_id) AS view_id
       |  FROM e WHERE event_type = 'view' GROUP BY 1, 2
       |), p AS (
       |  SELECT k, rt, event_id FROM e WHERE event_type = 'purchase'
       |), m AS (
       |  SELECT p.event_id, p.k, p.rt AS t, v.view_id, v.rt AS vt
       |  FROM p ASOF LEFT JOIN v ON p.k = v.k AND p.rt >= v.rt
       |)
       |SELECT event_id, k AS user_id, t,
       |  CASE WHEN vt IS NOT NULL AND t - vt <= $attributionLookbackUs
       |       THEN view_id END AS attributed_view,
       |  CASE WHEN vt IS NOT NULL AND t - vt <= $attributionLookbackUs
       |       THEN vt END AS view_t,
       |  (vt IS NOT NULL AND t - vt <= $attributionLookbackUs)
       |    AS attributed
       |FROM m ORDER BY event_id""".stripMargin
}
