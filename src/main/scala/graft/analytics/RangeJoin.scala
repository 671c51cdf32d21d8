package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-range count: for every event, how many events (any user) land
  * inside the following 60-second window. The inequality-only join
  * `b.t > a.t AND b.t <= a.t + delta` has no equi-key, so Spark's only
  * direct plan is a BroadcastNestedLoopJoin - O(n*m) comparisons and a
  * broadcast of a corpus-sized side, both disqualifying at 100 TB.
  * The classic banding rewrite (bucket time, 2-way probe fan, hash
  * join + residual) fixes the COMPARISON count but still materializes
  * every qualifying PAIR into the count agg - quadratic in row density
  * at a fixed time span, the r15-flagged q_range_join anchor slope.
  *
  * Because the aggregate per event is a pure COUNT over a time
  * interval, it needs no pairs at all: collapse to distinct-time
  * counts and read both interval endpoints off one global cumulative
  * count (see `fromEvents`). Output volume is distinct-times-sized,
  * the shuffles are one groupBy + one range partition - the sorted-
  * merge shape an asof join uses, with skew handled by the range
  * partitioner's sampling, not a hot time-bucket key.
  */
object RangeJoin {

  /** Window width in microseconds (60 s). */
  val deltaUs: Long = 60000000L

  /** The counting core over any (event_id, t) relation: per-event
    * count of events landing in `(t, t + delta]`, zero-match rows
    * restored.
    *
    * Prefix-difference formulation: n_next(t) = F(t + delta) − F(t)
    * with F(x) = #events at time ≤ x. The banded equi-join this
    * replaces was already hash-joinable, but its OUTPUT volume is the
    * qualifying pair count itself — quadratic in row density at a
    * fixed time span (10× the events in the same wall-clock interval
    * = ~100× the pairs shuffled into the count agg). Here the corpus
    * collapses to the DISTINCT-time value-count relation, every
    * anchor time and every query point (t + delta) ride ONE tagged
    * range-shuffle exclusive prefix sum (`GlobalRank.withPrefixSum` —
    * the merge-two-sorted-streams step of an asof join), and no pair
    * ever materializes. (v, kind) is a total order: times are
    * distinct post-groupBy, t ↦ t + delta is injective, and an anchor
    * colliding with a query point is split by kind — anchors first,
    * so a query at v sums every anchor ≤ v, which is exactly F's ≤.
    */
  def fromEvents(e: DataFrame, delta: Long): DataFrame = {
    val vc = e.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tagged = vc.select(explode(expr(
        s"""array(
           |  named_struct('v', t, 'kind', 0, 'cc', c,
           |               'qt', CAST(NULL AS BIGINT)),
           |  named_struct('v', t + ${delta}L, 'kind', 1,
           |               'cc', CAST(0 AS BIGINT), 'qt', t))"""
          .stripMargin)).as("r"))
      .select(col("r.v").as("v"), col("r.kind").as("kind"),
        col("r.cc").as("cc"), col("r.qt").as("qt"))
    val (pf, _) = graft.core.GlobalRank.withPrefixSum(
      tagged, Seq(col("v").asc, col("kind").asc), "cc", "lo")
    // query rows: exclusive prefix = anchors with v' < t+delta plus
    // anchors AT t+delta (kind 0 sorts first) = F(t + delta)
    val fHi = pf.filter(col("kind") === 1)
      .select(col("qt").as("t"), col("lo").as("f_hi"))
    // anchor rows: exclusive prefix + own count = F(t)
    val fLo = pf.filter(col("kind") === 0)
      .select(col("v").as("t"), (col("lo") + col("cc")).as("f_lo"))
    val nn = fHi.join(fLo, "t")
      .select(col("t"), (col("f_hi") - col("f_lo")).as("nn"))
    e.join(nn, Seq("t"))
      .select(col("event_id"), col("t"), col("nn").as("n_next"))
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // events.parquet is TIMESTAMP(NANOS) read as epoch-ns BIGINT;
    // canonical tuple time is epoch-micros (graft_ts_us, encoding-adaptive)
    val e = Graft.tableParallel(spark, sfDir, "events")
      .select(col("event_id"), expr("graft_ts_us(ts)").as("t"))
    fromEvents(e, deltaUs).orderBy(col("event_id"))
  }

  val sql: String =
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS t FROM events
       |), c AS (
       |  SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_next
       |  FROM e a JOIN e b ON b.t > a.t AND b.t <= a.t + $deltaUs
       |  GROUP BY a.event_id
       |)
       |SELECT e.event_id, e.t, COALESCE(c.n_next, 0) AS n_next
       |FROM e LEFT JOIN c USING (event_id)
       |ORDER BY e.event_id""".stripMargin
}
