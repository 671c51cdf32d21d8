package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid, generating the missing buckets and carrying
  * the last observation forward - the standard preprocessing step
  * (next to sessionize and as-of) that turns event logs into
  * fixed-step series for windowed features or training sequences.
  *
  * 100 TB shape: one (key, bucket) keyed aggregation with map-side
  * combine; the spine explode is narrow OUT of the per-key span
  * aggregate (fan bounded by the key's bucket span, never raw events);
  * the gap left-join and the forward-fill window both key on the same
  * (user) partitioning. Metrics are integers (counts + max event id),
  * so the fill is bitwise cross-engine with no float-order pinning.
  */
object TimeSeries {

  /** 4 h buckets - the same grid as the z-order layout's time dim. */
  val resampleBucketUs: Long = graft.pipeline.Layout.tBucketUs

  /** The per-(key, bucket) observation state the fill runs over -
    * maintained by a plain aggregation in batch and by a streaming
    * aggregation (bounded state: keys x buckets) in the stream face.
    */
  private[graft] def resampleBase(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        expr(s"(ts DIV 1000L) DIV ${resampleBucketUs}L").as("tb"),
        col("event_id"))
      .groupBy(col("user_id"), col("tb"))
      .agg(count(lit(1)).as("n_events"),
        max(col("event_id")).as("last_eid"))

  /** Spine generation + forward fill over the observation state -
    * shared verbatim by both faces, so they cannot drift.
    */
  private[graft] def resampleFill(base: DataFrame): DataFrame = {
    // per-key spine: every bucket between the key's first and last
    val spine = base.groupBy(col("user_id"))
      .agg(min(col("tb")).as("lo"), max(col("tb")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("tb"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(base, Seq("user_id", "tb"), "left")
      .select(col("user_id"), col("tb"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_eid"), ignoreNulls = true).over(wFill)
          .as("last_event_id"))
      .withColumn("is_gap", col("n_events") === 0L)
      .orderBy(col("user_id"), col("tb"))
  }

  def qResample(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    resampleFill(resampleBase(
      Graft.tableParallel(spark, sfDir, "events")))
  }

  // ---- q_resample_interp: linear interpolation between observations --

  /** Observation state for the interpolating variant: per (key,
    * bucket) the count plus the bucket's LAST observed value (by
    * event_id - unique, so the anchor is deterministic) in exact
    * integer micro-units. Same single map-side-combinable aggregation
    * shape as `resampleBase`.
    */
  private[graft] def resampleInterpBase(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"),
        expr(s"(ts DIV 1000L) DIV ${resampleBucketUs}L").as("tb"),
        col("event_id"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v_mu"))
      .groupBy(col("user_id"), col("tb"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("event_id"), col("v_mu"))).as("m"))
      .select(col("user_id"), col("tb"), col("n_events"),
        col("m").getField("v_mu").as("v_mu"))

  /** Gap filling by LINEAR interpolation between the surrounding
    * observations (vs `resampleFill`'s carry-forward): the spine
    * bounds [lo, hi] are observed buckets, so every gap has both
    * neighbors. All arithmetic below the single final division is
    * exact BIGINT rational micro-units - numerator
    * prev*(next_tb-tb) + next*(tb-prev_tb), denominator
    * (next_tb-prev_tb)*1e6 - so both engines divide the same two
    * integers and land bit-identically, the same exactness scheme as
    * the trained-centroid means. Window shape matches the LOCF face:
    * two frames on the SAME (user) partitioning, no extra shuffle.
    */
  private[graft] def resampleInterpFill(base: DataFrame): DataFrame = {
    val spine = base.groupBy(col("user_id"))
      .agg(min(col("tb")).as("lo"), max(col("tb")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("tb"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTb = when(col("v_mu").isNotNull, col("tb"))
    spine.join(base, Seq("user_id", "tb"), "left")
      .withColumn("prev_mu", last(col("v_mu"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_tb", last(obsTb, ignoreNulls = true).over(wPrev))
      .withColumn("next_mu", first(col("v_mu"), ignoreNulls = true).over(wNext))
      .withColumn("next_tb", first(obsTb, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("tb"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v_mu").isNotNull,
          col("v_mu").cast("double") / lit(1000000.0))
          .otherwise(
            (col("prev_mu") * (col("next_tb") - col("tb")) +
              col("next_mu") * (col("tb") - col("prev_tb"))).cast("double") /
              ((col("next_tb") - col("prev_tb")).cast("double") *
                lit(1000000.0)))
          .as("value"),
        coalesce(col("n_events"), lit(0L)).===(0L).as("is_gap"))
      .orderBy(col("user_id"), col("tb"))
  }

  def qResampleInterp(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    resampleInterpFill(resampleInterpBase(
      Graft.tableParallel(spark, sfDir, "events")))
  }

  val qResampleInterpSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $resampleBucketUs AS tb,
       |         event_id,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), base AS (
       |  SELECT user_id, tb, count(*) AS n_events,
       |         max_by(v_mu, event_id) AS v_mu
       |  FROM e GROUP BY 1, 2
       |), span AS (
       |  SELECT user_id, min(tb) AS lo, max(tb) AS hi
       |  FROM base GROUP BY 1
       |), spine AS (
       |  SELECT user_id, unnest(range(lo, hi + 1)) AS tb FROM span
       |), j AS (
       |  SELECT s.user_id, s.tb,
       |         COALESCE(b.n_events, 0) AS n_events, b.v_mu
       |  FROM spine s LEFT JOIN base b USING (user_id, tb)
       |), f AS (
       |  SELECT user_id, tb, n_events, v_mu,
       |    last_value(v_mu IGNORE NULLS) OVER wp AS prev_mu,
       |    last_value(CASE WHEN v_mu IS NOT NULL THEN tb END
       |               IGNORE NULLS) OVER wp AS prev_tb,
       |    first_value(v_mu IGNORE NULLS) OVER wn AS next_mu,
       |    first_value(CASE WHEN v_mu IS NOT NULL THEN tb END
       |                IGNORE NULLS) OVER wn AS next_tb
       |  FROM j
       |  WINDOW wp AS (PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  wn AS (PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT user_id, tb, CAST(n_events AS BIGINT) AS n_events,
       |  CASE WHEN v_mu IS NOT NULL
       |       THEN CAST(v_mu AS DOUBLE) / 1000000.0
       |       ELSE CAST(prev_mu * (next_tb - tb)
       |                 + next_mu * (tb - prev_tb) AS DOUBLE)
       |            / (CAST(next_tb - prev_tb AS DOUBLE) * 1000000.0)
       |  END AS value,
       |  (n_events = 0) AS is_gap
       |FROM f ORDER BY user_id, tb""".stripMargin

  val qResampleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) // $resampleBucketUs AS tb,
       |         event_id
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), base AS (
       |  SELECT user_id, tb, count(*) AS n_events,
       |         max(event_id) AS last_eid
       |  FROM e GROUP BY 1, 2
       |), span AS (
       |  SELECT user_id, min(tb) AS lo, max(tb) AS hi
       |  FROM base GROUP BY 1
       |), spine AS (
       |  SELECT user_id, unnest(range(lo, hi + 1)) AS tb FROM span
       |), j AS (
       |  SELECT s.user_id, s.tb,
       |         COALESCE(b.n_events, 0) AS n_events, b.last_eid
       |  FROM spine s LEFT JOIN base b USING (user_id, tb)
       |)
       |SELECT user_id, tb, CAST(n_events AS BIGINT) AS n_events,
       |  last_value(last_eid IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS last_event_id,
       |  (n_events = 0) AS is_gap
       |FROM j ORDER BY user_id, tb""".stripMargin
}
