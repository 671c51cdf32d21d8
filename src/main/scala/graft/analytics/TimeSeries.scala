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
