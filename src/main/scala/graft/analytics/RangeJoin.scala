package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded time-range join: for every event, how many events (any user)
  * land inside the following 60-second window. The inequality-only join
  * `b.t > a.t AND b.t <= a.t + delta` has no equi-key, so Spark's only
  * direct plan is a BroadcastNestedLoopJoin - O(n*m) comparisons and a
  * broadcast of a corpus-sized side, both disqualifying at 100 TB.
  *
  * The scale shape is the standard banding rewrite: quantize time into
  * delta-width buckets, emit each probe row into its bucket AND the
  * next one (a window of width delta can only overlap two consecutive
  * buckets; the build side keeps its single home bucket, so each
  * qualifying pair meets exactly once - no post-join dedup), equi-join
  * on the bucket id, then apply the exact range predicate as the join
  * residual. Cost: 2x row duplication on one side buys a hash join
  * that shuffles each side once on bucket id. Time-skewed data (load
  * spikes) concentrates rows in few buckets - the standard fix is
  * salting hot buckets or AQE skew-join, same as any keyed shuffle.
  *
  * Zero-match events are restored with a left join against the event
  * relation itself, which reuses the already-hash-partitioned count
  * output rather than re-scanning.
  */
object RangeJoin {

  /** Window width in microseconds (60 s). */
  val deltaUs: Long = 60000000L

  /** The banding core over any (event_id, t) relation: per-event count
    * of events landing in `(t, t + delta]`, zero-match rows restored.
    */
  def fromEvents(e: DataFrame, delta: Long): DataFrame = {
    val build = e.select(col("event_id").as("b_id"), col("t").as("bt"))
      .withColumn("bkt", expr(s"bt DIV ${delta}L"))
    val probe = e
      .withColumn("bkt0", expr(s"t DIV ${delta}L"))
      .select(col("event_id"), col("t"),
        explode(array(col("bkt0"), col("bkt0") + 1)).as("bkt"))
    val counts = probe.join(build,
        probe("bkt") === build("bkt") &&
          col("bt") > col("t") && col("bt") <= col("t") + delta)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_next"))
    e.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("t"),
        coalesce(col("n_next"), lit(0L)).as("n_next"))
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
