package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resample semantics on a planted gap: the spine covers every bucket
  * in the key's span, gaps carry the last observation forward, and
  * nothing is invented outside the span.
  */
class TimeSeriesSpec extends SparkSpec {

  test("resample: gaps generated, last observation carried forward") {
    val s = spark; import s.implicits._
    val bUs = TimeSeries.resampleBucketUs
    // user 1: events in buckets 0 and 3 (gap at 1, 2); user 2: one
    // event only (span of one bucket, no gaps)
    val ev = Seq(
      (10L, 0L * bUs * 1000L, 1L),
      (11L, (0L * bUs + 5L) * 1000L, 1L),
      (12L, 3L * bUs * 1000L, 1L),
      (20L, 7L * bUs * 1000L, 2L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rs").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.qResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 7L)), s"spine must cover exactly each key's span: ${rows.keySet}")
    assert(rows((1L, 0L)) == ((2L, 11L, false)))
    assert(rows((1L, 1L)) == ((0L, 11L, true)),
      "gap bucket must carry the last observed event id forward")
    assert(rows((1L, 2L)) == ((0L, 11L, true)))
    assert(rows((1L, 3L)) == ((1L, 12L, false)))
    assert(rows((2L, 7L)) == ((1L, 20L, false)))
  }
}
