package graft.sources

import graft.SparkSpec
import graft.core.{Caches, Transform}
import org.apache.spark.sql.functions._

/** Format independence: the same events round-tripped through JSON and
  * CSV produce byte-identical cache states - the pipeline only sees the
  * event schema, never the source format (≙ Extract over arbitrary
  * object types in the reference).
  */
class EventSourceSpec extends SparkSpec {

  test("json and csv sources produce the same cache state as parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src").toString
    val events = EventSource.parquet(spark, s"$sfDir/events.parquet")
    events.write.mode("overwrite")
      .option("timestampNTZFormat", EventSource.tsNtzFormat)
      .json(s"$tmp/events_json")
    events.write.mode("overwrite").option("header", "true")
      .option("timestampNTZFormat", EventSource.tsNtzFormat)
      .csv(s"$tmp/events_csv")
    events.write.mode("overwrite").orc(s"$tmp/events_orc")

    def state(df: org.apache.spark.sql.DataFrame): Set[String] =
      Caches.countState(Transform(Transform.extractFrom(df)))
        .select(concat_ws("|", col("cache"), col("s"), col("a"), col("o"),
          col("cnt"), col("last_t")))
        .collect().map(_.getString(0)).toSet

    val fromParquet = state(events)
    assert(fromParquet.nonEmpty)
    assert(state(EventSource.json(spark, s"$tmp/events_json")) == fromParquet)
    assert(state(EventSource.csv(spark, s"$tmp/events_csv")) == fromParquet)
    assert(state(EventSource.orc(spark, s"$tmp/events_orc")) == fromParquet)
    // ORC scans must keep the pushdown story parquet has: the filter
    // and the pruned column set reach the file scan
    val plan = EventSource.orc(spark, s"$tmp/events_orc")
      .filter(col("user_id") === 7L).select("event_type")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"),
      s"ORC scan lost filter pushdown:\n$plan")
  }
}
