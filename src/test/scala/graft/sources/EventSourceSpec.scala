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
    events.write.mode("overwrite").json(s"$tmp/events_json")
    events.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/events_csv")

    def state(df: org.apache.spark.sql.DataFrame): Set[String] =
      Caches.countState(Transform(Transform.extractFrom(df)))
        .select(concat_ws("|", col("cache"), col("s"), col("a"), col("o"),
          col("cnt"), col("last_t")))
        .collect().map(_.getString(0)).toSet

    val fromParquet = state(events)
    assert(fromParquet.nonEmpty)
    assert(state(EventSource.json(spark, s"$tmp/events_json")) == fromParquet)
    assert(state(EventSource.csv(spark, s"$tmp/events_csv")) == fromParquet)
  }
}
