package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard against event-time encoding drift: the SAME events stored as
  * legacy epoch-nanos BIGINT and as TIMESTAMP_NTZ(µs) must produce
  * byte-identical engine state. Round 7 lost every event-time operator
  * to exactly this - the warehouse rewrote `ts` from INT64-nanos to
  * timestamp[us] and ~20 call sites hardcoded the old physical layout.
  * `graft_ts_us` now dispatches on the scanned type; this spec pins
  * that contract for BOTH encodings so a future regeneration can't
  * silently break one of them again.
  */
class SchemaDriftSpec extends SparkSpec {

  private def writeFixtures(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_drift").toString
    val ev = Graft.table(spark, sfDir, "events").limit(2000)
    // canonical micros from whatever encoding the testdata currently has
    val us = ev.withColumn("us", expr("graft_ts_us(ts)"))
    val ntzDir = s"$base/ntz"
    val nanosDir = s"$base/nanos"
    us.withColumn("ts", expr("timestamp_micros(us)").cast("timestamp_ntz"))
      .drop("us")
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    us.withColumn("ts", expr("us * 1000L")).drop("us")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    (ntzDir, nanosDir)
  }

  private def rows(df: DataFrame): Set[String] =
    df.select(concat_ws("|", df.columns.map(col).toIndexedSeq: _*))
      .collect().map(_.getString(0)).toSet

  test("extract and sliding-sketch state are identical across ts encodings") {
    val (ntzDir, nanosDir) = writeFixtures()

    val ntzEv = spark.read.parquet(s"$ntzDir/events.parquet")
    val nanosEv = spark.read.parquet(s"$nanosDir/events.parquet")
    assert(ntzEv.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(nanosEv.schema("ts").dataType.typeName == "long")

    val extNtz = rows(Transform.extractFrom(ntzEv))
    val extNanos = rows(Transform.extractFrom(nanosEv))
    assert(extNtz.nonEmpty)
    assert(extNtz == extNanos)

    val hllNtz = rows(graft.analytics.Sketches.qHllSliding(spark, ntzDir))
    val hllNanos = rows(graft.analytics.Sketches.qHllSliding(spark, nanosDir))
    assert(hllNtz.nonEmpty)
    assert(hllNtz == hllNanos)
  }
}
