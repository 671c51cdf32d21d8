package graft.sources

import graft.SparkSpec
import graft.core.{Caches, Transform}
import org.apache.spark.sql.functions._

/** The DSv2 synthetic source: deterministic, partition-parallel, and a
  * drop-in upstream for the whole pipeline (extract quarantines its
  * malformed-props rows like any other source).
  */
class EventsGeneratorSpec extends SparkSpec {

  private def gen(rows: Long, parts: Int = 8) =
    spark.read.format("graft-events")
      .option("rows", rows.toString)
      .option("numPartitions", parts.toString)
      .load()

  test("deterministic, partition-parallel, exact schema") {
    val df = gen(10000, parts = 6)
    assert(df.schema == EventsGenerator.schema)
    assert(df.count() == 10000L)
    assert(df.rdd.getNumPartitions == 6)
    val a = df.orderBy("event_id").collect().map(_.toSeq).toSeq
    val b = gen(10000, parts = 3).orderBy("event_id").collect()
      .map(_.toSeq).toSeq
    assert(a == b, "generation must not depend on the partition layout")
  }

  test("feeds the pipeline end-to-end; malformed props quarantined") {
    val df = gen(5000)
    val tuples = Transform.extractFrom(df)
    val extracted = tuples.count()
    assert(extracted < 5000L, "expected some malformed props dropped")
    assert(extracted > 4500L)
    val st = Caches.countState(Transform(tuples))
    assert(st.count() > 0)
    // purchase events must dominate the interactions counts
    assert(st.agg(sum(col("cnt"))).collect().head.getLong(0) > 0)
  }
}
