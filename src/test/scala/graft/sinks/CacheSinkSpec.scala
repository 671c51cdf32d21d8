package graft.sinks

import graft.SparkSpec
import graft.core.{Caches, Transform}

/** CacheServer-analog round trips: publish cache state, read it back. */
class CacheSinkSpec extends SparkSpec {

  test("memory sink round-trips cache state") {
    val sink = new MemoryCacheSink
    val st = Caches.assocState(Transform.transformed(spark, sfDir))
    sink.put("assoc", st)
    val back = sink.get(spark, "assoc")
    assert(back.count() == st.count())
    assert(back.columns.toSeq == st.columns.toSeq)
  }

  test("reset drops published state (reset-caches! semantics)") {
    val sink = new MemoryCacheSink
    sink.put("tmp", Caches.keycountState(Transform.transformed(spark, sfDir)))
    assert(sink.get(spark, "tmp").count() > 0)
    sink.reset(spark, "tmp")
    intercept[org.apache.spark.sql.AnalysisException] {
      sink.get(spark, "tmp").count()
    }
  }

  test("parquet sink round-trips cache state durably") {
    val sink = new ParquetCacheSink(
      java.nio.file.Files.createTempDirectory("graft_sink").toString)
    val st = Caches.countState(Transform.transformed(spark, sfDir))
    sink.put("counts", st)
    val back = sink.get(spark, "counts")
    assert(back.count() == st.count())
    // parquet round-trip widens nullability; names/types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      st.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
