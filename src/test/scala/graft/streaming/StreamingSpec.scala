package graft.streaming

import graft.SparkSpec
import graft.core.{Caches, Config, CountK, LastN, Transform}
import graft.functions.LastNAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream/batch parity: the declarative cache aggregations produce the
  * same state whether driven by the batch reader or by Structured
  * Streaming micro-batches (incl. across multiple AddData batches via
  * MemoryStream, ≙ events trickling through the reference's queue).
  */
case class Ev(event_id: Long, ts: Long, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {

  private def mkEv(id: Long, t: Long, u: Long, p: String, k: Long) =
    Ev(id, t * 1000, u, p, 1.0, s"""{"k": $k}""")

  test("streaming count cache == batch count cache (multi-batch)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    val batch1 = Seq(mkEv(0, 10, 1, "purchase", 7), mkEv(1, 20, 1, "error", 7))
    val batch2 = Seq(mkEv(2, 30, 1, "purchase", 7), mkEv(3, 40, 2, "purchase", 8))
    val xf = Transform(Transform.extractFrom(mem.toDF()))
      .filter(col("cache").isin(Config.cachesOf(CountK): _*))
      .groupBy(col("cache"), col("k").as("s"), col("a"), col("v").as("o"))
      .agg(count(lit(1)).as("cnt"), max(col("t")).as("last_t"))
    val q = xf.writeStream.format("memory").queryName("cnt_parity")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cnt_parity").collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)),
        (r.getLong(4), r.getLong(5)))).toMap
    val batch = Caches.countState(
      Transform(Transform.extractFrom((batch1 ++ batch2).toDF())))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)),
        (r.getLong(4), r.getLong(5)))).toMap
    assert(streamed == batch)
    // mkEv times are ns; tuple time is µs → t=30 (ns 30000 DIV 1000)
    assert(streamed(("interactions-user-obj", 1L, "buy", 7L)) == (2L, 30L))
  }

  test("streaming last-N state == batch last-N (ring buffer semantics)") {
    val r = StreamSum.streamLastnState(spark, sfDir)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    val b = Caches.lastnState(Transform.transformed(spark, sfDir))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    assert(r == b)
  }

  test("foreachBatch publishes count state through a CacheSink") {
    val sink = new graft.sinks.ParquetCacheSink(
      java.nio.file.Files.createTempDirectory("graft_stream_sink").toString)
    StreamSum.streamCountsToSink(spark, sfDir, sink, "interactions")
    val snap = sink.get(spark, "interactions")
    val batch = Caches.countState(Transform.transformed(spark, sfDir))
    assert(snap.count() == batch.count())
  }

  test("ringPut keeps N most recent by (t, seq)") {
    val buf = (1L to 30L).foldLeft(Seq.empty[(Long, Long, Long)]) {
      (b, i) => StreamSum.ringPut(b, (i % 7, i, i * 10), 5)
    }
    assert(buf.length == 5)
    assert(buf == buf.sortBy(r => (-r._1, -r._2)))
  }

  test("typed LastNAgg matches relational lastnState ordering") {
    val s = spark; import s.implicits._
    val rows = Seq((5L, 1L, 50L), (9L, 2L, 90L), (1L, 3L, 10L),
      (9L, 4L, 91L), (7L, 5L, 70L))
    val agg = rows.toDS().groupByKey(_ => 0)
      .agg(LastNAgg(3).toColumn).collect().head._2
    assert(agg == Seq((9L, 4L, 91L), (9L, 2L, 90L), (7L, 5L, 70L)))
  }
}
