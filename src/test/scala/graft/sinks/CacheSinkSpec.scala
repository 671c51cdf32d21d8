package graft.sinks

import graft.SparkSpec
import graft.core.{Caches, Transform}
import org.apache.spark.sql.functions._

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

  test("snapshot sink: atomic publish, torn-write invisibility, retention") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_snap").toString
    val sink = new SnapshotCacheSink(root, keepVersions = 2)
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink.put("c", v1)
    assert(sink.currentVersion(spark, "c").contains(1L))
    assert(sink.get(spark, "c").count() == 2)

    // torn publish: data directory appears WITHOUT a manifest flip
    // (crash between write and commit) - readers must still see v1
    Seq((9L, "x")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$root/c/v=2")
    assert(sink.currentVersion(spark, "c").contains(1L))
    assert(sink.get(spark, "c").count() == 2, "torn publish became visible")

    // the replayed batch rewrites the orphan and commits atomically
    val v2 = Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("k", "v")
    sink.put("c", v2)
    assert(sink.currentVersion(spark, "c").contains(2L))
    assert(sink.get(spark, "c").count() == 3)

    // retention: publishing v3 keeps v2 (in-flight readers) drops v1
    sink.put("c", v1)
    assert(sink.currentVersion(spark, "c").contains(3L))
    val dirs = new java.io.File(s"$root/c").listFiles()
      .map(_.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(dirs == Seq("v=2", "v=3"), s"retention window wrong: $dirs")

    // never-published cache fails loudly, reset clears everything
    intercept[IllegalStateException] { sink.get(spark, "nope") }
    sink.reset(spark, "c")
    intercept[IllegalStateException] { sink.get(spark, "c") }
  }

  test("snapshot sink: streaming foreachBatch publishes per-batch versions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snap_stream").toString
    // directory-form default: the flagship publish goes through the
    // versioned sink without the caller constructing one
    val sink = graft.streaming.StreamSum
      .streamCountsToSink(spark, sfDir, root, "counts")
    // AvailableNow over one file = one batch; the published snapshot
    // equals the batch count state
    val batch = Caches.countState(Transform.transformed(spark, sfDir))
    assert(sink.get(spark, "counts").count() == batch.count())
    assert(sink.currentVersion(spark, "counts").exists(_ >= 1L))
  }

  test("snapshot sink: update-mode publish folds per-batch deltas into " +
       "the snapshot incrementally and replays idempotently") {
    val s = spark; import s.implicits._
    val watch = java.nio.file.Files
      .createTempDirectory("graft_upd_watch").toString
    val root = java.nio.file.Files
      .createTempDirectory("graft_upd_sink").toString
    val cp = java.nio.file.Files
      .createTempDirectory("graft_upd_cp").toString
    val ev = graft.core.Graft.table(spark, sfDir, "events")
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$watch/_t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, name))
    }
    val sink = new SnapshotCacheSink(root)
    // batch 1: even events only
    land(ev.filter(pmod(col("event_id"), lit(2)) === 0), "a1.parquet")
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    val v1 = sink.currentVersion(spark, "counts").get
    // batch 2: the odd events arrive; only CHANGED keys travel, the
    // snapshot must still equal the one-shot batch state over BOTH
    land(ev.filter(pmod(col("event_id"), lit(2)) === 1), "a2.parquet")
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    assert(sink.currentVersion(spark, "counts").get > v1)
    def key(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(concat_ws("|", col("cache"), col("s"), col("a"), col("o"),
        col("cnt"), col("last_t"))).collect().map(_.getString(0)).toSet
    val full = Caches.countState(Transform(Transform.extractFrom(
      spark.read.option("pathGlobFilter", "*.parquet").parquet(watch))))
    assert(key(sink.get(spark, "counts")) == key(full),
      "incrementally merged snapshot must equal the one-shot state")
    // replay with nothing new: a no-op catch-up leaves the state equal
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    assert(key(sink.get(spark, "counts")) == key(full))
  }

  test("snapshot sink: a reader racing publishes never sees a torn " +
       "version and observes monotone versions") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_snap_race").toString
    // retention window of 4: an in-flight reader's files survive
    // unless it falls 4 whole publishes behind within one read
    val sink = new SnapshotCacheSink(root, keepVersions = 4)
    val rows = 50
    def snap(i: Int) = Seq.fill(rows)(i).toDF("v")
    sink.put("c", snap(0))
    @volatile var stop = false
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val vals = sink.get(spark, "c").collect().map(_.getInt(0)).toSeq
          if (vals.length != rows || vals.distinct.length != 1)
            errs.add(s"torn snapshot: n=${vals.length}, " +
              s"values=${vals.distinct.sorted}")
          else seen.add(vals.head)
        } catch { case e: Throwable => errs.add(e.toString) }
      }
    })
    reader.start()
    try for (i <- 1 to 6) sink.put("c", snap(i))
    finally { stop = true; reader.join() }
    assert(errs.isEmpty, s"racing reader observed: $errs")
    assert(!seen.isEmpty, "reader must complete at least one read")
    // every read is a complete snapshot of SOME published version, and
    // the sequence of observed versions never goes backwards
    val vs = seen.toArray(Array.empty[Integer]).map(_.toInt).toSeq
    assert(vs.forall(v => v >= 0 && v <= 6))
    assert(vs == vs.sorted, s"versions must be monotone: $vs")
  }
}
