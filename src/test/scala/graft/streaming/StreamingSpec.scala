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

  test("streaming undo-count retraction == batch undo semantics (multi-batch)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // (1,7): two increments in batch 1, two retractions + an increment
    // in batch 2 → 1. (2,8): retraction BEFORE any increment is a nil
    // no-op (key invisible until batch 2's purchase). (3,9): click,
    // click, purchase → floor-at-each-step gives 1 where a clamped net
    // sum (max(0, -1)) would give 0 - the discriminating case.
    val batch1 = Seq(mkEv(0, 10, 1, "purchase", 7), mkEv(1, 20, 1, "purchase", 7),
      mkEv(2, 30, 2, "click", 8), mkEv(3, 40, 3, "click", 9),
      mkEv(4, 50, 3, "click", 9))
    val batch2 = Seq(mkEv(5, 60, 1, "click", 7), mkEv(6, 70, 1, "click", 7),
      mkEv(7, 80, 1, "purchase", 7), mkEv(8, 90, 2, "purchase", 8),
      mkEv(9, 100, 3, "purchase", 9))
    val out = StreamSum.undoCountStream(Transform.extractFrom(mem.toDF()))
    val q = out.toDF().writeStream.format("memory").queryName("undo_parity")
      .outputMode(OutputMode.Update()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // latest snapshot per key = the emission with the highest op count
    val streamed = spark.table("undo_parity").collect()
      .groupBy(r => (r.getLong(0), r.getLong(2)))
      .map { case (k, rs) =>
        val m = rs.maxBy(_.getLong(5)); k -> (m.getLong(3), m.getLong(4)) }
    val batch = Caches.undoCountState(
        Transform.extractFrom((batch1 ++ batch2).toDF()))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), (r.getLong(3), r.getLong(4))))
      .toMap
    assert(streamed == batch)
    assert(streamed((1L, 7L))._1 == 1L)
    assert(streamed((3L, 9L))._1 == 1L,
      "floor-at-each-step, not clamped net sum")
    assert(streamed((2L, 8L)) == (1L, 90L),
      "pre-increment retraction is a nil no-op")
  }

  test("streaming undo-lastn == batch fold incl. eviction-then-retraction") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // n=3; u1 views o1..o4 in batch 1 (o1 evicted by capacity), then
    // batch 2 retracts o2, re-adds o1, retracts an absent o9 (no-op).
    // o1's eviction must NOT resurrect it on o2's retraction - the
    // sequential interplay the fold pins.
    // u3's buffer EMPTIES in batch 2: the handler must emit an rn=0
    // tombstone so the stale batch-1 snapshot loses the max-ops race
    val batch1 = Seq(mkEv(0, 10, 1, "view", 1), mkEv(1, 20, 1, "view", 2),
      mkEv(2, 30, 1, "view", 3), mkEv(3, 40, 1, "view", 4),
      mkEv(8, 15, 3, "view", 7))
    val batch2 = Seq(mkEv(4, 50, 1, "click", 2), mkEv(5, 60, 1, "view", 1),
      mkEv(6, 70, 1, "click", 9), mkEv(7, 80, 2, "view", 5),
      mkEv(9, 55, 3, "click", 7))
    val out = StreamSum.undoLastnStream(
      Transform.extractFrom(mem.toDF()), n = 3)
    val q = out.toDF().writeStream.format("memory").queryName("ulastn_parity")
      .outputMode(OutputMode.Update()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    // latest snapshot per key = rows carrying the max op marker (t slot)
    val byKey = spark.table("ulastn_parity").collect()
      .groupBy(_.getLong(1))
    val streamed = byKey.map { case (k, rs) =>
      val latest = rs.map(_.getLong(3)).max
      k -> rs.filter(_.getLong(3) == latest)
        .filter(_.getLong(4) >= 1) // emptied-buffer tombstones
        .map(r => r.getLong(4) -> r.getLong(2)).toMap // rn -> v
    }.filter(_._2.nonEmpty)
    val batch = Caches.undoLastnState(
        Transform.extractFrom((batch1 ++ batch2).toDF()), n = 3)
      .collect().groupBy(_.getLong(1))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getLong(2) -> r.getLong(3)).toMap }
    assert(streamed == batch)
    // u1 final buffer: [o3, o4, o1] → rn1=o1 (newest), rn2=o4, rn3=o3
    assert(streamed(1L) == Map(1L -> 1L, 2L -> 4L, 3L -> 3L))
    // u3 emptied: the tombstone must erase the stale batch-1 snapshot
    assert(!streamed.contains(3L))
  }

  test("streaming undo-assoc == batch last-op-wins with nil retraction") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // signup writes (k=obj, v=user); error retracts obj's entry (nil);
    // obj 8 is retracted then re-signed, obj 9 only ever retracted
    // (must surface with a null value, ≙ .put(key, nil))
    val evs1 = Seq(mkEv(0, 10, 1, "signup", 7), mkEv(1, 20, 2, "signup", 8),
      mkEv(2, 30, 1, "error", 9))
    val evs2 = Seq(mkEv(3, 40, 1, "error", 8), mkEv(4, 50, 3, "signup", 8),
      mkEv(5, 60, 2, "error", 7))
    val tuples = Transform.extractFrom(mem.toDF())
    val ops = tuples.filter(col("p") === "signup")
      .select(col("o").as("k"), col("s").as("v"), col("t"), col("seq"))
      .unionAll(tuples.filter(col("p") === "error")
        .select(col("o").as("k"),
          lit(null).cast(org.apache.spark.sql.types.LongType).as("v"),
          col("t"), col("seq")))
    val agg = ops.groupBy(col("k"))
      .agg(max(struct(col("t"), col("seq"), col("v"))).as("m"))
      .select(col("k"), col("m.v").as("v"), col("m.t").as("t"))
    val q = agg.writeStream.format("memory").queryName("uassoc_parity")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(evs1: _*); q.processAllAvailable()
    mem.addData(evs2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("uassoc_parity").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val batch = Caches.undoAssocState(
        Transform.extractFrom((evs1 ++ evs2).toDF())).collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(streamed == batch)
    assert(streamed(8L) == Some(3L), "retract-then-rewrite: last op wins")
    assert(streamed(7L) == None, "retraction nulls the entry")
    assert(streamed(9L) == None, "retract-only key surfaces with nil")
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

  test("watermark drops events later than the lateness bound") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val day = 86400L * 1000 * 1000 * 1000 // ns
    val mem = MemoryStream[Ev]
    val windowed = Transform.extractFrom(mem.toDF())
      .withColumn("ets", timestamp_micros(col("t")))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 day").as("w"), col("p"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("ws"), col("cnt"))
    val q = windowed.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Update()).start()
    // batch 1: one event on day 0, one on day 3 → watermark → day3 - 1h
    mem.addData(mkEv(0, 1000, 1, "purchase", 1),
      Ev(1, 3 * day, 1, "purchase", 1.0, """{"k": 1}"""))
    q.processAllAvailable()
    // batch 2: a day-0 event, now far older than the watermark → dropped
    mem.addData(mkEv(2, 2000, 1, "purchase", 1))
    q.processAllAvailable()
    q.stop()
    val counts = spark.table("wm_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts(0L) == 1L, "late day-0 event should have been dropped")
    assert(counts(3L * day / 1000) == 1L)
  }

  test("stateful query restarts from checkpoint with state intact") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Ev]
    def counts = Transform(Transform.extractFrom(mem.toDF()))
      .filter(col("cache").isin(Config.cachesOf(CountK): _*))
      .groupBy(col("cache"), col("k").as("s"), col("a"), col("v").as("o"))
      .agg(count(lit(1)).as("cnt"), max(col("t")).as("last_t"))
    def start() = counts.writeStream.format("memory")
      .queryName("ckpt_counts").outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt).start()
    val batch1 = Seq(mkEv(0, 10, 1, "purchase", 7), mkEv(1, 20, 1, "purchase", 7))
    val batch2 = Seq(mkEv(2, 30, 1, "purchase", 7), mkEv(3, 40, 2, "error", 8))
    val q1 = start()
    mem.addData(batch1: _*); q1.processAllAvailable(); q1.stop()
    // restart against the same checkpoint: batch1's offsets are
    // committed, so only batch2 is processed - the counts for batch1
    // can only come from recovered state
    val q2 = start()
    mem.addData(batch2: _*); q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("ckpt_counts").collect()
      .map(r => ((r.getLong(1), r.getString(2), r.getLong(3)), r.getLong(4)))
      .toMap
    val batch = Caches.countState(
      Transform(Transform.extractFrom((batch1 ++ batch2).toDF())))
      .collect()
      .map(r => ((r.getLong(1), r.getString(2), r.getLong(3)), r.getLong(4)))
      .toMap
    assert(streamed == batch)
    assert(streamed((1L, "buy", 7L)) == 3L,
      "pre-restart increments must survive the restart")
  }

  test("streaming journey-prefix state keeps the EARLIEST k under " +
       "out-of-order multi-batch arrival") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // batch 1 delivers user 1's LATER events; batch 2 delivers the
    // true journey start - the prefix must re-point to the earlier
    // events (a row_number over arrival order would get this wrong)
    val batch1 = Seq(mkEv(10, 60, 1, "d", 1), mkEv(11, 70, 1, "e", 1),
      mkEv(12, 80, 1, "f", 1), mkEv(13, 90, 1, "g", 1),
      mkEv(14, 95, 1, "h", 1))
    val batch2 = Seq(mkEv(1, 10, 1, "a", 1), mkEv(2, 20, 1, "b", 1))
    val firstK = udaf(graft.functions.FirstKAgg(
      graft.analytics.Behavior.pathLen))
    val state = mem.toDF()
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(firstK(col("tus"), col("event_id"), col("event_type"))
        .as("buf"))
    val q = state.writeStream.format("memory").queryName("paths_parity")
      .outputMode(OutputMode.Complete()).start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val path = graft.analytics.Behavior.pathsTopFrom(
      spark.table("paths_parity")
        .select(expr("array_join(transform(buf, x -> x._3), '>')")
          .as("path"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(path == Seq((1L, "a>b>d>e>f", 1L)),
      s"prefix must be the 5 EARLIEST events across batches: $path")
  }

  test("rfm store: a customer's orders straddling batches merge " +
       "(max/sum/sum), never overwrite") {
    val s = spark; import s.implicits._
    val dayNs = 86400L * 1000000000L
    val orders = Seq(
      (1L, 1L, 4L, 100.00), (2L, 2L, 3L, 25.00), (3L, 2L, 2L, 25.01),
      (4L, 3L, 2L, 10.00), (5L, 3L, 1L, 10.00), (6L, 3L, 0L, 10.00))
      .map { case (ok, ck, day, price) =>
        (ok, ck, "O", price, day * dayNs, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_rfms").toString
    // single FILE named orders.parquet (the testdata layout - the
    // streaming face's pathGlobFilter matches leaf file names)
    val stage = s"$dir/_stage"
    orders.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "orders.parquet"))
    val got = graft.pipeline.SignatureStore.gatedRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(7))).toSeq
    // odd/even orderkey split puts customer 2's and 3's orders in BOTH
    // batches: frequency and cents must sum, recency must max
    val expect = graft.analytics.Segmentation.qRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(7))).toSeq
    assert(got == expect, s"store answer diverged: $got vs $expect")
    assert(got.map(t => (t._1, t._3, t._4)) ==
      Seq((1L, 1L, 10000L), (2L, 2L, 5001L), (3L, 3L, 3000L)),
      s"merged rollups wrong: $got")
    // the streaming face shares the same rollup + view split
    val streamed = graft.streaming.StreamSum.streamRfm(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(7))).toSeq
    assert(streamed == expect, s"stream face diverged: $streamed")
  }

  test("typed bounded-buffer agg state survives a checkpoint restart") {
    // the KMV/top-K faces keep their sketch buffers as typed-agg
    // state; a restart must recover the buffer, not just offsets -
    // batch 2 alone cannot reproduce batch 1's minima
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_kmv").toString
    val mem = MemoryStream[(String, Long)]
    val agg = graft.functions.MinKAgg(8)
    def buf = mem.toDS().groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("ks"))
    def start() = buf.toDF("g", "ks").writeStream.format("memory")
      .queryName("ckpt_kmv").outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt).start()
    // batch 1 holds the 4 smallest values; batch 2 only larger ones
    val q1 = start()
    mem.addData(Seq(1L, 2L, 3L, 4L).map("A" -> _): _*)
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    mem.addData(Seq(100L, 101L, 102L, 103L, 104L, 105L).map("A" -> _): _*)
    q2.processAllAvailable(); q2.stop()
    val ks = spark.table("ckpt_kmv").collect()(0).getSeq[Long](1)
    assert(ks == Seq(1L, 2L, 3L, 4L, 100L, 101L, 102L, 103L),
      s"recovered buffer must retain batch 1's minima: $ks")
  }

  test("streaming LSH candidates == batch minhash candidates") {
    val streamed = StreamSum.streamLshCandidates(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.pipeline.Dedup.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming interpolating resample == batch face (incl. gaps)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e6), r.getBoolean(4))
    val streamed = StreamSum.streamResampleInterp(spark, sfDir)
      .collect().map(key).toSet
    val batch = graft.analytics.TimeSeries.qResampleInterp(spark, sfDir)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.exists(_._5), "fixture should contain gap buckets")
  }

  test("streaming decontamination == both batch faces") {
    val streamed = StreamSum.streamDecontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val joined = graft.pipeline.CorpusOps.decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val bloomed = graft.pipeline.CorpusOps.decontaminateBloom(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(streamed == joined)
    assert(streamed == bloomed)
    assert(streamed.exists(_._2), "fixture should contain contamination")
  }

  test("transformWithState timers: session expiry emits and clears state") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import org.apache.spark.sql.streaming.TimeMode
    def sec(x: Long): Long = x * 1000000L
    val gap = sec(100)
    val mem = MemoryStream[SessEvent]
    val input = mem.toDF()
      .withColumn("ets", timestamp_micros(col("t")))
      .withWatermark("ets", "0 seconds")
      .as[SessEvent]
    val out = input.groupByKey(_.s)
      .transformWithState(new SessionTtlProcessor(gap),
        TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF().writeStream.format("memory").queryName("ttl_test")
      .outputMode(OutputMode.Append()).start()
    // (times start at 1000s - rows at/below the current watermark are
    // dropped as late, and the initial watermark is 0)
    // batch 1: key 1 session [1000s, 1050s]; key 3 has a within-batch
    // gap > 100s, so its first session closes eagerly
    mem.addData(SessEvent(1, sec(1000), 1), SessEvent(1, sec(1050), 2),
      SessEvent(3, sec(1000), 3), SessEvent(3, sec(1300), 4))
    q.processAllAvailable()
    // batch 2: watermark is now 1300s → key-1 timer (expiry 1150s) fires
    mem.addData(SessEvent(2, sec(2000), 5)); q.processAllAvailable()
    // batch 3: watermark is now 2000s → key-3's second session (expiry
    // 1400s) fires; key 2 merges the new event and re-arms
    mem.addData(SessEvent(2, sec(2001), 6)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("ttl_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows.contains((3L, sec(1000), sec(1100), 1L)),
      s"eager close missing: $rows")
    assert(rows.contains((1L, sec(1000), sec(1150), 2L)),
      s"timer close missing: $rows")
    assert(rows.contains((3L, sec(1300), sec(1400), 1L)),
      s"second-session timer close missing: $rows")
    assert(!rows.exists(_._1 == 2L), "key 2's session is still open")
  }

  test("foreachBatch publishes count state through a CacheSink") {
    val sink = new graft.sinks.ParquetCacheSink(
      java.nio.file.Files.createTempDirectory("graft_stream_sink").toString)
    StreamSum.streamCountsToSink(spark, sfDir, sink, "interactions")
    val snap = sink.get(spark, "interactions")
    val batch = Caches.countState(Transform.transformed(spark, sfDir))
    assert(snap.count() == batch.count())
  }

  test("transformWithState last-N == batch last-N (Spark 4 stateful API)") {
    val r = StreamSum.streamLastnTws(spark, sfDir)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    val b = Caches.lastnState(Transform.transformed(spark, sfDir))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    assert(r == b)
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
