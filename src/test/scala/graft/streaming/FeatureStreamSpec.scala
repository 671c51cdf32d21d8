package graft.streaming

import graft.SparkSpec
import graft.analytics.{Behavior, TimeSeries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream/batch parity for the per-user feature faces: the sequential
  * folds (funnel flags, EWMA ring, anomaly baseline) must reproduce
  * the batch window formulations exactly, including across micro-batch
  * boundaries where the carried state does the work of the window
  * frame.
  */
class FeatureStreamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("ss_stream_funnel == q_funnel") {
    assert(rows(FeatureStream.streamFunnel(spark, sfDir)) ==
      rows(Behavior.qFunnel(spark, sfDir)))
  }

  test("ss_stream_ewma == q_ewma (bitwise)") {
    assert(rows(FeatureStream.streamEwma(spark, sfDir)) ==
      rows(TimeSeries.qEwma(spark, sfDir)))
  }

  test("ss_stream_holt == q_holt (bitwise)") {
    assert(rows(FeatureStream.streamHolt(spark, sfDir)) ==
      rows(TimeSeries.qHolt(spark, sfDir)))
  }

  test("holt ring state carries across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // a ramp: the second batch's first rows reach full-window m (and a
    // nonzero trend consistent with the whole history) only if the
    // ring survived the boundary
    val all = (0 until 12).map(i =>
      FeatureStream.ValRow(1L, 1000L + i, i.toLong, i.toDouble))
    def run(batches: Seq[Seq[FeatureStream.ValRow]]): Seq[String] = {
      val mem = MemoryStream[FeatureStream.ValRow]
      val q = FeatureStream.holtStream(mem.toDF()).toDF()
        .writeStream.format("memory")
        .queryName(s"holt_mb_${batches.size}")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.table(s"holt_mb_${batches.size}")
        .orderBy("user_id", "event_id").collect().map(_.toString).toSeq
    }
    val split = run(Seq(all.take(5), all.drop(5)))
    val oneShot = run(Seq(all))
    assert(split == oneShot && split.size == 12)
  }

  test("ss_stream_anomaly == q_anomaly") {
    assert(rows(FeatureStream.streamAnomaly(spark, sfDir)) ==
      rows(TimeSeries.qAnomaly(spark, sfDir)))
  }

  test("ewma ring state carries across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 12 observations for one user: the second batch's first rows must
    // see the first batch's tail through the carried ring (m reaches
    // the full window length only if state survived the boundary)
    val all = (0 until 12).map(i =>
      FeatureStream.ValRow(1L, 1000L + i, i.toLong, (i * 37 % 100) / 4.0))
    def run(batches: Seq[Seq[FeatureStream.ValRow]]): Seq[String] = {
      val mem = MemoryStream[FeatureStream.ValRow]
      val q = FeatureStream.ewmaStream(mem.toDF()).toDF()
        .writeStream.format("memory")
        .queryName(s"ewma_mb_${batches.size}")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.table(s"ewma_mb_${batches.size}")
        .orderBy("user_id", "event_id").collect().map(_.toString).toSeq
    }
    val split = run(Seq(all.take(5), all.drop(5)))
    val oneShot = run(Seq(all))
    assert(split == oneShot && split.size == 12)
  }

  test("ss_stream_autocorr == q_autocorr (bitwise)") {
    assert(rows(FeatureStream.streamAutocorr(spark, sfDir)) ==
      rows(TimeSeries.qAutocorr(spark, sfDir)))
  }

  test("autocorr pair ring carries across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 10 observations for one user split mid-stream: the pairs that
    // straddle the boundary (lag-k reaching back into batch 1) exist
    // only if the ring survived it
    val all = (0 until 10).map(i =>
      FeatureStream.ValRow(1L, 1000L + i, i.toLong, (i * 31 % 17) / 2.0))
    def run(batches: Seq[Seq[FeatureStream.ValRow]]): Seq[String] = {
      val mem = MemoryStream[FeatureStream.ValRow]
      val q = FeatureStream.acfPairStream(mem.toDF()).toDF()
        .writeStream.format("memory")
        .queryName(s"acf_mb_${batches.size}")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.table(s"acf_mb_${batches.size}")
        .orderBy("lag", "x", "y").collect().map(_.toString).toSeq
    }
    val split = run(Seq(all.take(5), all.drop(5)))
    val oneShot = run(Seq(all))
    assert(split == oneShot)
    // 10 observations at lags 1..4 -> 9+8+7+6 = 30 pairs
    assert(split.size == 30)
  }

  test("ss_stream_markov == q_markov (bitwise)") {
    assert(rows(FeatureStream.streamMarkov(spark, sfDir)) ==
      rows(Behavior.qMarkov(spark, sfDir)))
  }

  test("markov last-event state carries across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // one user, types a b a c: splitting after 'b' puts the b->a
    // junction transition across the batch boundary - it must still
    // be emitted, via the carried last-event state
    val all = Seq("a", "b", "a", "c").zipWithIndex.map { case (t, i) =>
      FeatureStream.EvRow(1L, 1000L + i, i.toLong, t)
    }
    def run(batches: Seq[Seq[FeatureStream.EvRow]]): Seq[(String, String)] = {
      val mem = MemoryStream[FeatureStream.EvRow]
      val q = FeatureStream.markovTransStream(mem.toDF()).toDF()
        .writeStream.format("memory")
        .queryName(s"mkv_mb_${batches.size}")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      s.table(s"mkv_mb_${batches.size}")
        .orderBy("from_type", "to_type").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    }
    val split = run(Seq(all.take(2), all.drop(2)))
    val oneShot = run(Seq(all))
    assert(split == oneShot &&
      split == Seq(("a", "b"), ("a", "c"), ("b", "a")))
  }

  test("ss_stream_cooccur == q_cooccur") {
    assert(rows(FeatureStream.streamCooccur(spark, sfDir)) ==
      rows(graft.analytics.Graph.qCooccur(spark, sfDir)))
  }

  test("cooccur tombstone: a user crossing the cap mid-stream retracts") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[FeatureStream.UserObj]
    val q = FeatureStream.cooccurPairStream(mem.toDF()).toDF()
      .writeStream.format("memory").queryName("cooccur_mb")
      .outputMode(OutputMode.Append()).start()
    // batch 1: users 1 and 2 each pair {10, 20}; batch 2 pushes user 1
    // past the cap - its earlier pairs must be retracted by tombstone
    mem.addData(FeatureStream.UserObj(1L, 10L), FeatureStream.UserObj(1L, 20L),
      FeatureStream.UserObj(2L, 10L), FeatureStream.UserObj(2L, 20L))
    q.processAllAvailable()
    val flood = (0 to graft.analytics.Graph.cooccurMaxDeg)
      .map(i => FeatureStream.UserObj(1L, 1000L + i))
    mem.addData(flood: _*)
    q.processAllAvailable()
    q.stop()
    val snap = s.table("cooccur_mb")
    val dead = snap.filter($"o1" === -1L).select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dead == Set(1L), "user 1 must be tombstoned")
    // the snapshot query's anti-join leaves only user 2's pair, which
    // falls below the 2-user support floor -> empty final relation
    val alivePairs = snap.filter($"o1" =!= -1L)
      .filter(!$"user_id".isin(dead.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(alivePairs == Set((2L, 10L, 20L)))
  }

  test("ss_stream_triangles == q_triangles") {
    assert(rows(FeatureStream.streamTriangles(spark, sfDir)) ==
      rows(graft.analytics.Graph.qTriangles(spark, sfDir)))
  }

  test("ss_stream_kcore == q_kcore") {
    assert(rows(FeatureStream.streamKcore(spark, sfDir)) ==
      rows(graft.analytics.Graph.qKcore(spark, sfDir)))
  }

  test("ss_stream_linkpred == q_linkpred") {
    assert(rows(FeatureStream.streamLinkpred(spark, sfDir)) ==
      rows(graft.analytics.Graph.qLinkpred(spark, sfDir)))
  }

  test("ss_stream_lpa == q_lpa") {
    assert(rows(FeatureStream.streamLpa(spark, sfDir)) ==
      rows(graft.analytics.Graph.qLpa(spark, sfDir)))
  }

  test("ss_stream_stl == q_stl") {
    assert(StreamSum.streamStl(spark, sfDir).collect().map(_.toSeq).toSeq
      == graft.analytics.TimeSeries.qStl(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
  }

  test("ss_stream_xcorr == q_xcorr") {
    assert(StreamSum.streamXcorr(spark, sfDir).collect().map(_.toSeq).toSeq
      == graft.analytics.TimeSeries.qXcorr(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
  }

  test("ss_stream_session_overlap == q_session_overlap") {
    assert(rows(StreamSum.streamSessionOverlap(spark, sfDir)) ==
      rows(graft.analytics.Tpch.qSessionOverlap(spark, sfDir)))
  }

  test("triangles stream: membership facts rebuild the lift gate " +
       "across micro-batch splits; tombstone retracts a corner") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // the GraphSpec clique fixture: users 1-4 on {10,20,30}, bystanders
    // 5,6 on {40,50} - one triangle. Split mid-user-history so pair
    // and membership facts straddle the boundary.
    val all = ((1L to 4L).flatMap(u => Seq(10L, 20L, 30L).map((u, _))) ++
      Seq((5L, 40L), (5L, 50L), (6L, 40L), (6L, 50L)))
      .map { case (u, o) => FeatureStream.UserObj(u, o) }
    def run(batches: Seq[Seq[FeatureStream.UserObj]],
            name: String): Seq[(Long, Long)] = {
      val mem = MemoryStream[FeatureStream.UserObj]
      val q = FeatureStream.trianglePairStream(mem.toDF()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      FeatureStream.trianglesOfSnapshot(s.table(name))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val oneShot = run(Seq(all), "tri_mb_1")
    val split = run(Seq(all.take(7), all.drop(7)), "tri_mb_2")
    assert(oneShot == Seq((10L, 1L), (20L, 1L), (30L, 1L)))
    assert(split == oneShot, "micro-batch split must not perturb the view")
    // flooding corner 10's users past the cap tombstones them: with
    // users 1-4 dead, every clique pair loses support - no triangles
    val flood = (1L to 4L).flatMap(u =>
      (0 to graft.analytics.Graph.cooccurMaxDeg)
        .map(i => FeatureStream.UserObj(u, 1000L + i)))
    val gone = run(Seq(all, flood), "tri_mb_3")
    assert(gone.isEmpty,
      s"tombstoned users must retract their triangles: $gone")
  }

  test("funnel flags carry across micro-batches (view in b1, click in b2)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[FeatureStream.EvRow]
    val q = FeatureStream.funnelFlagStream(mem.toDF()).toDF()
      .writeStream.format("memory").queryName("funnel_mb")
      .outputMode(OutputMode.Update()).start()
    // user 1 converts step 2 only because the step-1 view arrived in
    // the PREVIOUS batch; user 2's purchase-before-click must not count
    mem.addData(
      FeatureStream.EvRow(1L, 10L, 1L, "view"),
      FeatureStream.EvRow(2L, 10L, 2L, "purchase"))
    q.processAllAvailable()
    mem.addData(
      FeatureStream.EvRow(1L, 20L, 3L, "click"),
      FeatureStream.EvRow(2L, 20L, 4L, "click"),
      FeatureStream.EvRow(2L, 30L, 5L, "view"))
    q.processAllAvailable()
    q.stop()
    // latest (max-ops) snapshot per user, selected in plain Scala -
    // memory-table self-joins trip Spark's relation dedup
    val flags = s.table("funnel_mb")
      .select("user_id", "r1", "r2", "r3", "ops")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        val r = rs.maxBy(_.getLong(4))
        u -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      }
    assert(flags(1L) == ((true, true, false)))
    // user 2: view arrives after the click - no step-2 conversion
    assert(flags(2L) == ((true, false, false)))
  }

  // the three additive-matrix faces: state is the batch aggregation
  // itself (streamed Complete-mode agg), the report a query-time view
  // via the SAME batch function — parity must be bitwise

  test("ss_stream_trending == q_trending") {
    assert(rows(StreamSum.streamTrending(spark, sfDir)) ==
      rows(TimeSeries.qTrending(spark, sfDir)))
  }

  test("ss_stream_seasonality == q_seasonality") {
    assert(rows(StreamSum.streamSeasonality(spark, sfDir)) ==
      rows(TimeSeries.qSeasonality(spark, sfDir)))
  }

  test("ss_stream_qclf == pipe_qclf_score (retrained from streamed " +
       "features, bit-identical weights)") {
    assert(rows(StreamSum.streamQclf(spark, sfDir)) ==
      rows(graft.pipeline.QualityClassifier.score(spark, sfDir)))
  }

  test("ss_stream_skyline == q_skyline") {
    assert(rows(StreamSum.streamSkyline(spark, sfDir)) ==
      rows(graft.analytics.Segmentation.qSkyline(spark, sfDir)))
  }

  test("ss_stream_gini == q_gini") {
    assert(rows(StreamSum.streamGini(spark, sfDir)) ==
      rows(graft.analytics.Tpch.qGini(spark, sfDir)))
  }

  test("ss_stream_readability == txt_readability (stateless projection)") {
    assert(rows(StreamSum.streamReadability(spark, sfDir)) ==
      rows(graft.pipeline.TextAnalysis.readability(spark, sfDir)))
  }

  test("ss_stream_histogram == q_histogram") {
    assert(rows(StreamSum.streamHistogram(spark, sfDir)) ==
      rows(graft.analytics.Tpch.qHistogram(spark, sfDir)))
  }
}
