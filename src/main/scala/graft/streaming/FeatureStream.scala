package graft.streaming

import graft.analytics.{Behavior, TimeSeries}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming faces of the per-user event-feature operators (funnel /
  * EWMA / rolling anomaly) — the behavior family's live deployment
  * path. Each is a per-user sequential fold in the same total
  * (ts, event_id) event order the batch window formulations use, so
  * the faces share the batch operators' oracles verbatim.
  *
  * State is BOUNDED by construction — the entire point of these
  * streaming forms at 100 TB:
  *   - funnel: three booleans per user (the batch per-user flags);
  *   - EWMA:   the last ≤ 7 prior observations per user (the batch
  *             window's lag columns ARE this ring);
  *   - anomaly: the last ≤ 8 prior observations per user (the batch
  *             trailing baseline frame).
  * An exact streaming funnel/EWMA cannot hold less: each is the batch
  * window frame made explicit. Rows are folded in (ts, event_id)
  * order within each micro-batch; across batches the file source
  * delivers in time order (the same arrival contract the undo-cache
  * faces document).
  *
  * Reference: the reference's live pipeline summarizes events as they
  * arrive (system.clj queue → transform → record); these faces apply
  * that arrival-driven model to the windowed feature operators.
  */
object FeatureStream {

  final case class EvRow(user_id: Long, tus: Long, event_id: Long,
                         event_type: String)
  final case class ValRow(user_id: Long, tus: Long, event_id: Long,
                          value: Double)
  final case class FunnelFlag(user_id: Long, r1: Boolean, r2: Boolean,
                              r3: Boolean, ops: Long)
  final case class EwmaOut(user_id: Long, event_id: Long, value: Double,
                           n_obs: Long, ewma: Double)
  final case class AnomalyOut(user_id: Long, event_id: Long,
                              value: Double, n_base: Long)

  /** value → exact integer micro-units; the same IEEE ops as the batch
    * faces' `CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)`.
    */
  private def vMu(value: Double): Long =
    math.floor(value * 1000000.0 + 0.5).toLong

  private def q6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0

  // ---- ss_stream_funnel ----------------------------------------------

  /** Per-user funnel fold: state = the three conversion bits. A step-k
    * event converts iff step k−1 was converted by a STRICTLY preceding
    * event — in a sequential fold the state before the current event
    * is exactly the strictly-preceding history, so the batch window
    * semantics (Behavior.qFunnel) fall out of evaluating the three
    * rules against the PRE-update flags.
    */
  private def funnelHandler(
      key: Long, rows: Iterator[EvRow],
      state: GroupState[(Boolean, Boolean, Boolean, Long)])
      : Iterator[FunnelFlag] = {
    val Seq(s1, s2, s3) = Behavior.funnelSteps
    var (r1, r2, r3, ops) = state.getOption.getOrElse(
      (false, false, false, 0L))
    val sorted = rows.toSeq.sortBy(r => (r.tus, r.event_id))
    sorted.foreach { r =>
      // evaluate against the pre-update flags (strictly-preceding);
      // an event has one type, so the three updates cannot interact
      val n2 = r2 || (r.event_type == s2 && r1)
      val n3 = r3 || (r.event_type == s3 && r2)
      r1 = r1 || r.event_type == s1
      r2 = n2
      r3 = n3
      ops += 1L
    }
    state.update((r1, r2, r3, ops))
    Iterator.single(FunnelFlag(key, r1, r2, r3, ops))
  }

  /** The per-user flag stream over any (user_id, tus, event_id,
    * event_type) relation — MemoryStream-drivable for parity specs.
    */
  def funnelFlagStream(ev: DataFrame): Dataset[FunnelFlag] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[EvRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(funnelHandler)
  }

  def streamFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamSum.streamingEvents(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
    val snap = StreamSum.runToTable(funnelFlagStream(ev).toDF(),
      OutputMode.Update(), "ss_stream_funnel")
    // Update-mode sink: one flag snapshot per user per micro-batch;
    // ops is monotone, so max-ops selects each user's final flags.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val flags = snap.withColumn("mx", max(col("ops")).over(w))
      .filter(col("ops") === col("mx"))
      .select(col("user_id"), col("r1"), col("r2"), col("r3"))
    Behavior.funnelReportFrom(flags)
  }

  // ---- ss_stream_ewma ------------------------------------------------

  /** Per-user EWMA fold: state = the last ≤ ewmaLen−1 prior
    * observations in micro-units, newest first (the batch face's lag
    * columns). Each arriving event's EWMA is final at arrival —
    * Append-mode emission, one row per event, no snapshot selection.
    * Arithmetic is the batch face's exactly: integer weighted sum
    * 3^i·4^(m−1−i) over the ≤ m observations, ONE double division,
    * q6 — so the emitted doubles are bit-identical to the window
    * formulation's and the face shares `qEwmaSql`.
    */
  private def ewmaHandler(
      key: Long, rows: Iterator[ValRow],
      state: GroupState[Seq[Long]]): Iterator[EwmaOut] = {
    val n = TimeSeries.ewmaLen
    val pow3 = Array.iterate(1L, n + 1)(_ * 3L)
    val pow4 = Array.iterate(1L, n + 1)(_ * 4L)
    var ring = state.getOption.getOrElse(Seq.empty) // newest first
    val out = rows.toSeq.sortBy(r => (r.tus, r.event_id)).map { r =>
      val vs = vMu(r.value) +: ring // v0 = current, v1.. = lags
      val m = math.min(vs.length, n)
      var num = 0L
      var i = 0
      while (i < m) {
        num += pow3(i) * pow4(m - 1 - i) * vs(i)
        i += 1
      }
      val den = pow4(m) - pow3(m)
      ring = vs.take(n - 1)
      EwmaOut(key, r.event_id, r.value, m.toLong,
        q6(num.toDouble / (den.toDouble * 1000000.0)))
    }
    state.update(ring)
    out.iterator
  }

  def ewmaStream(ev: DataFrame): Dataset[EwmaOut] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[ValRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(ewmaHandler)
  }

  private def valueEvents(spark: SparkSession, sfDir: String): DataFrame =
    StreamSum.streamingEvents(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("value"))

  def streamEwma(spark: SparkSession, sfDir: String): DataFrame =
    StreamSum.runToTable(ewmaStream(valueEvents(spark, sfDir)).toDF(),
      OutputMode.Append(), "ss_stream_ewma")
      .select(col("user_id"), col("event_id"), col("value"),
        col("n_obs"), col("ewma"))
      .orderBy(col("user_id"), col("event_id"))

  // ---- ss_stream_holt --------------------------------------------------

  final case class HoltOut(user_id: Long, event_id: Long, value: Double,
                           n_obs: Long, level: Double, trend: Double,
                           forecast: Double)

  /** Per-user HOLT fold: the EWMA face's ring (last ≤ holtLen−1 prior
    * observations, newest first) evaluated through the batch face's
    * integer matrix-power weight tables — level and trend are both
    * weighted sums of the same window over the common denominator
    * 16^(m−1), so the state the level-only smoother already carries is
    * exactly enough for the trend too (a streaming Holt could also
    * fold (L, B) directly, but the truncated-window semantics the
    * batch face defines REQUIRE the re-derivation from the window:
    * a fold would never forget observation m+1). Append mode — every
    * row's smoothing is final at arrival; arithmetic is the batch
    * text's (per-lag CASE weight · micro-unit value, one double
    * division, q6), so the face shares `qHoltSql` bitwise.
    */
  private def holtHandler(
      key: Long, rows: Iterator[ValRow],
      state: GroupState[Seq[Long]]): Iterator[HoltOut] = {
    val n = TimeSeries.holtLen
    val (wl, wb) = (TimeSeries.holtWL, TimeSeries.holtWB)
    var ring = state.getOption.getOrElse(Seq.empty) // newest first
    val out = rows.toSeq.sortBy(r => (r.tus, r.event_id)).map { r =>
      val vs = vMu(r.value) +: ring // v0 = current, v1.. = lags
      val m = math.min(vs.length, n)
      var numL = 0L
      var numB = 0L
      var j = 0
      while (j < m) {
        numL += wl(m)(m - 1 - j) * vs(j)
        numB += wb(m)(m - 1 - j) * vs(j)
        j += 1
      }
      val den = Array.iterate(1L, m)(_ * 16L).last.toDouble * 1000000.0
      ring = vs.take(n - 1)
      HoltOut(key, r.event_id, r.value, m.toLong,
        q6(numL.toDouble / den), q6(numB.toDouble / den),
        q6((numL + numB).toDouble / den))
    }
    state.update(ring)
    out.iterator
  }

  def holtStream(ev: DataFrame): Dataset[HoltOut] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[ValRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(holtHandler)
  }

  def streamHolt(spark: SparkSession, sfDir: String): DataFrame =
    StreamSum.runToTable(holtStream(valueEvents(spark, sfDir)).toDF(),
      OutputMode.Append(), "ss_stream_holt")
      .select(col("user_id"), col("event_id"), col("value"),
        col("n_obs"), col("level"), col("trend"), col("forecast"))
      .orderBy(col("user_id"), col("event_id"))

  // ---- ss_stream_anomaly ---------------------------------------------

  /** Per-user rolling-3σ fold: state = the last ≤ anomalyBase prior
    * observations (the batch trailing frame), oldest first. The
    * verdict is the batch face's EXACT integer test
    * (n·v − S)² > 9·(n·Q − S²) — S² reaches ~1.6e19, past BIGINT, so
    * the quadratics run in BigInt ≙ the batch DECIMAL(38,0) ≙ the
    * oracle HUGEINT. Only anomalous rows are emitted (Append mode,
    * final at arrival).
    */
  private def anomalyHandler(
      key: Long, rows: Iterator[ValRow],
      state: GroupState[Seq[Long]]): Iterator[AnomalyOut] = {
    val maxN = TimeSeries.anomalyBase
    var ring = state.getOption.getOrElse(Seq.empty) // oldest first
    val out = rows.toSeq.sortBy(r => (r.tus, r.event_id)).flatMap { r =>
      val v = vMu(r.value)
      val n = ring.length.toLong
      val verdict = if (n >= TimeSeries.anomalyMinN) {
        val s = ring.sum
        val q = ring.map(x => BigInt(x) * x).sum
        val d = BigInt(n * v - s)
        d * d > 9 * (BigInt(n) * q - BigInt(s) * s)
      } else false
      ring = (ring :+ v).takeRight(maxN)
      if (verdict) Some(AnomalyOut(key, r.event_id, r.value, n)) else None
    }
    state.update(ring)
    out.iterator
  }

  def anomalyStream(ev: DataFrame): Dataset[AnomalyOut] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[ValRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(anomalyHandler)
  }

  def streamAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    StreamSum.runToTable(anomalyStream(valueEvents(spark, sfDir)).toDF(),
      OutputMode.Append(), "ss_stream_anomaly")
      .select(col("user_id"), col("event_id"), col("value"),
        col("n_base"))
      .orderBy(col("user_id"), col("event_id"))

  // ---- ss_stream_autocorr ----------------------------------------------

  final case class AcfPair(lag: Long, x: Long, y: Long)

  /** Per-user ACF pair emission: state = the last ≤ acfMaxLag prior
    * observations in micro-units, newest first (the batch lag columns
    * — the same ring shape as the EWMA/Holt faces). Each arriving
    * observation emits its (lag k, current, lag-k predecessor) pairs,
    * which are FINAL at arrival (Append mode); the pooled Pearson is
    * an evolving-answer quantity (every arrival shifts all six sums),
    * so the ACF is a query-time view through the batch face's shared
    * `acfFromPairs` — the pair stream is the stored fact, never the
    * correlation.
    */
  private def acfHandler(
      key: Long, rows: Iterator[ValRow],
      state: GroupState[Seq[Long]]): Iterator[AcfPair] = {
    val n = TimeSeries.acfMaxLag
    var ring = state.getOption.getOrElse(Seq.empty) // newest first
    val out = scala.collection.mutable.ArrayBuffer.empty[AcfPair]
    rows.toSeq.sortBy(r => (r.tus, r.event_id)).foreach { r =>
      val v = vMu(r.value)
      ring.take(n).zipWithIndex.foreach { case (p, i) =>
        out += AcfPair((i + 1).toLong, v, p)
      }
      ring = (v +: ring).take(n)
    }
    state.update(ring)
    out.iterator
  }

  def acfPairStream(ev: DataFrame): Dataset[AcfPair] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[ValRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(acfHandler)
  }

  def streamAutocorr(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeries.acfFromPairs(
      StreamSum.runToTable(acfPairStream(valueEvents(spark, sfDir)).toDF(),
        OutputMode.Append(), "ss_stream_autocorr"))

  /** Streaming PACF, sharing `q_pacf`'s oracle: the SAME per-user
    * lag-ring pair state as the autocorr face (PACF is a pure
    * function of the pooled ACF — one arriving event shifts every
    * moment, so the Durbin-Levinson fold is a query-time view).
    */
  def streamPacf(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeries.pacfFromAcf(spark, TimeSeries.acfFromPairs(
      StreamSum.runToTable(acfPairStream(valueEvents(spark, sfDir)).toDF(),
        OutputMode.Append(), "ss_stream_pacf")))

  // ---- ss_stream_markov ----------------------------------------------

  final case class MarkovTrans(user_id: Long, from_type: String,
                               to_type: String)

  /** Per-user transition fold: state = the user's LAST event
    * (tus, event_id, type) — the minimum an exact first-order chain
    * can carry, and exactly the lag window's frame made explicit. Each
    * arriving event emits one (from, to) transition against the
    * pre-update state (Append mode — a transition is final at
    * arrival); the snapshot aggregates through the batch face's
    * `markovMatrixFrom`, so the faces share `qMarkovSql`.
    */
  private def markovHandler(
      key: Long, rows: Iterator[EvRow],
      state: GroupState[(Long, Long, String)]): Iterator[MarkovTrans] = {
    var last = state.getOption.orNull
    val out = scala.collection.mutable.ArrayBuffer.empty[MarkovTrans]
    rows.toSeq.sortBy(r => (r.tus, r.event_id)).foreach { r =>
      if (last != null) out += MarkovTrans(key, last._3, r.event_type)
      last = (r.tus, r.event_id, r.event_type)
    }
    if (last != null) state.update(last)
    out.iterator
  }

  /** The transition stream over any (user_id, tus, event_id,
    * event_type) relation — MemoryStream-drivable for parity specs.
    */
  def markovTransStream(ev: DataFrame): Dataset[MarkovTrans] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[EvRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(markovHandler)
  }

  def streamMarkov(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamSum.streamingEvents(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
    val snap = StreamSum.runToTable(markovTransStream(ev).toDF(),
      OutputMode.Append(), "ss_stream_markov")
    Behavior.markovMatrixFrom(Behavior.markovCount(
      snap.select(col("from_type"), col("to_type"))))
  }

  /** Streaming face of the Markov entropy rate, sharing
    * `q_markov_entropy`'s oracle: the streamed fact is the SAME
    * per-user transition emission as `ss_stream_markov` (each
    * transition final at arrival, Append mode — the matrix is the
    * storable state of every first-order-chain view), with the
    * entropy/rate math a query-time view via the shared
    * `markovEntropyFrom` (one arriving transition shifts its row's
    * distribution and the rate's weights, so no per-batch entropy is
    * reusable).
    */
  def streamMarkovEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamSum.streamingEvents(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
    val snap = StreamSum.runToTable(markovTransStream(ev).toDF(),
      OutputMode.Append(), "ss_stream_markov_entropy")
    Behavior.markovEntropyFrom(Behavior.markovCount(
      snap.select(col("from_type"), col("to_type"))))
  }

  final case class Markov2Trans(user_id: Long, f2: String, f1: String,
                                to_type: String)

  /** Per-user second-order transition emission: state is the last TWO
    * observations (newest first — the EWMA/ACF ring shape at length
    * 2); each arrival emits its (f2 | null, f1, to) fact, FINAL at
    * arrival (Append mode). A null f2 marks the user's first
    * transition — it feeds the first-order matrix the lift compares
    * against but no context row, exactly the batch lag semantics.
    */
  private def markov2Handler(
      key: Long, rows: Iterator[EvRow],
      state: GroupState[Seq[(Long, Long, String)]])
      : Iterator[Markov2Trans] = {
    var ring = state.getOption.getOrElse(Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[Markov2Trans]
    rows.toSeq.sortBy(r => (r.tus, r.event_id)).foreach { r =>
      if (ring.nonEmpty)
        out += Markov2Trans(key,
          if (ring.length >= 2) ring(1)._3 else null,
          ring.head._3, r.event_type)
      ring = ((r.tus, r.event_id, r.event_type) +: ring).take(2)
    }
    if (ring.nonEmpty) state.update(ring)
    out.iterator
  }

  /** The second-order transition stream over any (user_id, tus,
    * event_id, event_type) relation — MemoryStream-drivable.
    */
  def markov2TransStream(ev: DataFrame): Dataset[Markov2Trans] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.as[EvRow].groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(markov2Handler)
  }

  /** Streaming face of the second-order matrix, sharing
    * `q_markov2`'s oracle: transition facts are final at arrival
    * (Append), while counts, context totals and the first-order lift
    * baseline are evolving answers — the report runs over the final
    * snapshot via literally the batch `markov2FromTrans`.
    */
  def streamMarkov2(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = StreamSum.streamingEvents(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
    val snap = StreamSum.runToTable(markov2TransStream(ev).toDF(),
      OutputMode.Append(), "ss_stream_markov2")
    Behavior.markov2FromTrans(
      snap.select(col("f2"), col("f1"), col("to_type")))
  }

  // ---- ss_stream_cooccur ---------------------------------------------

  final case class UserObj(user_id: Long, o: Long)
  /** o1 = -1 is the cap-exceeded tombstone for the user. */
  final case class CoPair(user_id: Long, o1: Long, o2: Long)

  /** Per-user co-occurrence emission: state is the user's distinct
    * object set, BOUNDED at the degree cap — each genuinely new object
    * pairs with every prior member, so across batches each (user,
    * pair) streams out exactly once. The batch face EXCLUDES users
    * over the cap, which is unknowable online — so the moment a user
    * exceeds it, the handler emits one TOMBSTONE, drops the set (the
    * state shrinks to a flag), and goes silent; the snapshot query
    * anti-joins tombstoned users before counting, converging exactly
    * to the batch relation. The online-retraction analog of the
    * undo-cache faces, applied to candidate emission.
    */
  private def cooccurHandler(
      key: Long, rows: Iterator[UserObj],
      state: GroupState[(Set[Long], Boolean)]): Iterator[CoPair] = {
    var (seen, dead) = state.getOption.getOrElse((Set.empty[Long], false))
    val out = scala.collection.mutable.ArrayBuffer.empty[CoPair]
    rows.foreach { r =>
      if (!dead && !seen(r.o)) {
        if (seen.size + 1 > graft.analytics.Graph.cooccurMaxDeg) {
          dead = true
          seen = Set.empty
          out += CoPair(key, -1L, -1L)
        } else {
          out ++= seen.iterator.map(p =>
            CoPair(key, math.min(p, r.o), math.max(p, r.o)))
          seen += r.o
        }
      }
    }
    state.update((seen, dead))
    out.iterator
  }

  /** The pair-emission stream over any (user_id, o) relation —
    * MemoryStream-drivable for the tombstone spec.
    */
  def cooccurPairStream(userObjs: DataFrame): Dataset[CoPair] = {
    val spark = userObjs.sparkSession
    import spark.implicits._
    userObjs.select(col("user_id"), col("o")).as[UserObj]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(cooccurHandler)
  }

  // ---- ss_stream_triangles -------------------------------------------

  /** Per-user emission for the TRIANGLE face: the cooccur handler's
    * pair stream (each genuinely new object pairs with every prior
    * member; cap → tombstone + silence) EXTENDED with one MEMBERSHIP
    * fact per accepted object (encoded o2 = -2). The triangle view
    * needs what the pair stream alone cannot reconstruct: per-object
    * user degrees and the eligible-user count for the lift gate — both
    * derive from the membership facts of non-tombstoned users with
    * ≥ 2 accepted objects (exactly the batch face's `el` relation).
    * Lift, edges, orientation and the wedge count are all evolving-
    * answer quantities (one arriving interaction shifts every degree),
    * so they are query-time VIEWS through the batch face's shared
    * `liftEdges`/`trianglesFromEdges` — never stored state.
    */
  private def triangleHandler(
      key: Long, rows: Iterator[UserObj],
      state: GroupState[(Set[Long], Boolean)]): Iterator[CoPair] = {
    var (seen, dead) = state.getOption.getOrElse((Set.empty[Long], false))
    val out = scala.collection.mutable.ArrayBuffer.empty[CoPair]
    rows.foreach { r =>
      if (!dead && !seen(r.o)) {
        if (seen.size + 1 > graft.analytics.Graph.cooccurMaxDeg) {
          dead = true
          seen = Set.empty
          out += CoPair(key, -1L, -1L)
        } else {
          out ++= seen.iterator.map(p =>
            CoPair(key, math.min(p, r.o), math.max(p, r.o)))
          out += CoPair(key, r.o, -2L)
          seen += r.o
        }
      }
    }
    state.update((seen, dead))
    out.iterator
  }

  /** The pair+membership stream over any (user_id, o) relation —
    * MemoryStream-drivable for parity specs.
    */
  def trianglePairStream(userObjs: DataFrame): Dataset[CoPair] = {
    val spark = userObjs.sparkSession
    import spark.implicits._
    userObjs.select(col("user_id"), col("o")).as[UserObj]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(triangleHandler)
  }

  /** The lift-gated edge relation from any CoPair snapshot (pairs +
    * membership + tombstones) — shared by the triangle and k-core
    * views and the MemoryStream specs.
    */
  private def liftEdgesOfSnapshot(snap0: DataFrame): DataFrame = {
    val spark = snap0.sparkSession
    // the view self-joins the snapshot several ways - rebase on the
    // InternalRow barrier (the cooccur face's reference-dedup guard)
    val snap = org.apache.spark.sql.GraftBridge.ofInternalRows(
      spark, snap0.queryExecution.toRdd, snap0.schema)
    val dead = snap.filter(col("o1") === -1L)
      .select(col("user_id")).distinct()
    val live = snap.join(dead, Seq("user_id"), "left_anti")
      .localCheckpoint()
    val memb = live.filter(col("o2") === -2L)
      .select(col("user_id"), col("o1").as("o"))
    // eligibility = the batch el rule: >= 2 distinct accepted objects
    // (the cap bound is the tombstone's job)
    val eligible = memb.groupBy(col("user_id"))
      .agg(count(lit(1)).as("d")).filter(col("d") >= 2)
      .select(col("user_id"))
    val el = memb.join(eligible, Seq("user_id"))
    val od = el.groupBy(col("o")).agg(count(lit(1)).as("c"))
    val nu = eligible.agg(count(lit(1)).as("n"))
    val pairs = live.filter(col("o2") =!= -2L)
      .groupBy(col("o1"), col("o2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= graft.analytics.Graph.cooccurMinCnt)
    graft.analytics.Graph.liftEdges(pairs, od, nu)
  }

  /** The triangle view over any CoPair snapshot — shared by the gated
    * face and the MemoryStream spec.
    */
  def trianglesOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.trianglesFromEdges(liftEdgesOfSnapshot(snap0))

  /** The k-core view over any CoPair snapshot: the peel is an
    * evolving-answer fixpoint of the WHOLE graph (one arriving
    * interaction can re-admit a peeled node), so like the triangle
    * view it runs at query time through the batch face's shared peel.
    */
  def kcoreOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.kcoreFromEdges(liftEdgesOfSnapshot(snap0))

  private def pairSnapshot(spark: SparkSession, sfDir: String,
                           table: String): DataFrame = {
    val tuples = graft.core.Transform.extractFrom(
        StreamSum.streamingEvents(spark, sfDir))
      .select(col("s").as("user_id"), col("o"))
    StreamSum.runToTable(trianglePairStream(tuples).toDF(),
      OutputMode.Append(), table)
  }

  def streamTriangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOfSnapshot(pairSnapshot(spark, sfDir, "ss_stream_triangles"))

  def streamKcore(spark: SparkSession, sfDir: String): DataFrame =
    kcoreOfSnapshot(pairSnapshot(spark, sfDir, "ss_stream_kcore"))

  /** Streaming k-truss: edge supports are fixpoints of the WHOLE
    * lift-filtered projection (one arriving interaction can open or
    * close triangles anywhere in its endpoints' neighborhoods), so
    * the peel runs at query time over the same snapshot state as the
    * triangle and core views.
    */
  def streamKtruss(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.trussFromEdges(liftEdgesOfSnapshot(
      pairSnapshot(spark, sfDir, "ss_stream_ktruss")))

  /** The link-prediction view over any CoPair snapshot: the candidate
    * set and every Adamic-Adar weight are functions of the WHOLE
    * lift-filtered projection (one arriving interaction shifts degrees,
    * the lift gate, and the non-adjacency test), so like the triangle
    * and core views the wedge scoring runs at query time through the
    * batch face's shared `linkpredFromEdges` — never stored state.
    */
  def linkpredOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.linkpredFromEdges(liftEdgesOfSnapshot(snap0))

  def streamLinkpred(spark: SparkSession, sfDir: String): DataFrame =
    linkpredOfSnapshot(pairSnapshot(spark, sfDir, "ss_stream_linkpred"))

  /** The community view over any CoPair snapshot: the fixed-round
    * propagation is a function of the WHOLE lift-filtered projection
    * (one arriving interaction re-routes every round's votes), so the
    * assignment is a query-time view through the batch face's shared
    * `lpaFromEdges` — never stored state.
    */
  def lpaOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.lpaFromEdges(liftEdgesOfSnapshot(snap0))

  def streamLpa(spark: SparkSession, sfDir: String): DataFrame =
    lpaOfSnapshot(pairSnapshot(spark, sfDir, "ss_stream_lpa"))

  /** The modularity view over any CoPair snapshot: labels, degrees
    * and within-community edge counts are all functions of the WHOLE
    * lift-filtered projection (one arriving interaction re-routes the
    * propagation and shifts m), so the per-community report is a
    * query-time view through the batch `modularityFromEdges` — never
    * stored state.
    */
  def modularityOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.modularityFromEdges(liftEdgesOfSnapshot(snap0))

  def streamModularity(spark: SparkSession, sfDir: String): DataFrame =
    modularityOfSnapshot(pairSnapshot(spark, sfDir, "ss_stream_modularity"))

  /** The global-transitivity view over any CoPair snapshot: wedges
    * and closures are whole-projection facts, so the ratio is a
    * query-time view through the batch `transitivityFromEdges`.
    */
  def transitivityOfSnapshot(snap0: DataFrame): DataFrame =
    graft.analytics.Graph.transitivityFromEdges(
      liftEdgesOfSnapshot(snap0))

  def streamTransitivity(spark: SparkSession, sfDir: String): DataFrame =
    transitivityOfSnapshot(
      pairSnapshot(spark, sfDir, "ss_stream_transitivity"))

  /** Streaming connected components: state = the first-seen distinct
    * (s, o) pair relation (the streamDedup discipline - exact, append
    * only), with the component fixpoint an evolving answer of the
    * WHOLE graph (one arriving edge can merge two components), so the
    * labeling runs at query time over the snapshot through the batch
    * face's shared `concompFrom`.
    */
  def streamConcomp(spark: SparkSession, sfDir: String): DataFrame = {
    val snap = StreamSum.runToTable(
      graft.core.Transform.extractFrom(
          StreamSum.streamingEvents(spark, sfDir))
        .select(col("s"), col("o"))
        .dropDuplicates("s", "o"),
      OutputMode.Append(), "ss_stream_concomp")
    graft.analytics.Graph.concompFrom(spark, snap)
  }

  /** The distinct-pair stream state shared by the component, degree
    * and assortativity views (streamDedup discipline: exact,
    * append-only first-seen pairs - the minimum state ANY
    * whole-graph statistic can carry).
    */
  private def pairDedupSnapshot(spark: SparkSession, sfDir: String,
                                table: String): DataFrame =
    StreamSum.runToTable(
      graft.core.Transform.extractFrom(
          StreamSum.streamingEvents(spark, sfDir))
        .select(col("s"), col("o"))
        .dropDuplicates("s", "o"),
      OutputMode.Append(), table)

  /** Streaming degree histogram: every arriving first-seen pair shifts
    * two degrees and re-bins both nodes, so the histogram is a
    * query-time view over the pair state.
    */
  def streamDegreeDist(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.degreeDistFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_degree"))

  /** Streaming assortativity: the Pearson moments are corpus-global
    * (one pair shifts two degrees and thereby every arc's (dx, dy)
    * contribution), so the statistic is a query-time view.
    */
  def streamAssortativity(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.assortativityFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_assort"))

  /** Streaming BFS hops: reachability and distances are whole-graph
    * fixpoints (one arriving pair can shorten arbitrarily many
    * distances), so the frontier loop runs at query time.
    */
  def streamBfsHops(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.bfsHopsFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_bfs"))

  /** Streaming harmonic closeness: the landmark set and every
    * distance are whole-graph facts (one arriving pair can shorten
    * paths and even change which ids are the smallest), so the
    * multi-source loop runs at query time over the same minimal
    * distinct-pair state.
    */
  def streamHarmonic(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.harmonicFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_harmonic"))

  /** Streaming landmark betweenness: the landmark set, every distance
    * and every path count are whole-graph facts (one arriving pair
    * can create shorter paths and reroute every dependency), so both
    * Brandes sweeps run at query time over the same minimal
    * distinct-pair state.
    */
  def streamBetweenness(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.betweennessFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_betweenness"))

  /** Streaming diameter bound: both sweep endpoints and every
    * distance are whole-graph fixpoints (one arriving pair can
    * shorten arbitrarily many paths and move the farthest node), so
    * the double sweep runs at query time over the same minimal
    * distinct-pair state.
    */
  def streamDiameter(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.diameterFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_diameter"))

  /** Streaming Katz centrality: attenuated walk counts are a fixpoint
    * of the WHOLE graph (one arriving pair adds walks through every
    * node it reaches), so the truncated iteration runs at query time
    * over the same minimal distinct-pair state.
    */
  def streamKatz(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.katzFrom(graft.analytics.Graph.fwdPairs(
      pairDedupSnapshot(spark, sfDir, "ss_stream_katz")))

  /** Streaming local clustering coefficient: degrees, the lift gate
    * and every closure test are whole-projection facts (one arriving
    * pair can open or close wedges anywhere in its two endpoints'
    * neighborhoods), so the coefficient is a query-time view over the
    * distinct-pair state through the batch `lccFrom`.
    */
  def streamLcc(spark: SparkSession, sfDir: String): DataFrame =
    graft.analytics.Graph.lccFrom(
      pairDedupSnapshot(spark, sfDir, "ss_stream_lcc"))

  def streamCooccur(spark: SparkSession, sfDir: String): DataFrame = {
    val tuples = graft.core.Transform.extractFrom(
        StreamSum.streamingEvents(spark, sfDir))
      .select(col("s").as("user_id"), col("o"))
    val snap0 = StreamSum.runToTable(cooccurPairStream(tuples).toDF(),
      OutputMode.Append(), "ss_stream_cooccur")
    // the tombstone anti-join self-joins the snapshot, which trips
    // reference dedup over the memory-table relation - rebase on the
    // InternalRow barrier (same as the resample faces)
    val snap = org.apache.spark.sql.GraftBridge.ofInternalRows(
      spark, snap0.queryExecution.toRdd, snap0.schema)
    val dead = snap.filter(col("o1") === -1L)
      .select(col("user_id")).distinct()
    snap.filter(col("o1") =!= -1L)
      .join(dead, Seq("user_id"), "left_anti")
      .groupBy(col("o1"), col("o2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= graft.analytics.Graph.cooccurMinCnt)
      .orderBy(col("o1"), col("o2"))
  }
}
