package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resample semantics on a planted gap: the spine covers every bucket
  * in the key's span, gaps carry the last observation forward, and
  * nothing is invented outside the span.
  */
class TimeSeriesSpec extends SparkSpec {

  test("holt: window weights equal the per-row truncated recursion; " +
       "a constant series smooths to itself with zero trend") {
    val s = spark; import s.implicits._
    // user 1: a ramp (the trend must come out positive and the
    // forecast must overshoot the level); user 2: constant
    val vals1 = (1 to 12).map(_.toDouble)
    val rows = (vals1.zipWithIndex.map { case (v, i) =>
        (i.toLong, new java.sql.Timestamp(1000L + i), 1L, "view", v,
          """{"k": 1}""")
      } ++ (0 until 10).map { i =>
        (100L + i, new java.sql.Timestamp(1000L + i), 2L, "view", 7.5,
          """{"k": 1}""")
      }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_holt").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val byKey = TimeSeries.qHolt(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // constant user: level == value, trend == 0, forecast == value
    (0 until 10).foreach { i =>
      val (_, lvl, tr, fc) = byKey((2L, 100L + i))
      assert(lvl == 7.5 && tr == 0.0 && fc == 7.5,
        s"constant series must be a fixed point: $lvl $tr $fc")
    }
    // ramp user: per-row driver replay of the truncated recursion
    // (L=y_first, B=0, then m-1 exact 1/16 steps) must match the
    // engine's weight-table formulation
    def replay(win: Seq[Double]): (Double, Double) = {
      val vu = win.map(v => math.floor(v * 1e6 + 0.5).toLong)
      var l = BigInt(vu.head); var b = BigInt(0); var scale = BigInt(1)
      vu.tail.foreach { y =>
        val nl = 12 * l + 12 * b + 4 * scale * y
        val nb = -1 * l + 15 * b + scale * y
        l = nl; b = nb; scale *= 16
      }
      def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (q6((l.toDouble / scale.toDouble) / 1e6),
        q6((b.toDouble / scale.toDouble) / 1e6))
    }
    vals1.indices.foreach { i =>
      val win = vals1.slice(math.max(0, i - 7), i + 1)
      val (el, eb) = replay(win)
      val (m, lvl, tr, fc) = byKey((1L, i.toLong))
      assert(m == win.length)
      assert(math.abs(lvl - el) < 2e-6 && math.abs(tr - eb) < 2e-6,
        s"row $i: got ($lvl, $tr) want ($el, $eb)")
      if (i >= 1)
        assert(fc > lvl, s"ramp forecast must overshoot the level at $i")
    }
  }

  test("psi drift: hand-computed index on a planted mix shift; an " +
       "identical mix scores (near) zero") {
    val s = spark; import s.implicits._
    def eventsFor(ref: Map[String, Int], cur: Map[String, Int]): String = {
      // ref half at t in [0, 100); cur half at t in (100, 200]
      var eid = 0L
      val rows = (ref.toSeq.flatMap { case (ty, c) =>
        (0 until c).map { _ =>
          eid += 1
          (eid, new java.sql.Timestamp(1000L + eid % 90), 1L, ty, 1.0,
            """{"k": 1}""")
        }
      } ++ cur.toSeq.flatMap { case (ty, c) =>
        (0 until c).map { _ =>
          eid += 1
          (eid, new java.sql.Timestamp(1000L + 110 + eid % 90), 1L, ty,
            1.0, """{"k": 1}""")
        }
      }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_psi").toString
      rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    // drifted mix: a/b 30/10 -> 10/30
    val drift = TimeSeries.qPsiDrift(spark,
      eventsFor(Map("a" -> 30, "b" -> 10), Map("a" -> 10, "b" -> 30)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def term(c1: Long, c2: Long, n1: Long, n2: Long, k: Long): Double = {
      val p = (c1 + 1).toDouble / (n1 + k).toDouble
      val q = (c2 + 1).toDouble / (n2 + k).toDouble
      (p - q) * math.log(p / q)
    }
    val ta = term(30, 10, 40, 40, 2)
    val tb = term(10, 30, 40, 40, 2)
    assert(drift("a")._1 == 30L && drift("a")._2 == 10L)
    assert(drift("a")._3 == q6(ta) && drift("b")._3 == q6(tb))
    assert(drift("a")._4 == q6(ta + tb) && drift("a")._4 > 0.25,
      s"a 3x mix swap must read as actionable drift: $drift")
    // identical mix: every term is exactly zero (p == q)
    val stable = TimeSeries.qPsiDrift(spark,
      eventsFor(Map("a" -> 20, "b" -> 20), Map("a" -> 20, "b" -> 20)))
      .collect()
    stable.foreach { r =>
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0,
        s"identical halves must score zero: $r")
    }
  }

  test("forecast eval: exact driver replay of both error sums; the " +
       "trend model beats persistence on a ramp; constant series " +
       "yields NULL skill") {
    val s = spark; import s.implicits._
    def eventsFor(series: Map[Long, Seq[Double]]): String = {
      val rows = series.toSeq.flatMap { case (u, vs) =>
        vs.zipWithIndex.map { case (v, i) =>
          (u * 100 + i, new java.sql.Timestamp(1000L + i), u, "view", v,
            """{"k": 1}""")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_fce").toString
      rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    // exact per-row forecast replay (the holt spec's recursion)
    def forecastMu(win: Seq[Double]): Long = {
      val vu = win.map(v => math.floor(v * 1e6 + 0.5).toLong)
      var l = BigInt(vu.head); var b = BigInt(0); var scale = BigInt(1)
      vu.tail.foreach { y =>
        val nl = 12 * l + 12 * b + 4 * scale * y
        val nb = -1 * l + 15 * b + scale * y
        l = nl; b = nb; scale *= 16
      }
      math.floor(((l + b).toDouble / scale.toDouble / 1e6) * 1e6 + 0.5)
        .toLong
    }
    val ramp = (1 to 15).map(_ * 2.0)
    val wob = Seq(5.0, 4.0, 6.0, 3.0, 7.0, 5.5, 4.5)
    val tmp = eventsFor(Map(1L -> ramp, 2L -> wob))
    val got = TimeSeries.qForecastEval(spark, tmp).collect().head
    var (seH, seN, n) = (0L, 0L, 0L)
    Seq(ramp, wob).foreach { vs =>
      val mu = vs.map(v => math.floor(v * 1e6 + 0.5).toLong)
      vs.indices.dropRight(1).foreach { i =>
        val win = vs.slice(math.max(0, i - 7), i + 1)
        seH += math.abs(forecastMu(win) - mu(i + 1))
        seN += math.abs(mu(i) - mu(i + 1))
        n += 1
      }
    }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == q6(seH.toDouble / (n.toDouble * 1e6)))
    assert(got.getDouble(2) == q6(seN.toDouble / (n.toDouble * 1e6)))
    assert(got.getDouble(3) == q6(seH.toDouble / seN.toDouble))
    // where the smoother EARNS its keep: an anti-persistent
    // alternation, where naive chases every swing (error = the full
    // amplitude) while the smoothed level sits near the mean
    // (computed skill 0.678). Notably the smoother LOSES on a fast
    // ramp (the 8-window restart + 1/4 gains never escape warmup) -
    // exactly the asymmetry this backtest exists to expose.
    val altSeries = (0 until 16).map(i => if (i % 2 == 0) 3.0 else 7.0)
    val alt = TimeSeries.qForecastEval(spark,
      eventsFor(Map(1L -> altSeries))).collect().head
    assert(alt.getDouble(3) < 1.0,
      s"holt must beat persistence on anti-persistent swings: $alt")
    // constant corpus: both error sums zero -> NULL skill, zero MAEs
    val flat = TimeSeries.qForecastEval(spark,
      eventsFor(Map(1L -> Seq.fill(10)(3.0)))).collect().head
    assert(flat.getDouble(1) == 0.0 && flat.getDouble(2) == 0.0 &&
      flat.isNullAt(3))
  }

  test("autocorr: pooled lag-k pearson matches a driver replay; " +
       "pairs never cross users; alternating series flips sign by lag") {
    val s = spark; import s.implicits._
    // user 1: +/- alternation (lag-1 ACF strongly negative, lag-2
    // positive); user 2: a short ramp; user 3: ONE observation - it
    // must contribute no pair at any lag
    val series = Map(
      1L -> Seq(10.0, 2.0, 11.0, 1.0, 12.0, 3.0, 10.5, 2.5),
      2L -> Seq(1.0, 2.0, 3.0, 4.0),
      3L -> Seq(42.0))
    val rows = series.toSeq.flatMap { case (u, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (u * 100 + i, new java.sql.Timestamp(1000L + i), u, "view", v,
          """{"k": 1}""")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_acf").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = TimeSeries.qAutocorr(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def replay(k: Int): (Long, Double) = {
      val pairs = series.values.toSeq.flatMap { vs =>
        val mu = vs.map(v => math.floor(v * 1e6 + 0.5).toLong)
        mu.drop(k).zip(mu.dropRight(k))
      }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
      val c = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      (pairs.size.toLong, math.floor(c * 1e6 + 0.5) / 1e6)
    }
    (1 to TimeSeries.acfMaxLag).foreach { k =>
      val (en, ec) = replay(k)
      val (gn, gc) = got(k.toLong)
      assert(gn == en, s"lag $k pair count: got $gn want $en")
      assert(math.abs(gc - ec) < 2e-6, s"lag $k acf: got $gc want $ec")
    }
    assert(got(1L)._2 < -0.5 && got(2L)._2 > 0.5,
      "alternating series must flip ACF sign between lags 1 and 2")
  }

  test("autocorr: a constant series yields NULL acf, not an ANSI " +
       "divide-by-zero (the generator-anchor shape)") {
    val s = spark; import s.implicits._
    val rows = (0 until 20).map { i =>
      (i.toLong, new java.sql.Timestamp(1000L + i), 1L, "view", 1.0,
        """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_acf0").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = TimeSeries.qAutocorr(spark, tmp).collect()
    assert(got.length == TimeSeries.acfMaxLag)
    got.foreach { r =>
      assert(r.isNullAt(2), s"zero-variance lag must be NULL: $r")
    }
  }

  test("xcorr: a one-hour-shifted copy correlates exactly 1.0 at " +
       "lag 1; densification counts missing buckets as zero") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // type aa: hourly counts [1,2,3,4] over hours 0..3; type bb: the
    // SAME ramp one hour later (hours 1..4). The corpus spine is
    // hours 0..4, so densified aa = [1,2,3,4,0] and bb = [0,1,2,3,4]
    // - the trailing/leading zeros exist only through densification,
    // and without them lag-0 would not be exactly 0.
    def burst(et: String, hour: Int, c: Int) = (0 until c).map(i =>
      (new java.sql.Timestamp(hour * 3600000L + i), et))
    val rows = ((0 until 4).flatMap(h => burst("aa", h, h + 1)) ++
      (0 until 4).flatMap(h => burst("bb", h + 1, h + 1)))
      .toDF("ts", "event_type")
    val got = TimeSeries.xcorrFrom(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4))))
      .toMap
    assert(got(("aa", "bb", 1L)) == ((4L, 1.0)),
      "the shifted copy must correlate exactly 1.0 at its lead")
    // hand-replay lag 0: x=[1,2,3,4,0], y=[0,1,2,3,4] -> numerator
    // 5*20 - 10*10 = 0 exactly
    assert(got(("aa", "bb", 0L)) == ((5L, 0.0)))
    // reverse direction, lag 1: x=[0,1,2,3], y=[2,3,4,0] ->
    // -10/sqrt(700) = -0.377964...
    val (n, c) = got(("bb", "aa", 1L))
    assert(n == 4L && math.abs(c - (-0.377964)) < 2e-6)
  }

  test("stl: a steep linear trend cancels EXACTLY and the planted " +
       "daily pattern comes back mean-centered") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // c(t) = 5t + (24 if t%24==0 else 0) over hours 0..71. The 2x24
    // centered MA reproduces a linear trend exactly at the center, so
    // D48(t) = 48*p(t%24) - 2*sum(pattern) regardless of the slope:
    // hod 0 -> 23.0, every other hod -> -1.0, each over 2 full-window
    // cells (t in [12, 59]).
    val rows = (0 until 72).flatMap { t =>
      val c = 5 * t + (if (t % 24 == 0) 24 else 0)
      (0 until c).map(i => new java.sql.Timestamp(t * 3600000L + i))
    }.map(Tuple1(_)).toDF("ts")
    val got = TimeSeries.stlFrom(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.size == 24)
    assert(got(0L) == ((2L, 2208L, 23.0)))
    (1L until 24L).foreach { h =>
      assert(got(h) == ((2L, -96L, -1.0)),
        s"hod $h must carry the exact mean-centered pattern")
    }
  }

  test("mad: lower-median baseline flags only the gross outlier; the " +
       "MAD collapse on a half-constant history flags every deviant") {
    val s = spark; import s.implicits._
    // user 1: values [1,2,3,100] -> med 2e6 (rank (4+1)//2 = 2 of the
    // sorted values), deviations [1e6,0,1e6,98e6] -> mad 1e6; only
    // 98e6 > 3e6 flags. user 2: [5,5,5,7] -> med 5e6, mad 0 -> the 7
    // flags on ANY positive deviation (the documented collapse).
    val ev = Seq(
      (10L, 1L, 1.0), (11L, 1L, 2.0), (12L, 1L, 3.0), (13L, 1L, 100.0),
      (20L, 2L, 5.0), (21L, 2L, 5.0), (22L, 2L, 5.0), (23L, 2L, 7.0))
      .map { case (eid, u, v) =>
        (eid, new java.sql.Timestamp(1000L + eid), u, "view", v, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.qMad(spark, dir).collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 13L, 100.0, 2000000L, 1000000L, 98000000L),
      Seq(2L, 23L, 7.0, 5000000L, 0L, 2000000L)), s"mad report: $got")
  }

  test("mannkendall: sign pairs count over the DENSIFIED daily series " +
       "(a gap day is an observed zero), ties excluded from both sides") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // days 0,1,3 observed at 1,5,2 -> densified series [1,5,0,2]:
    // pairs (1,5)+ (1,0)- (1,2)+ (5,0)- (5,2)- (0,2)+ -> S = 0 exactly
    // BECAUSE the gap day counts as zero (dropping it would give S=1).
    val mixed = TimeSeries.mkFromBuckets(
        Seq((0L, 1L), (1L, 5L), (3L, 2L)).toDF("d", "c"))
      .collect().head
    assert(mixed.toSeq.take(5) == Seq(4L, 6L, 3L, 3L, 0L))
    assert(mixed.getDouble(5) == 0.0)
    // strictly increasing -> every pair concordant, tau exactly 1
    val up = TimeSeries.mkFromBuckets(
        (0L to 3L).map(d => (d, d + 1)).toDF("d", "c"))
      .collect().head
    assert(up.toSeq.take(5) == Seq(4L, 6L, 6L, 0L, 6L))
    assert(up.getDouble(5) == 1.0)
    // all-tied series -> S = 0 with zero concordant AND discordant
    val flat = TimeSeries.mkFromBuckets(
        (0L to 2L).map(d => (d, 7L)).toDF("d", "c"))
      .collect().head
    assert(flat.toSeq.take(5) == Seq(3L, 3L, 0L, 0L, 0L))
  }

  test("cusum: the closed form equals Page's sequential recursion on " +
       "a planted level shift and an oscillator; excursion ties break " +
       "to the earliest day") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // level drop 5,5,5 -> 1,1,1: scaled deviations [12x3, -12x3],
    // P = [12,24,36,24,12,0] -> up peaks 36 EXACTLY at the last day
    // of the old level (day 2); down grows to 36 at the series end
    val shift = TimeSeries.cusumFromBuckets(
        (0L to 5L).map(d => (d, if (d < 3) 5L else 1L)).toDF("d", "c"))
      .collect().head
    assert(shift.toSeq == Seq(6L, 2L, 36L, 5L, 36L), s"${shift.toSeq}")
    // oscillator 1,5,1,5: P = [-8,0,-8,0]; Page's recursion
    // S+ = [0,8,0,8] -> tie at days 1 and 3 resolves to day 1;
    // S- peaks 8 at day 0
    val osc = TimeSeries.cusumFromBuckets(
        Seq((0L, 1L), (1L, 5L), (2L, 1L), (3L, 5L)).toDF("d", "c"))
      .collect().head
    assert(osc.toSeq == Seq(4L, 1L, 8L, 0L, 8L), s"${osc.toSeq}")
    // and the closed form IS the recursion, checked directly
    val cs = Seq(1L, 5L, 1L, 5L)
    val dd = cs.map(c => 4 * c - 12)
    val pageUp = dd.scanLeft(0L)((acc, x) => math.max(0L, acc + x)).tail
    assert(pageUp == Seq(0L, 8L, 0L, 8L))
  }

  test("theilsen: median of the 10 pairwise slopes and the residual " +
       "median intercept, hand-computed; the gap day participates " +
       "as an observed zero") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // series [1,3,2,4,10] on days 0..4 -> slopes sorted
    // [-1,.5,.5,1,2,2,2.25,3.5,4,6], rank (10+1)//2 = 5 -> 2.0;
    // residuals c - 2d = [1,1,-2,-2,2] -> sorted rank 3 -> 1.0
    val a = TimeSeries.theilsenFromBuckets(
        Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 4L), (4L, 10L))
          .toDF("d", "c"))
      .collect().head
    assert(a.toSeq == Seq(5L, 10L, 2.0, 1.0), s"theilsen: ${a.toSeq}")
    // days {0, 2} observed [1, 5] -> densified [1,0,5]: slopes
    // [-1, 2, 5] -> median 2; residuals [1,-2,1] -> median 1
    val b = TimeSeries.theilsenFromBuckets(
        Seq((0L, 1L), (2L, 5L)).toDF("d", "c"))
      .collect().head
    assert(b.toSeq == Seq(3L, 3L, 2.0, 1.0), s"gap case: ${b.toSeq}")
  }

  test("trimmed mean: the planted outlier moves the mean, not the " +
       "trimmed mean; small groups trim nothing") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // type a: 10 values, 9 ones + one 1000 -> k=1 trims both ends:
    // kept = 8 ones -> trimmed 1e6 exactly; mean (9 + 1000)/10 =
    // 100.9e6. type b: 3 values -> k=0, nothing trimmed.
    val ev = ((1 to 9).map(i => (i.toLong, "a", 1.0)) :+
        (10L, "a", 1000.0)) ++
      Seq((21L, "b", 2.0), (22L, "b", 4.0), (23L, "b", 9.0))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trim").toString
    ev.map { case (eid, t, v) =>
        (eid, new java.sql.Timestamp(1000L + eid), eid, t, v, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tpch.qTrimmedMean(spark, dir).collect()
      .map(_.toSeq).toSeq
    assert(got == Seq(
      Seq("a", 10L, 1L, 8L, 100900000L, 1000000L),
      Seq("b", 3L, 0L, 3L, 5000000L, 5000000L)),
      s"trimmed mean: $got")
  }

  test("pacf: Durbin-Levinson cuts off after lag 1 on an exact AR(1) " +
       "acf; a missing lag NULLs every deeper coefficient") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // r_k = 0.5^k (binary-exact): phi_11 = .5, every deeper phi_kk
    // is exactly 0 - the AR(1) signature the op exists to reveal
    val acf = Seq((1L, 10L, 0.5), (2L, 10L, 0.25),
      (3L, 10L, 0.125), (4L, 10L, 0.0625))
      .toDF("lag", "n_pairs", "acf")
    val got = TimeSeries.pacfFromAcf(spark, acf).collect()
      .map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 0.5, 0.5), Seq(2L, 0.25, 0.0),
      Seq(3L, 0.125, 0.0), Seq(4L, 0.0625, 0.0)), s"pacf: $got")
    // lag 3 missing -> phi_33 and phi_44 undefined, shallower intact
    val holed = Seq((1L, 10L, 0.5), (2L, 10L, 0.25), (4L, 10L, 0.0625))
      .toDF("lag", "n_pairs", "acf")
    val g2 = TimeSeries.pacfFromAcf(spark, holed).collect()
    assert(g2(0).getDouble(2) == 0.5 && g2(1).getDouble(2) == 0.0)
    assert(g2(2).isNullAt(1) && g2(2).isNullAt(2) && g2(3).isNullAt(2),
      s"hole must propagate: ${g2.toSeq}")
  }

  test("runs test: lower-median split, tie days dropped, run count " +
       "and z hand-computed; one-sided splits yield no verdict") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // series [5,1,1,5,5,1,3] -> sorted (c,d) rank (7+1)//2 = 4 picks
    // med 3 (day 6 drops as the tie); signs by day [1,0,0,1,1,0] ->
    // 4 runs; n1 = n2 = 3 -> E[R] = 4 exactly -> z = 0
    val a = TimeSeries.runsFromBuckets(
        Seq((0L, 5L), (1L, 1L), (2L, 1L), (3L, 5L), (4L, 5L),
          (5L, 1L), (6L, 3L)).toDF("d", "c"))
      .collect().head
    assert(a.toSeq.take(5) == Seq(7L, 3L, 3L, 3L, 4L), s"${a.toSeq}")
    assert(a.getDouble(5) == 0.0, s"balanced runs must z at 0: $a")
    // clustered [9,9,9,1,0,0,0]: med 1, signs [1,1,1,0,0,0] -> 2 runs,
    // z = (2 - 4)/sqrt(1.2) q6 exactly
    val b = TimeSeries.runsFromBuckets(
        Seq((0L, 9L), (1L, 9L), (2L, 9L), (3L, 1L), (4L, 0L),
          (5L, 0L), (6L, 0L)).toDF("d", "c"))
      .collect().head
    assert(b.toSeq.take(5) == Seq(7L, 1L, 3L, 3L, 2L), s"${b.toSeq}")
    val zExp = math.floor(-2.0 / math.sqrt(1.2) * 1e6 + 0.5) / 1e6
    assert(b.getDouble(5) == zExp, s"clustered z: ${b.getDouble(5)}")
    // one-sided split [5,1,5,1]: med 1 -> only above-days survive
    // (n_below = 0) -> the statistic is undefined, z NULL
    val c = TimeSeries.runsFromBuckets(
        Seq((0L, 5L), (1L, 1L), (2L, 5L), (3L, 1L)).toDF("d", "c"))
      .collect().head
    assert(c.toSeq.take(5) == Seq(4L, 1L, 2L, 0L, 1L), s"${c.toSeq}")
    assert(c.isNullAt(5), s"one-sided split must yield NULL z: $c")
  }

  test("periodogram: exact integer replay of the trig-table fold on a " +
       "planted weekly cycle; the 7-day line is the peak") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // two full weeks of a pure 7-day pulse: c = 10 on d%7==0, else 3
    val series = (0L to 13L).map(d => (d, if (d % 7 == 0) 10L else 3L))
    val got = TimeSeries.periodogramFromBuckets(series.toDF("d", "c"))
      .collect()
    // independent replay in BigInt off the SAME shared trig table:
    // c' = n*c - T (n=14, T=56), A/B per period, power = A^2 + B^2
    val trig = TimeSeries.periodogramTrig
      .map { case (p, r, cq, sq) => (p, r) -> ((cq, sq)) }.toMap
    val exp = TimeSeries.periodogramPeriods.map { p =>
      var a = BigInt(0); var b = BigInt(0)
      series.foreach { case (d, c) =>
        val cp = BigInt(14L * c - 56L)
        val (cq, sq) = trig((p, (d % p).toInt))
        a += cp * cq; b += cp * sq
      }
      p.toLong -> (a * a + b * b)
    }.toMap
    val peak = exp.values.max
    assert(got.length == 3)
    got.foreach { r =>
      val period = r.getLong(0)
      assert(r.getLong(1) == 14L, s"n_days: $r")
      // the face emits the exact integer cast to DOUBLE (the round-14
      // hash-stable output type); the fixture's powers are well within
      // double-exact range, so the comparison is still exact
      assert(r.getDouble(2) == exp(period).toDouble,
        s"power at $period: $r")
      assert(r.getBoolean(3) == (exp(period) == peak), s"peak flag: $r")
    }
    // and the physics: the planted cycle's line dominates
    assert(exp(7L) == peak && exp(7L) > exp(14L) && exp(7L) > exp(30L),
      s"7-day line must dominate: $exp")
  }

  test("trending: lift ranks recent-vs-prior day counts; older-only " +
       "objects are excluded") {
    val s = spark; import s.implicits._
    val dayNs = TimeSeries.decayHalflifeUs * 1000L
    // day_max = 2. o=1: 4 recent / 1 prev -> (5)e6/2 = 2_500_000;
    // o=2: 2 recent / 0 prev -> 3_000_000; o=3: 0 recent / 3 prev ->
    // 250_000; o=5: day-0 only -> excluded entirely.
    val rows = Seq(
      (1L, 2L, 4), (1L, 1L, 1),
      (2L, 2L, 2),
      (3L, 1L, 3),
      (5L, 0L, 2)).flatMap { case (o, day, n) =>
      (0 until n).map(i => (o * 100 + day * 10 + i,
        day * dayNs + (o * 100 + i) * 1000L, 1L, "view", 1.0,
        s"""{"k": $o}"""))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_tr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.qTrending(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (2L, 2L, 0L, 3000000L),
      (1L, 4L, 1L, 2500000L),
      (3L, 0L, 3L, 250000L)), s"trending report wrong: $got")
  }

  test("resample: gaps generated, last observation carried forward") {
    val s = spark; import s.implicits._
    val bUs = TimeSeries.resampleBucketUs
    // user 1: events in buckets 0 and 3 (gap at 1, 2); user 2: one
    // event only (span of one bucket, no gaps)
    val ev = Seq(
      (10L, 0L * bUs * 1000L, 1L),
      (11L, (0L * bUs + 5L) * 1000L, 1L),
      (12L, 3L * bUs * 1000L, 1L),
      (20L, 7L * bUs * 1000L, 2L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rs").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.qResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 7L)), s"spine must cover exactly each key's span: ${rows.keySet}")
    assert(rows((1L, 0L)) == ((2L, 11L, false)))
    assert(rows((1L, 1L)) == ((0L, 11L, true)),
      "gap bucket must carry the last observed event id forward")
    assert(rows((1L, 2L)) == ((0L, 11L, true)))
    assert(rows((1L, 3L)) == ((1L, 12L, false)))
    assert(rows((2L, 7L)) == ((1L, 20L, false)))
  }

  test("resample interp: gap values interpolate linearly between the " +
       "surrounding observations, exactly") {
    val s = spark; import s.implicits._
    val bUs = TimeSeries.resampleBucketUs
    // user 1: observed 2.0 in bucket 0 (the LATER event 11 wins the
    // bucket anchor) and 8.0 in bucket 3 -> gaps at 1, 2 interpolate
    // to 4.0 and 6.0; user 2: single bucket, no gaps
    val ev = Seq(
      (10L, 0L * bUs * 1000L, 1L, 7.5),
      (11L, (0L * bUs + 5L) * 1000L, 1L, 2.0),
      (12L, 3L * bUs * 1000L, 1L, 8.0),
      (20L, 7L * bUs * 1000L, 2L, 5.25))
      .toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rsi").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.qResampleInterp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rows.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 7L)))
    assert(rows((1L, 0L)) == ((2L, 2.0, false)),
      "bucket anchor must be the LAST observation (max event_id)")
    assert(rows((1L, 1L)) == ((0L, 4.0, true)),
      "gap at 1/3 of the span must be prev + (next-prev)/3, exactly")
    assert(rows((1L, 2L)) == ((0L, 6.0, true)))
    assert(rows((1L, 3L)) == ((1L, 8.0, false)))
    assert(rows((2L, 7L)) == ((1L, 5.25, false)))
  }

  test("ewma: truncated alpha=1/4 weights, exact at the warm-up edge") {
    val s = spark; import s.implicits._
    // user 1: 3.5 then 7.0 -> first row is its own value; second is
    // (4*7.0 + 3*3.5)/7 = 5.5 exactly (m=2 weights 4,3 over 4^2-3^2).
    // user 2: ten equal observations -> EWMA is the constant at every
    // length, including past the 8-observation truncation.
    val ev = (Seq((10L, 1000L, 1L, 3.5), (11L, 2000L, 1L, 7.0)) ++
      (0 until 10).map(i => (20L + i, (i + 1) * 1000L, 2L, 2.25)))
      .toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ew").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.qEwma(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(10L) == ((1L, 3.5)), "m=1 must return the value itself")
    assert(rows(11L) == ((2L, 5.5)), "m=2 must be (4*v0+3*v1)/7 exactly")
    (0 until 10).foreach { i =>
      assert(rows(20L + i) == ((math.min(i + 1, TimeSeries.ewmaLen).toLong,
        2.25)), s"constant series must smooth to itself at obs $i")
    }
  }

  test("anomaly: 3-sigma verdict on the trailing baseline, min-n gate") {
    val s = spark; import s.implicits._
    // user 1: four identical baseline values then a spike -> the spike
    // (zero baseline variance, nonzero deviation) is anomalous; a fifth
    // equal value (zero deviation) is not. user 2: three observations
    // then a wild value -> baseline too small (n=3 < 4), no verdict.
    val ev = (Seq(1.0, 1.0, 1.0, 1.0, 100.0, 1.0).zipWithIndex.map {
      case (v, i) => (10L + i, (i + 1) * 1000L, 1L, v)
    } ++ Seq(1.0, 2.0, 3.0, 500.0).zipWithIndex.map {
      case (v, i) => (20L + i, (i + 1) * 1000L, 2L, v)
    }).toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_an").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = TimeSeries.qAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 14L, 4L)),
      s"only the spike with a full baseline may be flagged: ${rows.toSeq}")
  }

  test("seasonality: pure integer epoch cells (epoch day 0 = Thursday), " +
       "lift normalizes against a uniform week") {
    val s = spark; import s.implicits._
    val hourNs = 3600L * 1000000000L
    // 3 events Thu 00h, 1 event Thu 01h; 2 events Fri 02h (day 1)
    val rows = Seq(
      (1L, 0L * hourNs), (2L, 0L * hourNs + 7L), (3L, 0L * hourNs + 9L),
      (4L, 1L * hourNs),
      (5L, 26L * hourNs), (6L, 26L * hourNs + 5L))
      .map { case (id, ns) => (id, ns, 1L, "view", 1.0, "{}") }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_sea").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.qSeasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (4L, 0L, 3L, 84.0), (4L, 1L, 1L, 28.0), (5L, 2L, 2L, 56.0)),
      s"seasonality cells wrong: $got")
  }

  test("changepoint: the best mean-shift split is flagged, scores are " +
       "exact prefix/suffix mean gaps") {
    val s = spark; import s.implicits._
    val dayNs = 86400L * 1000000000L
    // daily counts: 2, 2, 2, 10, 10 -> best split after day index 2
    // (mean 2 vs 10, gap 8); other splits have smaller gaps
    val rows = (Seq.fill(2)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(2)(2L) ++
      Seq.fill(10)(3L) ++ Seq.fill(10)(4L)).zipWithIndex
      .map { case (day, i) =>
        (i.toLong, day * dayNs + i * 1000L, 1L, "view", 1.0, "{}") }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_cp").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TimeSeries.qChangepoint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    // splits: after d0 |2-6|=4; d1 |2-22/3|≈5.333333; d2 |2-10|=8 (max);
    // d3 |4-10|=6.  Last day is not a split.
    assert(got == Seq(
      (0L, 2L, 4.0, false), (1L, 2L, 5.333333, false),
      (2L, 2L, 8.0, true), (3L, 10L, 6.0, false)),
      s"changepoint scan wrong: $got")
  }

  test("sax: a linear ramp symbolizes to the quartile word aabbccdd; " +
       "a constant series is all-c with exact PAA means") {
    val s = spark; import s.implicits._
    val rows = ((0 until 80).map { i =>
      (i.toLong, new java.sql.Timestamp(1000L + i), 1L, "view",
        (i + 1).toDouble, """{"k": 1}""")
    } ++ (0 until 16).map { i =>
      (200L + i, new java.sql.Timestamp(1000L + i), 2L, "view", 42.5,
        """{"k": 1}""")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sax").toString
    rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries.qSax(spark, tmp).collect()
    // ramp: 8 equal segments whose mid z-scores are +-1.52, +-1.08,
    // +-0.65, +-0.22 against the +-0.6745 quartile breakpoints
    val u1 = r.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(u1.map(_.getString(4)).mkString == "aabbccdd")
    assert(u1.forall(_.getLong(2) == 10L))
    assert(u1.head.getDouble(3) == 5.5) // mean(1..10)
    assert(u1.last.getDouble(3) == 75.5) // mean(71..80)
    // constant series: z = 0 everywhere -> every segment 'c'
    val u2 = r.filter(_.getLong(0) == 2L)
    assert(u2.nonEmpty && u2.forall(_.getString(4) == "c"))
    assert(u2.forall(_.getDouble(3) == 42.5))
    // word face: the two users land in two distinct shape cohorts
    val w = TimeSeries.qSaxWord(spark, tmp).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(w("aabbccdd") == ((1L, 1L)))
    assert(w("cccccccc") == ((1L, 2L)))
  }


  test("holt-winters: an exact weekly pattern is a fixed point (level " +
       "= mean, trend 0, season = offsets, forecast reproduces the " +
       "pattern); a constant series forecasts itself") {
    val s = spark; import s.implicits._
    val pat = Seq(7, 14, 21, 28, 35, 42, 49) // sum 196 = 7 * 28
    val rows = (for {
      d <- 0 until 21
      i <- 0 until pat(d % 7)
    } yield (d * 1000L + i, new java.sql.Timestamp(
        d * 86400000L + i * 1000L), 1L, "view", 1.0, """{"k": 1}""")) ++
      (for { d <- 0 until 21; i <- 0 until 5 } yield
        (900000L + d * 100L + i, new java.sql.Timestamp(
          d * 86400000L + i * 1000L), 2L, "click", 1.0, """{"k": 1}"""))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries.qHoltWinters(spark, tmp).collect()
      .map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))).toMap
    for (t <- 7 until 21) {
      val (n, lvl, tr, seas, fc) = r(("view", t.toLong))
      assert(n == pat(t % 7) && lvl == 28000000L && tr == 0L &&
        seas == (pat(t % 7) - 28) * 1000000L &&
        fc == pat(t % 7) * 1000000L,
        s"day $t: ($n, $lvl, $tr, $seas, $fc)")
      val (nc, lc, tc, sc, fcc) = r(("click", t.toLong))
      assert(nc == 5 && lc == 5000000L && tc == 0L && sc == 0L &&
        fcc == 5000000L, s"constant day $t: ($nc, $lc, $tc, $sc, $fcc)")
    }
  }

  test("dtw: identical shapes are distance 0, a one-day shift warps " +
       "to the boundary cost while Euclidean pays every day, and the " +
       "pair list is the sorted type cross") {
    val s = spark; import s.implicits._
    // 8 days: 'view' pattern P = 1,5,1,5,...; 'click' = P shifted by
    // one day; 'error' = an exact copy of 'view'
    val pat = Seq(1, 5, 1, 5, 1, 5, 1, 5)
    def mk(et: String, off: Int, base: Long) = for {
      d <- 0 until 8
      i <- 0 until pat((d + off) % 8)
    } yield (base + d * 1000L + i, new java.sql.Timestamp(
        d * 86400000L + i * 1000L), 1L, et, 1.0, """{"k": 1}""")
    val rows = mk("view", 0, 0L) ++ mk("click", 1, 100000L) ++
      mk("error", 0, 200000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dtw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries.qDtw(spark, tmp).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    assert(r.keySet == Set(("click", "error"), ("click", "view"),
      ("error", "view")), s"pairs: ${r.keySet}")
    assert(r(("error", "view"))._1 == 0L, "identical series warp free")
    // the shifted copy aligns everywhere except the unmatchable
    // boundary: DTW = |5-1| at each end = 8, vs Euclidean 8 days x 4
    assert(r(("click", "view"))._1 == 8L,
      s"shifted pair: ${r(("click", "view"))}")
    assert(r.values.forall(_._2 == 8L), "densified span is 8 days")
  }

  test("burstiness: a constant series is exactly 0, a one-day burst is " +
       "the closed-form N(n-1)/n, and the densified span counts the " +
       "burst type's silent days") {
    val s = spark; import s.implicits._
    // 'view': 2/day for 5 days (constant); 'click': 10 events all on
    // day 0, silent for the other 4 densified days
    val rows = (for { d <- 0 until 5; i <- 0 until 2 } yield
        (d * 100L + i, new java.sql.Timestamp(d * 86400000L + i * 1000L),
          1L, "view", 1.0, """{"k": 1}""")) ++
      (for { i <- 0 until 10 } yield
        (9000L + i, new java.sql.Timestamp(i * 1000L),
          2L, "click", 1.0, """{"k": 1}"""))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_burst").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries.qBurstiness(spark, tmp).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4)))
      .toMap
    assert(r("view") == ((5L, 10L, 0.0, false)),
      s"constant: ${r("view")}")
    // Fano = N(n-1)/n = 10*4/5 = 8 exactly
    assert(r("click") == ((5L, 10L, 8.0, true)),
      s"burst: ${r("click")}")
  }

}
