package graft.analytics

import graft.SparkSpec
import graft.pipeline.ParityMath
import org.apache.spark.sql.functions._

/** Cross-engine sign-semantics fixture (VERDICT r13 "What's wrong
  * #2", corrected r15): BOTH engines' bare integer division truncates
  * toward zero (Spark `DIV`, and — contrary to r13's premise — DuckDB
  * 1.0.0 integer `//` as well: (-7)//2 = -3, measured), and both bare
  * modulos are truncated, so every time-bucket site needs the
  * EXPLICIT floor construction on BOTH faces: `ParityMath.fdivSql`
  * (Spark) paired with `ParityMath.fdivDuckSql` (oracle), plus
  * pmod-aligned modulo wherever a bucket is reduced (periodogram trig
  * join, STL hour-of-day). This spec pins the Spark half with
  * negative-epoch fixtures: fdiv must equal mathematical floor, the
  * day-bucket path must bucket 1969-12-31 into day −1 (not day 0,
  * where truncation puts it), and the periodogram must stay
  * well-formed on a series that spans the epoch; the DuckDB half is
  * pinned by the driver gate on a shifted pre-1970 corpus (r15
  * PLANS.md record — 16 time-bucket queries oracle-green with 52% of
  * events pre-epoch).
  */
class NegativeEpochSpec extends SparkSpec {

  test("fdivSql floors for any sign (bare DIV and bare // both truncate)") {
    val df = spark.range(1).selectExpr(
      s"${ParityMath.fdivSql("-1", "86400000000")} AS a",
      s"${ParityMath.fdivSql("-86400000000", "86400000000")} AS b",
      s"${ParityMath.fdivSql("-86400000001", "86400000000")} AS c",
      s"${ParityMath.fdivSql("1", "86400000000")} AS d",
      s"${ParityMath.fdivSql("86400000000", "86400000000")} AS e",
      s"${ParityMath.fdivSql("-7", "2L")} AS f")
    val r = df.head()
    assert(r.getLong(0) === -1L) // trunc would say 0
    assert(r.getLong(1) === -1L)
    assert(r.getLong(2) === -2L) // trunc would say -1
    assert(r.getLong(3) === 0L)
    assert(r.getLong(4) === 1L)
    assert(r.getLong(5) === -4L) // trunc would say -3
  }

  test("mkBuckets floors pre-1970 timestamps into negative days") {
    import spark.implicits._
    // 1969-12-31T18:00Z = epoch micros -21600000000 -> day -1;
    // 1970-01-01T06:00Z -> day 0; 1969-12-30T00:00Z -> day -2
    val ev = Seq(-21600000000L, 21600000000L, -172800000000L)
      .toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val got = TimeSeries.mkBuckets(ev)
      .orderBy("d").as[(Long, Long)].collect().toSeq
    assert(got === Seq((-2L, 1L), (-1L, 1L), (0L, 1L)))
  }

  test("periodogram trig join keeps negative days (pmod-aligned)") {
    import spark.implicits._
    // A 14-day series straddling the epoch: days -7..6, count d+8.
    // The inner join against the trig table must retain every densified
    // day (pmod(d, p) always lands in 0..p-1 even for d < 0), so the
    // DFT sums see all 14 days and n_days stays 14.
    val ev = (-7 to 6).flatMap { d =>
      Seq.fill(d + 8)(d * 86400000000L)
    }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = TimeSeries.periodogramFromBuckets(TimeSeries.mkBuckets(ev))
      .collect()
    assert(out.length === TimeSeries.periodogramPeriods.length)
    assert(out.forall(_.getLong(1) === 14L)) // n_days
    // power is finite, non-negative, and a peak exists
    assert(out.forall(_.getDouble(2) >= 0.0))
    assert(out.count(_.getBoolean(3)) >= 1)
  }

  test("stickiness window ids floor for negative days") {
    import spark.implicits._
    val du = Seq((-1L, "u1"), (0L, "u1"), (-31L, "u2"))
      .toDF("d", "user_id")
    val wins = Behavior.stickinessFromDayUsers(du)
      .select("win").as[Long].collect().toSeq.sorted
    // window size 30: day -1 -> win -1 (trunc would say 0),
    // day -31 -> win -2 (trunc: -1), day 0 -> win 0
    assert(wins === Seq(-2L, -1L, 0L))
  }
}
