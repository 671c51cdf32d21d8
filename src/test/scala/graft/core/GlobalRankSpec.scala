package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The range-partitioned partition-offset rank: must reproduce
  * window-rank semantics exactly — including heavy ties that straddle
  * range-partition boundaries — without ever planning a single-task
  * window.
  */
class GlobalRankSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("o_custkey", "last_us", "frequency", "monetary_cents")
  }

  test("withRank == row_number over the same total order, under ties " +
       "straddling partitions") {
    val s = spark; import s.implicits._
    // 1000 rows, only 5 distinct values: every range partition holds
    // one or two giant tie groups, so the tie-break key does the work
    val rows = (0L until 1000L).map(i => (i, i % 5, i % 3, i % 7))
    val (ranked, n) = GlobalRank.withRank(df(rows),
      Seq(col("last_us").asc, col("o_custkey").asc), "rk")
    assert(n == 1000L)
    val got = ranked.select("o_custkey", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    assert(got == expected)
  }

  test("withPrefixSum == exclusive window cumsum over the same order, " +
       "with value groups straddling partitions") {
    val s = spark; import s.implicits._
    val rows = (0L until 1000L).map(i => (i, (i * 13) % 97 + 1))
    val in = rows.toDF("k", "v")
    val (summed, total) = GlobalRank.withPrefixSum(
      in, Seq(col("k").asc), "v", "below")
    assert(total == rows.map(_._2).sum)
    val got = summed.select("k", "below").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (k, v) =>
      val e = k -> acc; acc += v; e
    }.toMap
    assert(got == expected)
  }

  test("withPrefixSums == chaining withPrefixSum per column, one " +
       "shuffle, totals match") {
    val s = spark; import s.implicits._
    val rows = (0L until 800L).map(i =>
      (i, (i * 13) % 97 + 1, (i * 7) % 31 - 15, (i * 29) % 11))
    val in = rows.toDF("k", "a", "b", "c")
    val (multi, totals) = GlobalRank.withPrefixSums(in,
      Seq(col("k").asc), Seq("a", "b", "c"), Seq("pa", "pb", "pc"))
    assert(totals == Seq(rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(_._4).sum), s"totals: $totals")
    // reference: three chained single-column passes
    val (c1, t1) = GlobalRank.withPrefixSum(in, Seq(col("k").asc),
      "a", "ra")
    val (c2, t2) = GlobalRank.withPrefixSum(c1, Seq(col("k").asc),
      "b", "rb")
    val (c3, t3) = GlobalRank.withPrefixSum(c2, Seq(col("k").asc),
      "c", "rc")
    assert(Seq(t1, t2, t3) == totals)
    val got = multi.select("k", "pa", "pb", "pc").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val ref = c3.select("k", "ra", "rb", "rc").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got == ref, "multi-column pass must equal the chained passes")
  }

  test("loudBound passes in-bounds values through unchanged and FIRES " +
       "on a violation (the guard is not decorative)") {
    val s = spark; import s.implicits._
    val ok = Seq(5L, -2000000L, 2000000L).toDF("c")
      .select(graft.pipeline.ParityMath.loudBound(col("c"), 2000000L,
        "spec bound").as("c"))
      .collect().map(_.getLong(0)).toSet
    assert(ok == Set(5L, -2000000L, 2000000L))
    val err = intercept[Exception] {
      Seq(2000001L).toDF("c")
        .select(graft.pipeline.ParityMath.loudBound(col("c"), 2000000L,
          "spec bound").as("c"))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(err).contains("spec bound"),
      s"the raise_error message must name the bound: ${rootMsg(err)}")
  }

  test("longAxisRanks == three independent window ranks, one shuffle") {
    val s = spark; import s.implicits._
    val rows = (0L until 500L).map(i =>
      (i, (i * 7) % 50, (i * 3) % 20, (i * 11) % 100))
    val (ranks, n, maxs) = GlobalRank.longAxisRanks(df(rows), "o_custkey",
      Seq("last_us", "frequency", "monetary_cents"),
      Seq("r1", "r2", "r3"))
    assert(n == 500L)
    assert(maxs == Seq(49L, 19L, 99L))
    val got = ranks.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    def rankOf(metric: ((Long, Long, Long, Long)) => Long)
        : Map[Long, Long] =
      rows.sortBy(r => (metric(r), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val (e1, e2, e3) = (rankOf(_._2), rankOf(_._3), rankOf(_._4))
    assert(got.forall { case (k, (a, b, c)) =>
      e1(k) == a && e2(k) == b && e3(k) == c
    })
  }

  test("empty input: zero rows, zero count, no crash") {
    val (ranked, n) = GlobalRank.withRank(
      df(Seq.empty), Seq(col("last_us").asc), "rk")
    assert(n == 0L && ranked.count() == 0L)
    val (ranks, n2, _) = GlobalRank.longAxisRanks(df(Seq.empty),
      "o_custkey", Seq("last_us"), Seq("r1"))
    assert(n2 == 0L && ranks.count() == 0L)
  }

  test("skyline frontier survives tie groups straddling partitions") {
    val s = spark; import s.implicits._
    // many customers sharing few (frequency, monetary) points: the
    // skyline must keep ALL duplicates of undominated points and drop
    // every strictly-dominated one, regardless of which partition a
    // duplicate landed in. Points: (f, m) over a 3x3 grid; skyline of
    // the grid = the anti-diagonal maxima {(2,2)} plus nothing else
    // dominates... actually (2,2) dominates all, so only its
    // duplicates survive.
    val rows = (0L until 900L).map { i =>
      val f = i % 3; val m = (i / 3) % 3
      (i, 0L, f, m)
    }
    val got = graft.analytics.Segmentation.skylineFrom(
        df(rows).select(col("o_custkey"), col("frequency"),
          col("monetary_cents")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expectedIds = rows.filter(r => r._3 == 2 && r._4 == 2).map(_._1)
    assert(got.map(_._1).toSet == expectedIds.toSet,
      s"skyline must be exactly the (2,2) duplicates, got ${got.length}")
    assert(got.forall(r => r._2 == 2L && r._3 == 2L))
  }
}
