package graft.analytics

import graft.SparkSpec

/** RFM quintile math and histogram/CDF semantics on planted fixtures —
  * the integer rank formula (`1 + (rn-1)*5 DIV n`) is pinned here so a
  * drift toward engine-defined ntile placement would fail loudly.
  */
class SegmentationSpec extends SparkSpec {

  test("rfm: per-customer rollup + integer quintile scores; monetary " +
       "sums exact cents") {
    val s = spark; import s.implicits._
    val dayNs = 86400L * 1000000000L
    // 5 customers, deliberately DIFFERENT orderings per dimension:
    // custkey: last day   #orders  total cents
    //   1        d4 (newest) 1      100.00
    //   2        d3          2      50.01
    //   3        d2          3      30.00
    //   4        d1          4      20.00
    //   5        d0 (oldest) 5      10.02
    val orders = Seq(
      (1L, 4L, 100.00),
      (2L, 3L, 25.00), (2L, 2L, 25.01),
      (3L, 2L, 10.00), (3L, 1L, 10.00), (3L, 0L, 10.00),
      (4L, 1L, 5.00), (4L, 0L, 5.00), (4L, 0L, 5.00), (4L, 0L, 5.00),
      (5L, 0L, 2.00), (5L, 0L, 2.00), (5L, 0L, 2.00), (5L, 0L, 2.00),
      (5L, 0L, 2.02))
      .zipWithIndex.map { case ((ck, day, price), i) =>
        (i.toLong + 1, ck, "O", price, day * dayNs, "1-URGENT") }
    val df = orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    df.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Segmentation.qRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toSeq
    // n=5 so each rank is its own quintile: recency score 5 = newest;
    // frequency/monetary score 5 = largest
    assert(got == Seq(
      (1L, 0L, 1L, 10000L, 5L, 1L, 5L, "515"),
      (2L, 1L, 2L, 5001L, 4L, 2L, 4L, "424"),
      (3L, 2L, 3L, 3000L, 3L, 3L, 3L, "333"),
      (4L, 3L, 4L, 2000L, 2L, 4L, 2L, "242"),
      (5L, 4L, 5L, 1002L, 1L, 5L, 1L, "151")),
      s"rfm scores wrong: $got")
  }

  test("skyline: strict dominance removes, exact duplicates survive, " +
       "frequency ties resolved by the per-f max") {
    val s = spark; import s.implicits._
    // per-customer (frequency, monetary): orders fan out to match
    //  c1 (5, 10.00)  skyline (highest f)
    //  c2 (3, 20.00)  skyline (beats everything with f<=3 on m)
    //  c3 (3, 20.00)  skyline (exact duplicate of c2 - both stay)
    //  c4 (3,  5.00)  dominated by c1 (f 5>3, m 10>=5)
    //  c5 (1, 15.00)  dominated by c2 (f 3>1, m 20>=15)
    val spec = Seq(
      (1L, 5, 1000L), (2L, 3, 2000L), (3L, 3, 2000L),
      (4L, 3, 500L), (5L, 1, 1500L))
    val orders = spec.flatMap { case (ck, n, totCents) =>
      // n orders summing to totCents: n-1 zero-ish orders + remainder
      (1 to n).map { i =>
        val cents = if (i == n) totCents - (n - 1) else 1L
        (ck * 100 + i, ck, "O", cents / 100.0, 1000000000L, "1-URGENT")
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("graft_sky").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Segmentation.qSkyline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 5L, 1000L), (2L, 3L, 2000L), (3L, 3L, 2000L)),
      s"skyline wrong: $got")
  }

  test("histogram: fixed-width buckets, exact cumulative distribution") {
    val s = spark; import s.implicits._
    // width 5000: prices land in buckets 0 (x2), 1 (x1), 3 (x1)
    val li = Seq(901.82, 4999.99, 5000.0, 17500.0)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Tpch.qHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 0.0, 2L, 2L, 0.5), (1L, 5000.0, 1L, 3L, 0.75),
      (3L, 15000.0, 1L, 4L, 1.0)),
      s"histogram cells wrong: $got")
  }

  test("benford: exact digit extraction (sub-cent and zero values " +
       "excluded), observed frequencies and chi-square recompute, " +
       "all nine digits always emitted") {
    val s = spark; import s.implicits._
    // values 1.00 x2, 2.00, 0.55 (digit 5), 12.31 (digit 1),
    // 0.004 (cents 0 - excluded), -3.0 and null (excluded)
    val rows = Seq(
      (0L, 1.00), (1L, 1.00), (2L, 2.00), (3L, 0.55), (4L, 12.31),
      (5L, 0.004), (6L, -3.0))
      .map { case (i, v) =>
        (i, new java.sql.Timestamp(1000L + i), 1L, "view", v, """{"k":1}""")
      }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_benford").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tpch.qBenford(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == (1L to 9L), "all nine digit rows")
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val n = Map(1L -> 3L, 2L -> 1L, 5L -> 1L).withDefaultValue(0L)
    val total = 5.0
    got.foreach { case (d, cnt, obs, exp, chi) =>
      assert(cnt == n(d), s"digit $d count")
      assert(obs == q6(cnt / total), s"digit $d obs")
      val e = math.log10(1.0 + 1.0 / d)
      assert(exp == q6(e), s"digit $d expected")
      assert(chi == q6((cnt - total * e) * (cnt - total * e)
        / (total * e)), s"digit $d chi")
    }
  }
}
