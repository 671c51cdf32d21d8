package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 optimization equivalence pins: each restructured internal
  * must compute the SAME relation as the shape it replaced — checked
  * here against a direct reimplementation of the old plan on planted
  * fixtures (the oracle gate checks end-to-end results; these specs
  * pin the internals so a future edit can't silently drift them).
  */
class OptimizationEquivalenceSpec extends SparkSpec {

  test("fanToWindows ≡ the BETWEEN range join it replaced") {
    import spark.implicits._
    // buckets with gaps so candidate windows that are NOT occupied
    // must drop out of the fan
    val rows = Seq((1L, "a"), (1L, "b"), (3L, "a"), (7L, "c"),
      (8L, "a"), (14L, "b")).toDF("b", "u")
    val wins = rows.select(col("b").as("wb")).distinct()
    val fan = Sketches.fanToWindows(rows, wins)
      .select(col("wb"), col("b"), col("u"))
    val nlj = rows.join(wins,
        col("b").between(col("wb") - Sketches.slideSpan, col("wb")))
      .select(col("wb"), col("b"), col("u"))
    assert(fan.exceptAll(nlj).isEmpty && nlj.exceptAll(fan).isEmpty)
    assert(fan.count() === nlj.count())
  }

  test("single-shuffle sort variants ≡ per-pair global ranks") {
    import spark.implicits._
    // duplicate sort keys force the (s, a, o) tie-break to matter
    val state = Seq(
      (1L, "buy", 10L, 3L, 100L), (2L, "buy", 11L, 3L, 100L),
      (1L, "err", 12L, 1L, 300L), (3L, "buy", 10L, 2L, 200L),
      (2L, "err", 13L, 2L, 100L))
      .toDF("s", "a", "o", "cnt", "last_t")
    val got = graft.core.CountQueries.sortedVariantsFrom(state)
      .orderBy(col("ordering"), col("rk"))
      .collect().map(_.toSeq).toSeq
    // naive reference: one global window per variant direction
    import org.apache.spark.sql.expressions.Window
    val expected = graft.core.CountQueries.sortVariants.flatMap {
      case (name, order) =>
        state.withColumn("rk",
            row_number().over(Window.orderBy(order: _*)).cast("long"))
          .select(lit(name).as("ordering"), col("rk"), col("s"),
            col("a"), col("o"), col("cnt"), col("last_t"))
          .collect().map(_.toSeq).toSeq
    }.sortBy(r => (r.head.toString, r(1).asInstanceOf[Long]))
    assert(got === expected)
  }

  test("single-shuffle spearman ≡ the two-pass rank formulation") {
    import spark.implicits._
    // ties on both axes; negative values; skew
    val pc = Seq((1L, 5L, 3L), (1L, 7L, 1L), (2L, 5L, 2L),
      (4L, -1L, 1L), (4L, 7L, 5L), (-3L, 5L, 2L))
      .toDF("x", "y", "k")
    val got = Tpch.spearmanFromPairCounts(pc).collect()
    // reference: tie-averaged doubled ranks via windows per axis
    import org.apache.spark.sql.expressions.Window
    def ranks(cn: String) = {
      val vc = pc.groupBy(col(cn)).agg(sum(col("k")).as("c"))
      val w = Window.orderBy(col(cn))
      vc.withColumn("lo",
          coalesce(sum(col("c")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(cn), (lit(2L) * col("lo") + col("c") + 1L)
          .as(s"r2_$cn"))
    }
    val d14 = "decimal(14,0)"
    val exp = pc.join(ranks("x"), "x").join(ranks("y"), "y")
      .select(col("k").cast(d14).as("k"),
        col("r2_x").cast(d14).as("rx"), col("r2_y").cast(d14).as("ry"))
      .agg(sum(col("k")).cast("long").as("n"),
        sum(col("k") * col("rx")).as("sx"),
        sum(col("k") * col("ry")).as("sy"),
        sum(col("k") * (col("rx") * col("ry"))).as("sxy"),
        sum(col("k") * (col("rx") * col("rx"))).as("sxx"),
        sum(col("k") * (col("ry") * col("ry"))).as("syy"))
      .collect().head
    val n = exp.getLong(0)
    def d(i: Int) = exp.getDecimal(i).doubleValue()
    val num = n.toDouble * d(3) - d(1) * d(2)
    val den = math.sqrt(n.toDouble * d(4) - d(1) * d(1)) *
      math.sqrt(n.toDouble * d(5) - d(2) * d(2))
    val expRho = math.floor(num / den * 1e6 + 0.5) / 1e6
    assert(got.length === 1)
    assert(got.head.getLong(0) === n)
    assert(got.head.getDouble(1) === expRho)
  }
}
