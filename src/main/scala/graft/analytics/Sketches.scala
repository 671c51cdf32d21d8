package graft.analytics

import graft.core.Graft
import graft.pipeline.{HashParity, ParityMath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch, relationally.
  *
  * Why a hand-rolled sketch instead of `approx_count_distinct`:
  * Spark's built-in HLL++ and any other engine's sketch disagree bit
  * by bit (different hash, different registers), so it can never sit
  * under a cross-engine oracle, and its estimate is not reproducible
  * from the data alone. This formulation IS: md5-48 hashing (the
  * engine-portable hash the dedup family already uses), top-`p` bits
  * as the register index, the position of the first set bit in the
  * remaining 39 as the rank, and an estimator whose float work is
  * exact by construction - each register contributes 2^-M_j (one
  * mantissa bit, exponents within 40 of each other), so the register
  * sum is EXACT in IEEE double regardless of aggregation order: fully
  * map-side combinable with zero parity risk. Only the final
  * harmonic-mean divide (and the small-range ln() correction) are
  * inexact, and both engines run the identical expression.
  *
  * Shape at scale: one narrow hash pass, one (group, register) max -
  * map-side combinable, at most groups x 512 rows after partial agg -
  * then a groups-sized final agg: the classic mergeable-sketch
  * dataflow, with the merge expressed as ordinary max/sum so Catalyst
  * plans it like any aggregation. Estimate error is ~1.04/sqrt(512)
  * = 4.6% RSE; the query also emits the exact distinct count so the
  * error is visible.
  */
object Sketches {

  /** Register-index bits: 2^9 = 512 registers. */
  val hllP = 9
  val hllM: Long = 1L << hllP
  private val wBits = 48 - hllP // 39
  private val wMod = 1L << wBits
  // identical literal arithmetic in both dialects: alpha_512 * m * m
  // and the 2.5m linear-counting threshold. Every fractional literal
  // is CAST to DOUBLE because BOTH engines parse bare decimal
  // literals as DECIMAL, and their fixed-point division scales differ
  // (bit us: estimates diverged in the 8th digit through decimal
  // alpha arithmetic)
  private val alphaM2 =
    "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)" +
      " + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE)))" +
      " * CAST(512.0 AS DOUBLE) * CAST(512.0 AS DOUBLE)"
  private val lcThreshold = "CAST(1280.0 AS DOUBLE)"

  /** Per-group HLL estimate of distinct `l_orderkey` alongside the
    * exact count. rho = (zero bits before the first set bit in the
    * 39-bit suffix) + 1, via length(bin(w)) - identical in both
    * engines; w = 0 caps at 40.
    */
  /** The narrow per-row sketch pass over (l_returnflag, l_orderkey):
    * hash, register index, rank. Works over batch or streaming input.
    */
  private[graft] def hashRho(li: DataFrame): DataFrame =
    li.withColumn("h", expr("graft_md5_48(CAST(l_orderkey AS STRING))"))
      .withColumn("reg", expr(s"shiftright(h, $wBits)"))
      .withColumn("w", expr(s"h % ${wMod}L"))
      .withColumn("rho", expr(
        s"CASE WHEN w = 0 THEN ${wBits + 1} ELSE ${wBits + 1} - length(bin(w)) END"))
      .select(col("l_returnflag"), col("reg"), col("rho"))

  /** Estimator over the materialized register maxima
    * (l_returnflag, reg, mj) - shared by the batch and streaming faces
    * so the correction logic cannot drift.
    */
  private[graft] def estimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("l_returnflag"))
      .agg(
        sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), mj) AS DOUBLE)"))
          .as("s_ne"),
        count(lit(1)).as("n_reg"))
      .select(col("l_returnflag"),
        // empty registers contribute 2^-0 = 1.0 each; they are exactly
        // the registers absent from the (group, reg) aggregate
        (col("s_ne") + (lit(hllM) - col("n_reg")).cast("double")).as("s_all"),
        (lit(hllM) - col("n_reg")).as("v"))
      .select(col("l_returnflag"),
        expr(s"$alphaM2 / s_all").as("e_raw"), col("v"))
      .select(col("l_returnflag"),
        ParityMath.q6(expr(
          s"""CASE WHEN e_raw <= $lcThreshold AND v > 0
             |THEN CAST(512.0 AS DOUBLE) * ln(CAST(512.0 AS DOUBLE) / CAST(v AS DOUBLE))
             |ELSE e_raw END""".stripMargin)).as("hll_est"))

  /** Exact per-group distinct count, emitted alongside the estimate. */
  private[graft] def exactDistinct(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))

  def qHllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    graft.functions.NativeFunctions.register(spark)
    val li = Graft.tableParallel(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
    val regs = hashRho(li)
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rho")).as("mj"))
    estimate(regs).join(exactDistinct(li), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_exact"), col("hll_est"))
      .orderBy(col("l_returnflag"))
  }

  val qHllDistinctSql: String = {
    val h48 = HashParity.hex48Duck("md5(CAST(l_orderkey AS VARCHAR))")
    s"""WITH h AS (
       |  SELECT l_returnflag, $h48 AS h FROM lineitem
       |), r AS (
       |  SELECT l_returnflag, h >> $wBits AS reg, h % $wMod AS w FROM h
       |), regs AS (
       |  SELECT l_returnflag, reg,
       |    max(CASE WHEN w = 0 THEN ${wBits + 1}
       |        ELSE ${wBits + 1} - length(bin(w)) END) AS mj
       |  FROM r GROUP BY l_returnflag, reg
       |), est AS (
       |  SELECT l_returnflag,
       |    sum(1.0 / CAST((CAST(1 AS BIGINT) << mj) AS DOUBLE))
       |      + CAST($hllM - count(*) AS DOUBLE) AS s_all,
       |    $hllM - count(*) AS v
       |  FROM regs GROUP BY l_returnflag
       |), e AS (
       |  SELECT l_returnflag,
       |    $alphaM2 / s_all AS e_raw, v
       |  FROM est
       |), ex AS (
       |  SELECT l_returnflag,
       |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT e.l_returnflag, ex.n_exact,
       |  ${ParityMath.q6Sql(
            s"""CASE WHEN e.e_raw <= $lcThreshold AND e.v > 0
               |THEN CAST(512.0 AS DOUBLE) * ln(CAST(512.0 AS DOUBLE) / CAST(e.v AS DOUBLE))
               |ELSE e.e_raw END""".stripMargin)} AS hll_est
       |FROM e JOIN ex USING (l_returnflag)
       |ORDER BY e.l_returnflag""".stripMargin
  }
}
