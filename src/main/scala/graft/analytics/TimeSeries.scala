package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key grid, generating the missing buckets and carrying
  * the last observation forward - the standard preprocessing step
  * (next to sessionize and as-of) that turns event logs into
  * fixed-step series for windowed features or training sequences.
  *
  * 100 TB shape: one (key, bucket) keyed aggregation with map-side
  * combine; the spine explode is narrow OUT of the per-key span
  * aggregate (fan bounded by the key's bucket span, never raw events);
  * the gap left-join and the forward-fill window both key on the same
  * (user) partitioning. Metrics are integers (counts + max event id),
  * so the fill is bitwise cross-engine with no float-order pinning.
  */
object TimeSeries {

  /** 4 h buckets - the same grid as the z-order layout's time dim. */
  val resampleBucketUs: Long = graft.pipeline.Layout.tBucketUs

  /** The per-(key, bucket) observation state the fill runs over -
    * maintained by a plain aggregation in batch and by a streaming
    * aggregation (bounded state: keys x buckets) in the stream face.
    */
  private[graft] def resampleBase(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", s"${resampleBucketUs}L")).as("tb"),
        col("event_id"))
      .groupBy(col("user_id"), col("tb"))
      .agg(count(lit(1)).as("n_events"),
        max(col("event_id")).as("last_eid"))

  /** Spine generation + forward fill over the observation state -
    * shared verbatim by both faces, so they cannot drift.
    */
  private[graft] def resampleFill(base: DataFrame): DataFrame = {
    // per-key spine: every bucket between the key's first and last
    val spine = base.groupBy(col("user_id"))
      .agg(min(col("tb")).as("lo"), max(col("tb")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("tb"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(base, Seq("user_id", "tb"), "left")
      .select(col("user_id"), col("tb"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("last_eid"), ignoreNulls = true).over(wFill)
          .as("last_event_id"))
      .withColumn("is_gap", col("n_events") === 0L)
      .orderBy(col("user_id"), col("tb"))
  }

  def qResample(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    resampleFill(resampleBase(
      Graft.table(spark, sfDir, "events")))
  }

  // ---- q_resample_interp: linear interpolation between observations --

  /** Observation state for the interpolating variant: per (key,
    * bucket) the count plus the bucket's LAST observed value (by
    * event_id - unique, so the anchor is deterministic) in exact
    * integer micro-units. Same single map-side-combinable aggregation
    * shape as `resampleBase`.
    */
  private[graft] def resampleInterpBase(ev: DataFrame): DataFrame =
    ev.filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"),
        expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", s"${resampleBucketUs}L")).as("tb"),
        col("event_id"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v_mu"))
      .groupBy(col("user_id"), col("tb"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("event_id"), col("v_mu"))).as("m"))
      .select(col("user_id"), col("tb"), col("n_events"),
        col("m").getField("v_mu").as("v_mu"))

  /** Gap filling by LINEAR interpolation between the surrounding
    * observations (vs `resampleFill`'s carry-forward): the spine
    * bounds [lo, hi] are observed buckets, so every gap has both
    * neighbors. All arithmetic below the single final division is
    * exact BIGINT rational micro-units - numerator
    * prev*(next_tb-tb) + next*(tb-prev_tb), denominator
    * (next_tb-prev_tb)*1e6 - so both engines divide the same two
    * integers and land bit-identically, the same exactness scheme as
    * the trained-centroid means. Window shape matches the LOCF face:
    * two frames on the SAME (user) partitioning, no extra shuffle.
    */
  private[graft] def resampleInterpFill(base: DataFrame): DataFrame = {
    val spine = base.groupBy(col("user_id"))
      .agg(min(col("tb")).as("lo"), max(col("tb")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("tb"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTb = when(col("v_mu").isNotNull, col("tb"))
    spine.join(base, Seq("user_id", "tb"), "left")
      .withColumn("prev_mu", last(col("v_mu"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_tb", last(obsTb, ignoreNulls = true).over(wPrev))
      .withColumn("next_mu", first(col("v_mu"), ignoreNulls = true).over(wNext))
      .withColumn("next_tb", first(obsTb, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("tb"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("v_mu").isNotNull,
          col("v_mu").cast("double") / lit(1000000.0))
          .otherwise(
            (col("prev_mu") * (col("next_tb") - col("tb")) +
              col("next_mu") * (col("tb") - col("prev_tb"))).cast("double") /
              ((col("next_tb") - col("prev_tb")).cast("double") *
                lit(1000000.0)))
          .as("value"),
        coalesce(col("n_events"), lit(0L)).===(0L).as("is_gap"))
      .orderBy(col("user_id"), col("tb"))
  }

  def qResampleInterp(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    resampleInterpFill(resampleInterpBase(
      Graft.table(spark, sfDir, "events")))
  }

  val qResampleInterpSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", resampleBucketUs.toString)} AS tb,
       |         event_id,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), base AS (
       |  SELECT user_id, tb, count(*) AS n_events,
       |         max_by(v_mu, event_id) AS v_mu
       |  FROM e GROUP BY 1, 2
       |), span AS (
       |  SELECT user_id, min(tb) AS lo, max(tb) AS hi
       |  FROM base GROUP BY 1
       |), spine AS (
       |  SELECT user_id, unnest(range(lo, hi + 1)) AS tb FROM span
       |), j AS (
       |  SELECT s.user_id, s.tb,
       |         COALESCE(b.n_events, 0) AS n_events, b.v_mu
       |  FROM spine s LEFT JOIN base b USING (user_id, tb)
       |), f AS (
       |  SELECT user_id, tb, n_events, v_mu,
       |    last_value(v_mu IGNORE NULLS) OVER wp AS prev_mu,
       |    last_value(CASE WHEN v_mu IS NOT NULL THEN tb END
       |               IGNORE NULLS) OVER wp AS prev_tb,
       |    first_value(v_mu IGNORE NULLS) OVER wn AS next_mu,
       |    first_value(CASE WHEN v_mu IS NOT NULL THEN tb END
       |                IGNORE NULLS) OVER wn AS next_tb
       |  FROM j
       |  WINDOW wp AS (PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |  wn AS (PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |)
       |SELECT user_id, tb, CAST(n_events AS BIGINT) AS n_events,
       |  CASE WHEN v_mu IS NOT NULL
       |       THEN CAST(v_mu AS DOUBLE) / 1000000.0
       |       ELSE CAST(prev_mu * (next_tb - tb)
       |                 + next_mu * (tb - prev_tb) AS DOUBLE)
       |            / (CAST(next_tb - prev_tb AS DOUBLE) * 1000000.0)
       |  END AS value,
       |  (n_events = 0) AS is_gap
       |FROM f ORDER BY user_id, tb""".stripMargin

  // ---- q_ewma: truncated exact-rational EWMA smoothing ---------------

  /** EWMA window length (observations) and decay α = 1/4. The dyadic α
    * is what makes the smoother EXACT: with α = 1/4 the truncated
    * normalized weights are 3^i·4^(m−1−i) / (4^m − 3^m) — all integers
    * — so the whole smoother is one BIGINT weighted sum over the last
    * m ≤ 8 observations divided ONCE at output. Σ_{i<m} 3^i·4^(m−1−i)
    * = 4^m − 3^m (geometric), so the weights renormalize exactly at
    * the warm-up edge too. Magnitudes: v_mu ≤ 5e8, max weight 4^7 →
    * per-term ≤ 8.2e12, sum ≤ 6.6e13 — comfortably BIGINT.
    */
  val ewmaLen = 8

  /** Per-event EWMA of `value` per user in event order: the standard
    * smoothing pass ahead of anomaly/trend features on event logs.
    *
    * 100 TB shape: one user-keyed exchange + one sort carries the
    * whole operator — the m lag columns and the weighted sum are a
    * single window projection (no self-join, no second shuffle), and
    * every row's state is O(ewmaLen). Event order is the total
    * (ts, event_id) order, so the result is deterministic and the
    * integer arithmetic lands bit-identically on both engines.
    */
  def qEwma(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val lagged = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("value"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v0"))
      .withColumn("m", least(lit(ewmaLen.toLong), row_number().over(w)))
    val withLags = (1 until ewmaLen).foldLeft(lagged) { (df, i) =>
      df.withColumn(s"v$i", lag(col("v0"), i).over(w))
    }
    val pow3 = Array.iterate(1L, ewmaLen + 1)(_ * 3L)
    val pow4 = Array.iterate(1L, ewmaLen + 1)(_ * 4L)
    // Σ_{i<m} 3^i · 4^(m−1−i) · v_i — the weight depends on m, so each
    // term switches on the row's own warm-up length. Same CASE text as
    // the oracle below, so the arithmetic cannot drift.
    val numExpr = (0 until ewmaLen).map { i =>
      val cases = ((i + 1) to ewmaLen)
        .map(m => s"WHEN m = $m THEN ${pow3(i) * pow4(m - 1 - i)}L")
        .mkString(" ")
      s"(CASE $cases ELSE 0L END) * COALESCE(v$i, 0L)"
    }.mkString(" + ")
    val denExpr = (1 to ewmaLen)
      .map(m => s"WHEN m = $m THEN ${pow4(m) - pow3(m)}L").mkString(" ")
    withLags
      .select(col("user_id"), col("event_id"), col("value"),
        col("m").cast("long").as("n_obs"),
        graft.pipeline.ParityMath.q6(
          expr(s"CAST($numExpr AS DOUBLE)") /
            (expr(s"CAST(CASE $denExpr END AS DOUBLE)") *
              lit(1000000.0))).as("ewma"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qEwmaSql: String = {
    val pow3 = Array.iterate(1L, ewmaLen + 1)(_ * 3L)
    val pow4 = Array.iterate(1L, ewmaLen + 1)(_ * 4L)
    val lagCols = (1 until ewmaLen)
      .map(i => s"lag(v0, $i) OVER we AS v$i").mkString(",\n    ")
    val numSql = (0 until ewmaLen).map { i =>
      val cases = ((i + 1) to ewmaLen)
        .map(m => s"WHEN m = $m THEN ${pow3(i) * pow4(m - 1 - i)}")
        .mkString(" ")
      s"(CASE $cases ELSE 0 END) * COALESCE(v$i, 0)"
    }.mkString("\n      + ")
    val denSql = (1 to ewmaLen)
      .map(m => s"WHEN m = $m THEN ${pow4(m) - pow3(m)}").mkString(" ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v0
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), lagged AS (
       |  SELECT user_id, event_id, value, v0,
       |    LEAST($ewmaLen, row_number() OVER we) AS m,
       |    $lagCols
       |  FROM e
       |  WINDOW we AS (PARTITION BY user_id ORDER BY tus, event_id)
       |)
       |SELECT user_id, event_id, value, CAST(m AS BIGINT) AS n_obs,
       |  ${graft.pipeline.ParityMath.q6Sql(
            s"""CAST($numSql AS DOUBLE)
               |    / (CAST(CASE $denSql END AS DOUBLE) * 1000000.0)""".stripMargin)}
       |    AS ewma
       |FROM lagged ORDER BY user_id, event_id""".stripMargin
  }

  // ---- q_holt: double exponential smoothing --------------------------

  /** Holt window length (the ewma truncation discipline) and the
    * integer weight tables: with α = β = 1/4 the per-step update is
    * [L'; B'] = (1/16)·[[12, 12], [−1, 15]]·[L; B] + (y/16)·[4; 1]
    * (B' = ¼(L'−L) + ¾B expanded), initialized L₁ = y₁, B₁ = 0 — so
    * over a length-m window both level and trend are INTEGER weighted
    * sums of the observations over the common denominator 16^(m−1)
    * (matrix-power weights; level weights sum to 16^(m−1), trend
    * weights to 0 — a constant series smooths to itself with zero
    * trend, spec-pinned). Magnitudes: |w| ≤ 6.8e7, v_mu ≤ 5e8 →
    * per-term ≤ 3.4e16, sum ≤ 2.7e17 — comfortably BIGINT.
    */
  val holtLen = 8

  private[graft] val (holtWL, holtWB): (Array[Array[Long]], Array[Array[Long]]) = {
    val wl = Array.ofDim[Array[Long]](holtLen + 1)
    val wb = Array.ofDim[Array[Long]](holtLen + 1)
    wl(1) = Array(1L); wb(1) = Array(0L)
    for (t <- 2 to holtLen) {
      val scalePrev = Array.iterate(1L, t - 1)(_ * 16L).last
      wl(t) = Array.tabulate(t)(j =>
        if (j < t - 1) 12L * wl(t - 1)(j) + 12L * wb(t - 1)(j)
        else 4L * scalePrev)
      wb(t) = Array.tabulate(t)(j =>
        if (j < t - 1) -1L * wl(t - 1)(j) + 15L * wb(t - 1)(j)
        else 1L * scalePrev)
    }
    (wl, wb)
  }

  /** Per-event HOLT double exponential smoothing (level + trend +
    * one-step forecast) of `value` per user — the forecasting-family
    * member above `q_ewma`'s level-only smoother: trend is what turns
    * "smoothed now" into "expected next", the input to capacity
    * forecasts and trend-break features. Same 100 TB shape as ewma:
    * ONE user-keyed exchange + sort carries the operator; the m lag
    * columns and both weighted sums are a single window projection,
    * per-row state O(holtLen); identical CASE weight-table text on
    * both engines, one q6 division at output.
    */
  /** Holt window machinery shared by the smoother and its backtest
    * (`q_forecast_eval`): the per-user lagged relation and the integer
    * weight-table expression texts (kept in ONE place so the two faces
    * cannot drift).
    */
  private def holtWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))

  private def holtLagged(spark: SparkSession, sfDir: String): DataFrame = {
    val w = holtWindow
    val lagged = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("value"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v0"))
      .withColumn("m", least(lit(holtLen.toLong), row_number().over(w)))
    (1 until holtLen).foldLeft(lagged) { (df, i) =>
      df.withColumn(s"v$i", lag(col("v0"), i).over(w))
    }
  }

  private def holtNumExpr(tbl: Array[Array[Long]]): String =
    (0 until holtLen).map { j =>
      val cases = ((j + 1) to holtLen)
        .map(m => s"WHEN m = $m THEN ${tbl(m)(m - j - 1)}L")
        .mkString(" ")
      s"(CASE $cases ELSE 0L END) * COALESCE(v$j, 0L)"
    }.mkString(" + ")

  private val holtDenD: String = {
    val den = (1 to holtLen)
      .map(m => s"WHEN m = $m THEN ${
        Array.iterate(1L, m)(_ * 16L).last}L").mkString(" ")
    s"(CAST(CASE $den END AS DOUBLE) * 1000000.0)"
  }

  def qHolt(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    def numExpr(tbl: Array[Array[Long]]): String = holtNumExpr(tbl)
    val denD = holtDenD
    holtLagged(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        col("m").cast("long").as("n_obs"),
        graft.pipeline.ParityMath.q6(
          expr(s"CAST(${numExpr(holtWL)} AS DOUBLE)") / expr(denD))
          .as("level"),
        graft.pipeline.ParityMath.q6(
          expr(s"CAST(${numExpr(holtWB)} AS DOUBLE)") / expr(denD))
          .as("trend"),
        graft.pipeline.ParityMath.q6(
          expr(s"CAST((${numExpr(holtWL)}) + (${numExpr(holtWB)}) " +
            "AS DOUBLE)") / expr(denD)).as("forecast"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private def holtNumSql(tbl: Array[Array[Long]]): String =
    (0 until holtLen).map { j =>
      val cases = ((j + 1) to holtLen)
        .map(m => s"WHEN m = $m THEN ${tbl(m)(m - j - 1)}")
        .mkString(" ")
      s"(CASE $cases ELSE 0 END) * COALESCE(v$j, 0)"
    }.mkString("\n      + ")

  private val holtDenSqlD: String = {
    val den = (1 to holtLen)
      .map(m => s"WHEN m = $m THEN ${
        Array.iterate(1L, m)(_ * 16L).last}").mkString(" ")
    s"(CAST(CASE $den END AS DOUBLE) * 1000000.0)"
  }

  private val holtLagColsSql: String = (1 until holtLen)
    .map(i => s"lag(v0, $i) OVER we AS v$i").mkString(",\n    ")

  val qHoltSql: String = {
    def numSql(tbl: Array[Array[Long]]): String = holtNumSql(tbl)
    val lagCols = holtLagColsSql
    val denD = holtDenSqlD
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v0
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), lagged AS (
       |  SELECT user_id, event_id, value, v0,
       |    LEAST($holtLen, row_number() OVER we) AS m,
       |    $lagCols
       |  FROM e
       |  WINDOW we AS (PARTITION BY user_id ORDER BY tus, event_id)
       |)
       |SELECT user_id, event_id, value, CAST(m AS BIGINT) AS n_obs,
       |  ${graft.pipeline.ParityMath.q6Sql(
            s"CAST(${numSql(holtWL)} AS DOUBLE) / $denD")} AS level,
       |  ${graft.pipeline.ParityMath.q6Sql(
            s"CAST(${numSql(holtWB)} AS DOUBLE) / $denD")} AS trend,
       |  ${graft.pipeline.ParityMath.q6Sql(
            s"CAST((${numSql(holtWL)}) + (${numSql(holtWB)}) AS DOUBLE) / $denD")}
       |    AS forecast
       |FROM lagged ORDER BY user_id, event_id""".stripMargin
  }

  // ---- q_forecast_eval: Holt backtest vs persistence ------------------

  /** One-step-ahead BACKTEST of the Holt forecaster against the
    * persistence baseline ("tomorrow = today") — the honest member
    * every forecasting family needs: a smoother that cannot beat
    * persistence on the corpus is a feature, not a forecaster, and
    * this query measures exactly that. For every observation with a
    * successor in its user's series, the error is the CURRENT row's
    * one-step forecast minus the NEXT observation, in exact integer
    * micro-units: the q6-rounded forecast's numerator
    * floor(f·1e6 + 0.5) is itself the integer the batch face emits,
    * so |e| sums exactly (BIGINT → DECIMAL ≙ HUGEINT) with no float
    * summation order anywhere; the two MAEs and the skill ratio
    * (Σ|e_holt| / Σ|e_naive|; < 1 means the trend model earns its
    * keep) are single identical-text divisions under q6, NULL when a
    * constant corpus zeroes the baseline. Same shape as q_holt plus
    * one lead() on the same window — no extra exchange.
    */
  def qForecastEval(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val fmu = s"CAST(floor((CAST((${holtNumExpr(holtWL)}) + " +
      s"(${holtNumExpr(holtWB)}) AS DOUBLE) / $holtDenD) " +
      "* 1000000.0 + 0.5) AS BIGINT)"
    holtLagged(spark, sfDir)
      .withColumn("v_next", lead(col("v0"), 1).over(holtWindow))
      .filter(col("v_next").isNotNull)
      .select(expr(s"abs($fmu - v_next)").as("e_holt"),
        expr("abs(v0 - v_next)").as("e_naive"))
      .agg(count(lit(1)).as("n_evals"),
        sum(col("e_holt").cast("decimal(18,0)")).as("se_holt"),
        sum(col("e_naive").cast("decimal(18,0)")).as("se_naive"))
      .select(col("n_evals"),
        graft.pipeline.ParityMath.q6(expr(
          """CAST(se_holt AS DOUBLE)
            | / (CAST(n_evals AS DOUBLE) * 1000000.0)""".stripMargin))
          .as("mae_holt"),
        graft.pipeline.ParityMath.q6(expr(
          """CAST(se_naive AS DOUBLE)
            | / (CAST(n_evals AS DOUBLE) * 1000000.0)""".stripMargin))
          .as("mae_naive"),
        graft.pipeline.ParityMath.q6(expr(
          """IF(CAST(se_naive AS DOUBLE) = 0.0, CAST(NULL AS DOUBLE),
            |   CAST(se_holt AS DOUBLE) / CAST(se_naive AS DOUBLE))"""
            .stripMargin)).as("skill"))
  }

  val qForecastEvalSql: String = {
    val fmu = s"CAST(floor((CAST((${holtNumSql(holtWL)}) + " +
      s"(${holtNumSql(holtWB)}) AS DOUBLE) / $holtDenSqlD) " +
      "* 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v0
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), lagged AS (
       |  SELECT user_id, event_id, value, v0,
       |    LEAST($holtLen, row_number() OVER we) AS m,
       |    $holtLagColsSql,
       |    lead(v0, 1) OVER we AS v_next
       |  FROM e
       |  WINDOW we AS (PARTITION BY user_id ORDER BY tus, event_id)
       |), ev AS (
       |  SELECT abs($fmu - v_next) AS e_holt,
       |         abs(v0 - v_next) AS e_naive
       |  FROM lagged WHERE v_next IS NOT NULL
       |), s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_evals,
       |         sum(CAST(e_holt AS HUGEINT)) AS se_holt,
       |         sum(CAST(e_naive AS HUGEINT)) AS se_naive
       |  FROM ev
       |)
       |SELECT n_evals,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """CAST(se_holt AS DOUBLE)
              | / (CAST(n_evals AS DOUBLE) * 1000000.0)""".stripMargin)}
       |    AS mae_holt,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """CAST(se_naive AS DOUBLE)
              | / (CAST(n_evals AS DOUBLE) * 1000000.0)""".stripMargin)}
       |    AS mae_naive,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """(CASE WHEN CAST(se_naive AS DOUBLE) = 0.0 THEN NULL
              |  ELSE CAST(se_holt AS DOUBLE) / CAST(se_naive AS DOUBLE)
              |  END)""".stripMargin)} AS skill
       |FROM s""".stripMargin
  }

  // ---- q_autocorr: pooled lag-k autocorrelation -----------------------

  /** Largest lag the ACF reports. */
  val acfMaxLag = 4

  /** Pooled AUTOCORRELATION function of `value` at lags 1..4: within
    * each user's total (tus, event_id) order, every observation pairs
    * with its lag-k predecessor (pairs never cross users), and each
    * lag's Pearson correlation pools ALL pairs corpus-wide — the
    * seasonality/forecasting diagnostic that says how much memory the
    * series has (feeds the choice between q_ewma's level-only and
    * q_holt's trend smoothing, and whether q_seasonality's daily
    * period is real). Exact-sum discipline (q_corr's): x, y in integer
    * micro-units, the six sums n/Σx/Σy/Σxy/Σx²/Σy² accumulate in
    * DECIMAL(38,0) ≙ HUGEINT with no float order anywhere, then both
    * engines cast the identical exact sums to double and run the
    * identical closed formula under q6. Shape: ONE user-keyed
    * exchange + sort carries the lag columns (q_ewma's class), the
    * pair explode is row-local, and the ACF itself is a map-side
    * combinable 4-group aggregation — at 100 TB the second shuffle
    * moves 4 rows of six numbers.
    */
  def qAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    acfFromPairs(acfPairsFromValues(
      Graft.table(spark, sfDir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
          col("event_id"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .as("v0"))))
  }

  /** The per-user lag-pair explode over any (user_id, tus, event_id,
    * v0) value relation — shared by the batch face and the
    * incremental ACF fragment store (whose per-batch fragments union
    * to exactly this relation).
    */
  private[graft] def acfPairsFromValues(lagged: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val withLags = (1 to acfMaxLag).foldLeft(lagged) { (df, i) =>
      df.withColumn(s"v$i", lag(col("v0"), i).over(w))
    }
    val arr = (1 to acfMaxLag).map { k =>
      s"IF(v$k IS NOT NULL, " +
        s"named_struct('lag', CAST($k AS BIGINT), 'x', v0, 'y', v$k), " +
        "CAST(NULL AS STRUCT<lag: BIGINT, x: BIGINT, y: BIGINT>))"
    }.mkString(", ")
    withLags
      .select(explode(expr(
        s"filter(array($arr), p -> p IS NOT NULL)")).as("p"))
      .select(col("p.lag").as("lag"), col("p.x").as("x"),
        col("p.y").as("y"))
  }

  /** The pooled-Pearson view over any (lag, x, y) BIGINT pair relation
    * — shared by the batch face and the streaming face (whose per-user
    * ring emits exactly these pairs at arrival).
    */
  private[graft] def acfFromPairs(pairs: DataFrame): DataFrame = {
    pairs
      .select(col("lag"),
        col("x").cast("decimal(18,0)").as("x"),
        col("y").cast("decimal(18,0)").as("y"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // a zero-variance side makes Pearson undefined (0/0; by
      // Cauchy-Schwarz a zero denominator forces a zero numerator) -
      // emit NULL rather than trip ANSI DIVIDE_BY_ZERO; q6(NULL) is
      // NULL on both engines, so the guard preserves bitwise parity
      .select(col("lag"), col("n_pairs"),
        graft.pipeline.ParityMath.q6(expr(
          """IF((sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0.0,
            |   CAST(NULL AS DOUBLE),
            |   (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |   / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |      * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
            .stripMargin)).as("acf"))
      .orderBy(col("lag"))
  }

  val qAutocorrSql: String = {
    val lagCols = (1 to acfMaxLag)
      .map(i => s"lag(v0, $i) OVER we AS v$i").mkString(",\n    ")
    val pairSelects = (1 to acfMaxLag).map { k =>
      s"SELECT $k AS lag, v0 AS x, v$k AS y FROM lagged " +
        s"WHERE v$k IS NOT NULL"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v0
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), lagged AS (
       |  SELECT user_id, v0,
       |    $lagCols
       |  FROM e
       |  WINDOW we AS (PARTITION BY user_id ORDER BY tus, event_id)
       |), pairs AS (
       |  $pairSelects
       |), s AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM pairs GROUP BY lag
       |)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """(CASE WHEN (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |         * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              |                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0.0
              |  THEN NULL
              |  ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |       / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |          * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
              |  END)""".stripMargin)} AS acf
       |FROM s ORDER BY lag""".stripMargin
  }

  // ---- q_xcorr: lead-lag cross-correlation between event types -------

  /** Largest lead the CCF reports (hour buckets). */
  val xcorrMaxLag = 3

  /** CROSS-correlation function between event-type activity series —
    * the lead–lag diagnostic q_autocorr can't answer (autocorr: does a
    * series remember ITSELF; this: does type a's activity at hour t
    * predict type b's at t+ℓ — the "views lead purchases by an hour"
    * question behind alerting and causal-ordering heuristics). Series
    * are per-(type, hour-bucket) event counts DENSIFIED over the full
    * corpus bucket span (a missing bucket is an observed ZERO — joining
    * only existing buckets would silently bias every correlation
    * upward), then each ordered pair (a ≠ b) at lags 0..`xcorrMaxLag`
    * pools Pearson over the overlap region under the q_corr exact-sum
    * discipline: integer count sums in DECIMAL(38,0) ≙ HUGEINT, one
    * identical closed formula under q6, zero-variance → NULL (the
    * ANSI-divide lesson).
    *
    * 100 TB shape: ONE corpus scan folds to the (types × buckets)
    * count relation — map-combinable, tiny (5 types × hours) — and
    * everything after runs on that relation: the dense spine is a
    * sequence explode against 1-row bounds, the lag alignment a keyed
    * equi-join on the bucket, the CCF a map-combinable
    * (a, b, lag)-group aggregation. No second corpus scan, no window.
    */
  def qXcorr(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    xcorrFrom(Graft.table(spark, sfDir, "events"))
  }

  private[graft] def xcorrFrom(events: DataFrame): DataFrame =
    xcorrFromBuckets(xcorrBuckets(events))

  /** The per-(type, hour) count relation — the ADDITIVE fact the
    * streaming and store faces accumulate (counts merge by plain sum
    * under any batch split of the events).
    */
  private[graft] def xcorrBuckets(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("et"),
        expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", "3600000000")).as("h"))
      .groupBy(col("et"), col("h")).agg(count(lit(1)).as("c"))

  /** The densify + lag-align + pooled-Pearson view over any
    * (et, h, c) bucket relation — shared by the batch face and the
    * streaming/store faces (the CCF is an evolving-answer quantity:
    * one arriving event shifts its bucket and thereby every pair the
    * bucket participates in, so only the bucket counts are storable
    * state).
    */
  private[graft] def xcorrFromBuckets(cnt0: DataFrame): DataFrame = {
    val spark = cnt0.sparkSession
    val cnt = cnt0.localCheckpoint()
    val spine = cnt.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    val dense = cnt.select(col("et")).distinct().crossJoin(spine)
      .join(cnt, Seq("et", "h"), "left")
      .select(col("et"), col("h"),
        coalesce(col("c"), lit(0L)).as("c"))
      .localCheckpoint()
    // lag fan-out INLINE (explode) and the alignment key materialized
    // as a column BEFORE the join: the earlier crossJoin(lags) +
    // `hb === h + lag` formulation let the optimizer merge the two
    // joins into one Cross join whose equi key was never extracted -
    // a BroadcastNestedLoopJoin, O(H²·L) on H densified buckets (the
    // r11 10M probe measured it 19× on 10× events; this plan is 1.0×
    // flat on the same probe). Joining on the named column forces the
    // hash-join path.
    val a = dense.select(col("et").as("type_a"), col("h"),
        col("c").cast("decimal(18,0)").as("x"))
      .withColumn("lag", explode(expr(s"sequence(0L, ${xcorrMaxLag}L)")))
      .withColumn("hb", col("h") + col("lag"))
    val b = dense.select(col("et").as("type_b"), col("h").as("hb"),
      col("c").cast("decimal(18,0)").as("y"))
    a.join(b, "hb")
      .filter(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("type_a"), col("type_b"), col("lag"), col("n_pairs"),
        graft.pipeline.ParityMath.q6(expr(
          """IF((sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0.0,
            |   CAST(NULL AS DOUBLE),
            |   (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |   / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |      * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
            .stripMargin)).as("xcf"))
      .orderBy(col("type_a"), col("type_b"), col("lag"))
  }

  val qXcorrSql: String =
    s"""WITH cnt AS (
       |  SELECT event_type AS et, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "3600000000")} AS h,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY 1, 2
       |), spine AS (
       |  SELECT unnest(range(min(h), max(h) + 1)) AS h FROM cnt
       |), dense AS (
       |  SELECT t.et, s.h, coalesce(c.c, 0) AS c
       |  FROM (SELECT DISTINCT et FROM cnt) t
       |  CROSS JOIN spine s
       |  LEFT JOIN cnt c ON c.et = t.et AND c.h = s.h
       |), s AS (
       |  SELECT a.et AS type_a, b.et AS type_b, l.lag,
       |    CAST(count(*) AS BIGINT) AS n_pairs,
       |    sum(CAST(a.c AS HUGEINT)) AS sx, sum(CAST(b.c AS HUGEINT)) AS sy,
       |    sum(CAST(a.c AS HUGEINT) * b.c) AS sxy,
       |    sum(CAST(a.c AS HUGEINT) * a.c) AS sxx,
       |    sum(CAST(b.c AS HUGEINT) * b.c) AS syy
       |  FROM dense a
       |  CROSS JOIN (SELECT unnest(range(0, ${xcorrMaxLag + 1})) AS lag) l
       |  JOIN dense b ON b.h = a.h + l.lag AND a.et <> b.et
       |  GROUP BY 1, 2, 3
       |)
       |SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n_pairs,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """(CASE WHEN (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |         * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              |                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0.0
              |  THEN NULL
              |  ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |       / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
              |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |          * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
              |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
              |  END)""".stripMargin)} AS xcf
       |FROM s ORDER BY type_a, type_b, lag""".stripMargin

  // ---- q_stl: trend-removed seasonal decomposition -------------------

  /** STL-lite seasonal decomposition of the TOTAL hourly activity
    * series — the trend-removal member next to `q_seasonality`'s raw
    * hour-of-week profile (a raw profile conflates "busy hour" with
    * "the corpus grew during the afternoon half of its span"; removing
    * the trend first is what makes the seasonal index honest, which
    * the spec proves by planting a steep linear trend that must cancel
    * EXACTLY). Classical decomposition, exact integers throughout:
    *
    *   - trend: centered 2×24-hour moving average, kept in units of
    *     1/48 — T48(t) = Σ_{i=-12..11} c(t+i) + Σ_{i=-11..12} c(t+i) —
    *     defined only where the full window exists (no padded edges);
    *   - detrended, units of 1/48: D48(t) = 48·c(t) − T48(t);
    *   - seasonal index per hour-of-day: the mean of D48 over that
    *     hour's cells, emitted as the exact integer numerator sum plus
    *     the ONE q6 double division.
    *
    * The series is densified over the corpus span (a missing hour is
    * an observed zero — the q_xcorr argument). 100 TB shape: one
    * corpus scan folds map-combinably to the hours-sized count
    * relation; the windows and the 24-group rollup run over that TINY
    * relation (corpus-span hours — ~10⁵ rows after years; the
    * q_seasonality "window over the tiny matrix" posture, never a
    * second scan).
    */
  def qStl(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    stlFrom(Graft.table(spark, sfDir, "events"))
  }

  private[graft] def stlFrom(events: DataFrame): DataFrame =
    stlFromBuckets(stlBuckets(events))

  /** The total-per-hour count relation — ADDITIVE, the streaming and
    * store faces' only storable fact.
    */
  private[graft] def stlBuckets(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .select(expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", "3600000000")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))

  /** Densify + trend-remove + hour-of-day rollup over any (h, c)
    * bucket relation — shared by the batch, streaming and store faces
    * (one arriving event shifts its bucket, the trend line through it,
    * and every cell's detrended value: the decomposition is never
    * storable state).
    */
  private[graft] def stlFromBuckets(cnt0: DataFrame): DataFrame = {
    val cnt = cnt0.localCheckpoint()
    val dense = cnt.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
      .join(cnt, Seq("h"), "left")
      .select(col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val wa = Window.orderBy(col("h")).rowsBetween(-12, 11)
    val wb = Window.orderBy(col("h")).rowsBetween(-11, 12)
    dense
      .select(col("h"), col("c"),
        sum(col("c")).over(wa).as("s1"), count(lit(1)).over(wa).as("n1"),
        sum(col("c")).over(wb).as("s2"), count(lit(1)).over(wb).as("n2"))
      .filter(col("n1") === 24 && col("n2") === 24)
      .select(pmod(col("h"), lit(24)).as("hod"),
        (col("c") * 48 - col("s1") - col("s2")).as("d48"))
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_cells"), sum(col("d48")).as("d48_sum"))
      .select(col("hod"), col("n_cells"), col("d48_sum"),
        graft.pipeline.ParityMath.q6(
          col("d48_sum").cast("double") /
            (lit(48.0) * col("n_cells").cast("double"))).as("seasonal"))
      .orderBy(col("hod"))
  }

  val qStlSql: String =
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "3600000000")} AS h,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS (
       |  SELECT s.h, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(h), max(h) + 1)) AS h FROM cnt) s
       |  LEFT JOIN cnt c ON c.h = s.h
       |), w AS (
       |  SELECT h, c,
       |    sum(c) OVER wa AS s1, count(*) OVER wa AS n1,
       |    sum(c) OVER wb AS s2, count(*) OVER wb AS n2
       |  FROM dense
       |  WINDOW wa AS (ORDER BY h ROWS BETWEEN 12 PRECEDING
       |                AND 11 FOLLOWING),
       |         wb AS (ORDER BY h ROWS BETWEEN 11 PRECEDING
       |                AND 12 FOLLOWING)
       |), d AS (
       |  SELECT ((h % 24) + 24) % 24 AS hod, 48 * c - s1 - s2 AS d48
       |  FROM w WHERE n1 = 24 AND n2 = 24
       |), g AS (
       |  SELECT hod, CAST(count(*) AS BIGINT) AS n_cells,
       |         CAST(sum(d48) AS BIGINT) AS d48_sum
       |  FROM d GROUP BY 1
       |)
       |SELECT hod, n_cells, d48_sum,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "(CAST(d48_sum AS DOUBLE) / (48.0 * CAST(n_cells AS DOUBLE)))"
          )} AS seasonal
       |FROM g ORDER BY hod""".stripMargin

  // ---- q_mad: median/MAD robust outliers ------------------------------

  /** Median-absolute-deviation outlier detection per user — the
    * DISTRIBUTION-FREE robust sibling of `q_anomaly`'s rolling
    * z-score (one bad reading inflates a mean/σ baseline and masks
    * itself; the median/MAD baseline has a 50% breakdown point, the
    * textbook reason robust monitoring uses it): a value is flagged
    * when |v − median| > 3·MAD over the user's WHOLE history. Pure
    * integer end to end — values quantize to micro-units, median and
    * MAD are rank-selected order STATISTICS (the q_quantile_exact
    * convention: rank (n+1) DIV 2, the lower median), the deviation
    * is integer subtraction and the verdict an integer comparison —
    * no float mean/σ anywhere, both engines bitwise. The classic MAD
    * collapse is kept and spec-pinned: when ≥ half the history is one
    * value, MAD = 0 and EVERY other value flags — that is the
    * signal's documented behavior, not a bug.
    *
    * 100 TB shape: the q_ewma posture — ONE user-keyed exchange
    * carries both rank-selection windows and the two per-user joins
    * (median and MAD relations are users-sized); zero corpus
    * re-scans, no global window.
    */
  def qMad(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val e = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"))
    val wu = Window.partitionBy(col("user_id"))
    val wv = wu.orderBy(col("v"), col("event_id"))
    val med = e.withColumn("rn", row_number().over(wv).cast("long"))
      .withColumn("n", count(lit(1)).over(wu))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("user_id"), col("v").as("med"))
    val d = e.join(med, "user_id")
      .withColumn("ad", abs(col("v") - col("med")))
    val wa = wu.orderBy(col("ad"), col("event_id"))
    val mad = d.withColumn("rn", row_number().over(wa).cast("long"))
      .withColumn("n", count(lit(1)).over(wu))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("user_id"), col("ad").as("mad"))
    d.join(mad, "user_id")
      .filter(col("ad") > lit(3L) * col("mad"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("med").as("med_mu"), col("mad").as("mad_mu"),
        col("ad").as("dev_mu"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qMadSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), m AS (
       |  SELECT user_id, v AS med FROM (
       |    SELECT user_id, v,
       |      row_number() OVER (PARTITION BY user_id
       |        ORDER BY v, event_id) AS rn,
       |      count(*) OVER (PARTITION BY user_id) AS n
       |    FROM e)
       |  WHERE rn = (n + 1) // 2
       |), d AS (
       |  SELECT e.user_id, e.event_id, e.value, m.med,
       |         abs(e.v - m.med) AS ad
       |  FROM e JOIN m USING (user_id)
       |), md AS (
       |  SELECT user_id, ad AS mad FROM (
       |    SELECT user_id, ad,
       |      row_number() OVER (PARTITION BY user_id
       |        ORDER BY ad, event_id) AS rn,
       |      count(*) OVER (PARTITION BY user_id) AS n
       |    FROM d)
       |  WHERE rn = (n + 1) // 2
       |)
       |SELECT d.user_id, d.event_id, d.value,
       |  CAST(d.med AS BIGINT) AS med_mu,
       |  CAST(md.mad AS BIGINT) AS mad_mu,
       |  CAST(d.ad AS BIGINT) AS dev_mu
       |FROM d JOIN md USING (user_id)
       |WHERE d.ad > 3 * md.mad
       |ORDER BY d.user_id, d.event_id""".stripMargin

  // ---- q_mannkendall: distribution-free monotone-trend test ----------

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) over the DAILY
    * total series — the hypothesis-test member of the trend family
    * (Holt SMOOTHES the trend, STL removes it; this one asks "is
    * there one at all" without assuming any distribution): S =
    * Σ_{i<j} sign(x_j − x_i), reported with the concordant/discordant
    * pair counts and Kendall's tau = S / pairs. Everything is exact
    * integer counting except the ONE final q6 division, so both
    * engines agree bitwise. The series is densified over the corpus
    * span (a missing day is an observed zero — the q_xcorr argument;
    * dropping empty days would bias S toward whatever surrounds
    * them). Days, not hours, on purpose: the test is O(n²) pairs by
    * definition, and the DAILY series keeps that bounded at any
    * corpus scale (a decade is ~3.7k days → 6.6M pairs — trivial),
    * where the hourly grid's 10¹⁰ pairs would make the statistic the
    * bottleneck instead of the scan.
    *
    * 100 TB shape: one corpus scan folds map-combinably to the
    * days-sized count relation; the pair join runs over that TINY
    * relation (broadcast NLJ by construction — the q_seasonality
    * "window over the tiny matrix" posture, never a second scan).
    */
  def qMannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    mkFromBuckets(mkBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** The total-per-day count relation — ADDITIVE, the streaming
    * face's only storable fact.
    */
  private[graft] def mkBuckets(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .select(expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", "86400000000")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("c"))

  /** Densify + sign-pair count over any (d, c) bucket relation —
    * shared by the batch and streaming faces (one arriving event
    * shifts its day and the sign of every pair that day touches: the
    * statistic is never storable state).
    */
  /** The densified daily series (missing day = observed zero) from any
    * (d, c) bucket relation — shared by the Mann–Kendall and Theil–Sen
    * faces (the companion trend statistics read the same series).
    */
  private[graft] def mkDense(cnt0: DataFrame): DataFrame = {
    val cnt = cnt0.localCheckpoint()
    cnt.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("d"))
      .join(cnt, Seq("d"), "left")
      .select(col("d"), coalesce(col("c"), lit(0L)).as("c"))
      .localCheckpoint()
  }

  private[graft] def mkFromBuckets(cnt0: DataFrame): DataFrame = {
    val dense = mkDense(cnt0)
    val days = dense.agg(count(lit(1)).as("n_days"))
    dense.select(col("d").as("d1"), col("c").as("c1"))
      .join(dense.select(col("d").as("d2"), col("c").as("c2")),
        col("d1") < col("d2"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum((col("c2") > col("c1")).cast("long")), lit(0L))
          .as("conc"),
        coalesce(sum((col("c2") < col("c1")).cast("long")), lit(0L))
          .as("disc"))
      .crossJoin(broadcast(days))
      .select(col("n_days"), col("n_pairs"), col("conc"), col("disc"),
        (col("conc") - col("disc")).as("s_stat"),
        when(col("n_pairs") > 0, graft.pipeline.ParityMath.q6(
          (col("conc") - col("disc")).cast("double") /
            col("n_pairs").cast("double"))).as("tau"))
  }

  val qMannKendallSql: String =
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS (
       |  SELECT s.d, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM cnt) s
       |  LEFT JOIN cnt c ON c.d = s.d
       |), p AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(coalesce(sum(CASE WHEN b.c > a.c THEN 1 END), 0)
       |      AS BIGINT) AS conc,
       |    CAST(coalesce(sum(CASE WHEN b.c < a.c THEN 1 END), 0)
       |      AS BIGINT) AS disc
       |  FROM dense a JOIN dense b ON a.d < b.d
       |), n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dense)
       |SELECT n_days, n_pairs, conc, disc,
       |  CAST(conc - disc AS BIGINT) AS s_stat,
       |  CASE WHEN n_pairs > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            "CAST(conc - disc AS DOUBLE) / CAST(n_pairs AS DOUBLE)")}
       |  END AS tau
       |FROM p, n""".stripMargin

  // ---- q_theilsen: robust trend estimation -----------------------------

  /** THEIL–SEN slope estimation over the densified daily series — the
    * companion ESTIMATOR to Mann–Kendall's test (MK says whether a
    * monotone trend exists; Theil–Sen says how steep, with the same
    * 29% breakdown robustness no least-squares fit has): the slope is
    * the MEDIAN of all pairwise slopes (c_j − c_i)/(d_j − d_i), the
    * intercept the median of (c_i − slope·d_i). Determinism: each
    * pairwise slope is ONE IEEE division of exact integers (identical
    * on both engines), medians are rank-selected order statistics
    * under the total (value, d1, d2) order — the q_mad lower-median
    * convention — so the selected values are bitwise reproducible; no
    * arithmetic ever mixes engine-specific rounding.
    *
    * 100 TB shape: the pair relation lives on the DAYS grid (the
    * q_mannkendall argument — ~6.6M pairs per decade), and both
    * median selections run through GlobalRank's range-shuffle rank —
    * never a single-task global window.
    */
  def qTheilsen(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    theilsenFromBuckets(mkBuckets(Graft.table(spark, sfDir, "events")))
  }

  private[graft] def theilsenFromBuckets(cnt0: DataFrame): DataFrame = {
    val dense = mkDense(cnt0)
    val days = dense.agg(count(lit(1)).as("n_days"))
    val pairs = dense.select(col("d").as("d1"), col("c").as("c1"))
      .join(dense.select(col("d").as("d2"), col("c").as("c2")),
        col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        ((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
    val (ranked, nPairs) = graft.core.GlobalRank.withRank(pairs,
      Seq(col("slope").asc, col("d1").asc, col("d2").asc), "rn")
    val med = ranked.filter(col("rn") === (nPairs + 1) / 2)
      .select(col("slope").as("slope_med"))
    val resid = dense.crossJoin(broadcast(med))
      .select(col("d"),
        (col("c").cast("double") - col("slope_med") *
          col("d").cast("double")).as("b"))
    val (rankedB, nDays) = graft.core.GlobalRank.withRank(resid,
      Seq(col("b").asc, col("d").asc), "rn")
    rankedB.filter(col("rn") === (nDays + 1) / 2)
      .crossJoin(broadcast(med))
      .crossJoin(broadcast(days))
      .select(col("n_days"), lit(nPairs).as("n_pairs"),
        col("slope_med").as("slope"), col("b").as("intercept"))
  }

  val qTheilsenSql: String =
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS MATERIALIZED (
       |  SELECT s.d, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM cnt) s
       |  LEFT JOIN cnt c ON c.d = s.d
       |), p AS (
       |  SELECT a.d AS d1, b.d AS d2,
       |    CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE)
       |      AS slope
       |  FROM dense a JOIN dense b ON a.d < b.d
       |), pr AS (
       |  SELECT slope,
       |    row_number() OVER (ORDER BY slope, d1, d2) AS rn,
       |    count(*) OVER () AS np
       |  FROM p
       |), med AS (SELECT slope AS slope_med, np FROM pr
       |           WHERE rn = (np + 1) // 2),
       |resid AS (
       |  SELECT d.d, CAST(d.c AS DOUBLE) - m.slope_med * CAST(d.d
       |    AS DOUBLE) AS b, m.slope_med, m.np
       |  FROM dense d CROSS JOIN med m
       |), rr AS (
       |  SELECT b, slope_med, np,
       |    row_number() OVER (ORDER BY b, d) AS rn,
       |    count(*) OVER () AS nd
       |  FROM resid
       |)
       |SELECT CAST(nd AS BIGINT) AS n_days, CAST(np AS BIGINT) AS n_pairs,
       |  slope_med AS slope, b AS intercept
       |FROM rr WHERE rn = (nd + 1) // 2""".stripMargin

  // ---- q_pacf: partial autocorrelation ---------------------------------

  /** PARTIAL AUTOCORRELATION to `acfMaxLag` via Durbin-Levinson — the
    * ACF's companion every Box-Jenkins identification reads (ACF says
    * how lag k correlates; PACF says how much SURVIVES after
    * regressing out lags 1..k−1 — the AR-order cutoff diagnostic):
    * φ₁₁ = r₁, then φ_kk = (r_k − Σ_j φ_{k−1,j}·r_{k−j}) /
    * (1 − Σ_j φ_{k−1,j}·r_j), φ_{k,j} updated by reflection.
    *
    * Determinism: inputs are the autocorr face's q6 acf values; the
    * recursion is a PINNED double chain — sums accumulate ascending-j
    * left-associated, literally the same IEEE op sequence the
    * generated oracle unrolls (k ≤ 4, so the unroll is 3 layers) —
    * and each φ_kk lands under one q6. NULL acf (zero-variance side)
    * propagates to NULL pacf through both engines' arithmetic.
    *
    * 100 TB shape: everything heavy is the autocorr scan itself; the
    * recursion folds driver-side over the k-bounded (≤ acfMaxLag)
    * relation — the gdTrain/Lloyd driver-fold posture.
    */
  def qPacf(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    pacfFromAcf(spark, qAutocorr(spark, sfDir))
  }

  /** The Durbin-Levinson fold over any (lag, n_pairs, acf) relation —
    * shared by all three faces.
    */
  private[graft] def pacfFromAcf(spark: SparkSession,
                                 acf0: DataFrame): DataFrame = {
    val L = acfMaxLag
    val rows = acf0.collect()
    val r = Array.fill[Option[Double]](L + 1)(None)
    rows.foreach { row =>
      val k = row.getLong(0).toInt
      if (k >= 1 && k <= L && !row.isNullAt(2))
        r(k) = Some(row.getDouble(2))
    }
    // phi(k)(j); None propagates like SQL NULL
    val phi = Array.fill[Option[Double]](L + 1, L + 1)(None)
    phi(1)(1) = r(1)
    for (k <- 2 to L) {
      val deps = (1 until k).map(j =>
        (phi(k - 1)(j), r(k - j), r(j)))
      val kk: Option[Double] =
        if (r(k).isEmpty || deps.exists(d => d._1.isEmpty ||
          d._2.isEmpty || d._3.isEmpty)) None
        else {
          var sn = 0.0; var sd = 0.0
          for (j <- 1 until k) {
            sn += phi(k - 1)(j).get * r(k - j).get
            sd += phi(k - 1)(j).get * r(j).get
          }
          Some((r(k).get - sn) / (1.0 - sd))
        }
      phi(k)(k) = kk
      for (j <- 1 until k) {
        phi(k)(j) =
          if (kk.isEmpty || phi(k - 1)(j).isEmpty ||
            phi(k - 1)(k - j).isEmpty) None
          else Some(phi(k - 1)(j).get - kk.get * phi(k - 1)(k - j).get)
      }
    }
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val out = (1 to L).map { k =>
      org.apache.spark.sql.Row(k.toLong,
        r(k).orNull, phi(k)(k).map(q6).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lag",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("acf",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("pacf",
          org.apache.spark.sql.types.DoubleType))))
      .orderBy(col("lag"))
  }

  lazy val qPacfSql: String = {
    val L = acfMaxLag
    val rr = (1 to L).map(k =>
      s"max(CASE WHEN lag = $k THEN acf END) AS r$k").mkString(",\n    ")
    // unrolled Durbin-Levinson layers: kkK computes the new phi_kk,
    // kK carries the reflected row — ascending-j left-assoc sums,
    // matching the Scala fold's IEEE op order exactly
    val layers = (2 to L).map { k =>
      val sn = (1 until k)
        .map(j => s"(p_${k - 1}_$j * r${k - j})").mkString(" + ")
      val sd = (1 until k)
        .map(j => s"(p_${k - 1}_$j * r$j)").mkString(" + ")
      val refl = (1 until k).map(j =>
        s"p_${k - 1}_$j - kk * p_${k - 1}_${k - j} AS p_${k}_$j")
        .mkString(", ")
      s"""kk$k AS (
         |  SELECT (r$k - ($sn)) / (CAST(1 AS DOUBLE) - ($sd)) AS kk
         |  FROM k${k - 1}, rr
         |), k$k AS (
         |  SELECT kk AS p_${k}_$k, $refl FROM kk$k, k${k - 1}
         |)""".stripMargin
    }.mkString(", ")
    val pacfCase = (1 to L).map(k =>
      s"WHEN s.lag = $k THEN ${graft.pipeline.ParityMath.q6Sql(
        s"p_${k}_$k")}").mkString("\n    ")
    s"""WITH acfq AS (
       |${qAutocorrSql.replace("ORDER BY lag", "")
         .linesIterator.map("  " + _).mkString("\n")}
       |), rr AS (
       |  SELECT
       |    $rr
       |  FROM acfq
       |), k1 AS (SELECT r1 AS p_1_1 FROM rr),
       |$layers
       |SELECT s.lag, a.acf,
       |  CASE
       |    $pacfCase
       |  END AS pacf
       |FROM (SELECT unnest(generate_series(1, $L)) AS lag) s
       |LEFT JOIN acfq a ON a.lag = s.lag
       |CROSS JOIN ${(1 to L).map(k => s"k$k").mkString(" CROSS JOIN ")}
       |ORDER BY s.lag""".stripMargin
  }

  // ---- q_runs_test: Wald-Wolfowitz randomness screen -------------------

  /** WALD-WOLFOWITZ RUNS TEST over the densified daily series — the
    * randomness screen next to the trend pair (Mann-Kendall asks "is
    * there a monotone trend", CUSUM "did the level shift"; this asks
    * the prior question: is the sequence of above/below-median days
    * even EXCHANGEABLE, or does it cluster/alternate beyond chance).
    * Days equal to the median are dropped (the standard two-category
    * reduction); the median is the LOWER median under the (c, d)
    * total order — the q_mad convention, rank-selected so both
    * engines pick the identical element.
    *
    * Determinism: n_above / n_below / runs are exact integers; only
    * the final z = (R − E[R]) / sqrt(V[R]) is floating point — one
    * pinned double chain over exact BIGINTs (sqrt is IEEE
    * correctly-rounded), q6-rounded, guarded NULL when either side is
    * empty or 2·n1·n2 ≤ m (V = 0: the statistic is undefined).
    *
    * 100 TB shape: the same additive per-day count state as the other
    * trend faces (ONE map-combinable agg over the events scan), the
    * median via GlobalRank's range-shuffle rank, then one ordered
    * scan over the TIME-bounded day grid (single-task by contract,
    * like every days-grid window in this file) for the run count.
    */
  def qRunsTest(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    runsFromBuckets(mkBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** The pinned z chain, written ONCE and spliced into both engines:
    * a = n_above, b = n_below, r = runs, m = a + b.
    */
  private val runsZExpr: String =
    """(CAST(runs AS DOUBLE)
      | - (CAST(1 AS DOUBLE)
      |    + (CAST(2 AS DOUBLE) * CAST(n_above AS DOUBLE)
      |       * CAST(n_below AS DOUBLE))
      |      / CAST(n_above + n_below AS DOUBLE)))
      |/ sqrt((CAST(2 AS DOUBLE) * CAST(n_above AS DOUBLE)
      |          * CAST(n_below AS DOUBLE)
      |        * (CAST(2 AS DOUBLE) * CAST(n_above AS DOUBLE)
      |             * CAST(n_below AS DOUBLE)
      |           - CAST(n_above + n_below AS DOUBLE)))
      |       / (CAST(n_above + n_below AS DOUBLE)
      |          * CAST(n_above + n_below AS DOUBLE)
      |          * (CAST(n_above + n_below AS DOUBLE)
      |             - CAST(1 AS DOUBLE))))""".stripMargin

  /** The test over any (d, c) bucket relation — shared by the batch,
    * streaming and store faces (one arriving event shifts its day,
    * possibly the median, and thereby every sign: never storable
    * state beyond the additive counts).
    */
  private[graft] def runsFromBuckets(cnt0: DataFrame): DataFrame = {
    val dense = mkDense(cnt0)
    val days = dense.agg(count(lit(1)).as("n_days"))
    val (ranked, nDays) = graft.core.GlobalRank.withRank(dense,
      Seq(col("c").asc, col("d").asc), "rn")
    val med = ranked.filter(col("rn") === (nDays + 1) / 2)
      .select(col("c").as("c_med"))
    val signed = dense.crossJoin(broadcast(med))
      .filter(col("c") =!= col("c_med"))
      .select(col("d"), (col("c") > col("c_med")).cast("long").as("up"))
    val w = Window.orderBy(col("d"))
    val stats = signed
      .withColumn("prev", lag(col("up"), 1).over(w))
      .agg(
        coalesce(sum(col("up")), lit(0L)).as("n_above"),
        coalesce(sum(lit(1L) - col("up")), lit(0L)).as("n_below"),
        coalesce(sum(when(col("prev").isNull ||
          col("prev") =!= col("up"), 1L).otherwise(0L)), lit(0L))
          .as("runs"))
    stats.crossJoin(broadcast(days)).crossJoin(broadcast(med))
      .select(col("n_days"), col("c_med"),
        col("n_above"), col("n_below"), col("runs"),
        when(col("n_above") > 0 && col("n_below") > 0 &&
          lit(2L) * col("n_above") * col("n_below") >
            col("n_above") + col("n_below"),
          graft.pipeline.ParityMath.q6(expr(runsZExpr))).as("z"))
  }

  val qRunsTestSql: String =
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS MATERIALIZED (
       |  SELECT s.d, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM cnt) s
       |  LEFT JOIN cnt c ON c.d = s.d
       |), n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dense),
       |med AS (
       |  SELECT c AS c_med FROM (
       |    SELECT c, row_number() OVER (ORDER BY c, d) AS rn,
       |           count(*) OVER () AS nd
       |    FROM dense
       |  ) WHERE rn = (nd + 1) // 2
       |), signed AS (
       |  SELECT d, CASE WHEN c > m.c_med THEN 1 ELSE 0 END AS up
       |  FROM dense CROSS JOIN med m WHERE c <> m.c_med
       |), r AS (
       |  SELECT
       |    CAST(coalesce(sum(up), 0) AS BIGINT) AS n_above,
       |    CAST(coalesce(sum(1 - up), 0) AS BIGINT) AS n_below,
       |    CAST(coalesce(sum(CASE WHEN prev IS NULL OR prev <> up
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS runs
       |  FROM (SELECT up, lag(up) OVER (ORDER BY d) AS prev FROM signed)
       |)
       |SELECT n.n_days, m.c_med, r.n_above, r.n_below, r.runs,
       |  CASE WHEN r.n_above > 0 AND r.n_below > 0
       |         AND 2 * r.n_above * r.n_below > r.n_above + r.n_below
       |  THEN ${graft.pipeline.ParityMath.q6Sql(runsZExpr)}
       |  END AS z
       |FROM r, n, med m""".stripMargin

  // ---- q_periodogram: fixed-point DFT power at candidate periods ------

  /** Candidate periods (days) the spectral screen prices: weekly,
    * bi-weekly, monthly — the cycles an event log plausibly carries.
    */
  val periodogramPeriods: Seq[Int] = Seq(7, 14, 30)

  /** FIXED-POINT PERIODOGRAM over the densified daily series: DFT
    * power |Σ_d c'_d · e^{-2πi·d/p}|² at each candidate period p,
    * with c'_d = n·c_d − T the n-scaled mean-centered count (exact
    * integers — scaling by n avoids the fractional mean). The
    * spectral member of the seasonality family: q_seasonality reads
    * the day-of-week PROFILE, q_stl extracts the component; this asks
    * WHICH of the candidate cycles carries the most energy (power is
    * phase-invariant, so the epoch alignment of d % p is immaterial).
    *
    * Determinism: cos/sin are the ONLY transcendentals and they never
    * run in either engine — the micro-unit trig table is generated
    * ONCE in Scala (floor(·10⁶+.5)) and spliced as literals into both
    * the Spark plan and the oracle SQL, so every term, sum and square
    * is exact integer arithmetic in DECIMAL(38,0) ≙ HUGEINT (the
    * q_anomaly scheme). Headroom: |A| ≤ Σ|c'|·10⁶ must stay < 10¹⁹
    * for A² to fit 38 digits — ~27B events/year at a 365-day span;
    * beyond that the counts need a pre-scale, loudly documented here
    * rather than silently wrong.
    *
    * 100 TB shape: everything downstream of the additive per-day
    * count state lives on the DAY grid (≤ a few thousand rows at any
    * corpus scale) joined against a 51-row broadcast trig table — the
    * events scan pays exactly the one map-combinable agg every trend
    * face shares.
    */
  def qPeriodogram(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    periodogramFromBuckets(mkBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** The shared micro-unit trig table: (p, r, cos_mu, sin_mu) for
    * r = 0..p−1 — single source for both engines.
    */
  private[graft] lazy val periodogramTrig: Seq[(Int, Int, Long, Long)] =
    periodogramPeriods.flatMap { p =>
      (0 until p).map { r =>
        val th = 2.0 * math.Pi * r / p
        (p, r, math.floor(math.cos(th) * 1e6 + 0.5).toLong,
          math.floor(math.sin(th) * 1e6 + 0.5).toLong)
      }
    }

  private[graft] def periodogramFromBuckets(cnt0: DataFrame): DataFrame = {
    val spark = cnt0.sparkSession
    import spark.implicits._
    val dense = mkDense(cnt0)
    val tot = dense.agg(count(lit(1)).as("n_days"),
      coalesce(sum(col("c")), lit(0L)).as("t"))
    val trig = periodogramTrig.toDF("p", "r", "cq", "sq")
    val d20 = "decimal(20,0)"
    val ab = dense.crossJoin(broadcast(tot))
      .select(col("d"),
        (col("c") * col("n_days") - col("t")).as("cp"))
      .join(broadcast(trig), pmod(col("d"), col("p")) === col("r"))
      .groupBy(col("p"))
      .agg(sum(col("cp").cast(d20) * col("cq").cast(d20)).as("a"),
        sum(col("cp").cast(d20) * col("sq").cast(d20)).as("b"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    ab.select(col("p").cast("long").as("period"),
        (col("a") * col("a") + col("b") * col("b"))
          .cast("decimal(38,0)").as("pow_exact"))
      .crossJoin(broadcast(tot.select(col("n_days"))))
      .withColumn("is_peak",
        col("pow_exact") === max(col("pow_exact")).over(w))
      // Hash-stable output type: the exact DECIMAL(38,0) integer is
      // proven bit-identical cross-engine, but >18-digit decimals
      // normalize differently on the two read paths of the driver's
      // hash. Both engines cast the IDENTICAL exact integer to DOUBLE
      // (IEEE round-to-nearest of the same integer → same bits); the
      // peak verdict is still decided on the exact integer above.
      .select(col("period"), col("n_days"),
        col("pow_exact").cast("double").as("power"), col("is_peak"))
      .orderBy(col("period"))
  }

  val qPeriodogramSql: String = {
    val values = periodogramTrig
      .map { case (p, r, cq, sq) => s"($p, $r, $cq, $sq)" }
      .mkString(", ")
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS MATERIALIZED (
       |  SELECT s.d, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM cnt) s
       |  LEFT JOIN cnt c ON c.d = s.d
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(coalesce(sum(c), 0) AS BIGINT) AS t
       |  FROM dense
       |), trig(p, r, cq, sq) AS (VALUES $values),
       |ab AS (
       |  SELECT tr.p,
       |    sum(CAST(dense.c * tot.n_days - tot.t AS HUGEINT) * tr.cq)
       |      AS a,
       |    sum(CAST(dense.c * tot.n_days - tot.t AS HUGEINT) * tr.sq)
       |      AS b
       |  FROM dense CROSS JOIN tot
       |  JOIN trig tr ON tr.r = ((dense.d % tr.p) + tr.p) % tr.p
       |  GROUP BY 1
       |)
       |SELECT CAST(p AS BIGINT) AS period,
       |  (SELECT n_days FROM tot) AS n_days,
       |  CAST(a * a + b * b AS DOUBLE) AS power,
       |  a * a + b * b = max(a * a + b * b) OVER () AS is_peak
       |FROM ab ORDER BY period""".stripMargin
  }

  // ---- q_anomaly: rolling z-score outlier detection ------------------

  /** Baseline window (strictly-preceding observations) and the minimum
    * baseline size below which no verdict is issued.
    */
  val anomalyBase = 8
  val anomalyMinN = 4

  /** Rolling 3σ outlier detection per user: a value is anomalous when
    * it deviates from its own trailing baseline (up to the previous
    * `anomalyBase` observations, at least `anomalyMinN`) by more than
    * three baseline standard deviations. The test is evaluated in
    * EXACT integer arithmetic — (n·x − S)² > 9·(n·Q − S²) with
    * S = Σv, Q = Σv² over the baseline in micro-units — so no float
    * sqrt/mean ever runs and both engines agree bitwise. S² reaches
    * ~1.6e19 (past BIGINT), so the two quadratic terms are computed in
    * DECIMAL(38,0) ≙ DuckDB HUGEINT, the same cross-engine scheme as
    * the k-means‖ sampling predicate.
    *
    * 100 TB shape: identical to q_ewma — one user-keyed exchange, one
    * sort, one window frame (counts + two sums), a row-local verdict,
    * zero joins. Output is the anomalous rows only.
    */
  def qAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(-anomalyBase, -1)
    val d20 = "decimal(20,0)"
    Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("value"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"))
      .withColumn("n", count(col("v")).over(wb))
      .withColumn("s", sum(col("v")).over(wb))
      .withColumn("q", sum(col("v") * col("v")).over(wb))
      .filter(col("n") >= anomalyMinN)
      .withColumn("d", (col("n") * col("v") - col("s")).cast(d20))
      .filter(col("d") * col("d") >
        lit(9) * (col("n") * col("q").cast(d20) -
          col("s").cast(d20) * col("s").cast(d20)))
      .select(col("user_id"), col("event_id"), col("value"),
        col("n").as("n_base"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qAnomalySql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, value,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), w AS (
       |  SELECT user_id, event_id, value, v,
       |    count(v) OVER wb AS n,
       |    sum(CAST(v AS HUGEINT)) OVER wb AS s,
       |    sum(CAST(v AS HUGEINT) * v) OVER wb AS q
       |  FROM e
       |  WINDOW wb AS (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS BETWEEN $anomalyBase PRECEDING AND 1 PRECEDING)
       |)
       |SELECT user_id, event_id, value, CAST(n AS BIGINT) AS n_base
       |FROM w
       |WHERE n >= $anomalyMinN
       |  AND (n * CAST(v AS HUGEINT) - s) * (n * CAST(v AS HUGEINT) - s)
       |      > 9 * (n * q - s * s)
       |ORDER BY user_id, event_id""".stripMargin

  // ---- q_holt_winters: seasonal (triple) exponential smoothing --------

  /** Holt-Winters season length: weekly pattern over daily buckets. */
  val hwSeason = 7

  /** ADDITIVE Holt-Winters (triple exponential smoothing) over each
    * event type's densified DAILY count series - the seasonal member
    * completing the forecast family (q_ewma smooths, q_holt adds
    * trend, this adds the weekly cycle q_seasonality showed exists).
    * Smoothing constants α = β = γ = 1/4, all-integer micro-units with
    * truncating division (Scala Long `/` ≙ DuckDB `//`, both
    * toward-zero - verified, so the recursion is bit-replayable):
    *
    *   init (end of the first week, t = 6): L = (Σ x_{0..6}) / 7,
    *     T = 0, S_i = x_i − L;
    *   step t ≥ 7 (x = xmu_t, s7 = season of t − 7):
    *     fc_t = L' + T' + s7          (the one-step-ahead forecast)
    *     L = (x − s7 + 3·(L' + T')) / 4
    *     T = (L − L' + 3·T') / 4
    *     S_t = (x − L + 3·s7) / 4.
    *
    * Execution: the corpus folds to a (type, day) count relation
    * (map-combinable, the xcorr/stl bucket discipline); the recursion
    * itself runs driver-side over that TINY matrix - its size is
    * types × CALENDAR DAYS, bounded by time, not data (the
    * gdTrain/Lloyd posture: distributed aggregation, driver-local
    * fitting of a sequential model no window can express). The oracle
    * replays the exact recursion as a recursive CTE carrying the
    * 7-element season ring.
    */
  /** Densified per-type daily micro-count series (driver-side, TIME-
    * bounded) - shared by the smoother and its backtest.
    */
  /** The per-(type, day) count relation - the ADDITIVE fact the store
    * face accumulates (counts merge by plain sum under any batch
    * split). tus >= 0: same well-definedness contract as
    * q_seasonality.
    */
  private[graft] def hwBuckets(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("et"),
        expr("graft_ts_us(ts)").as("tus"))
      .filter(col("tus") >= 0L)
      .select(col("et"), expr(s"tus DIV ${dayUs}L").as("d"))
      .groupBy(col("et"), col("d")).agg(count(lit(1)).as("c"))

  /** Collect + densify any (et, d, c) bucket relation into per-type
    * micro-count series (driver-side, TIME-bounded).
    */
  private[graft] def hwSeriesFromBuckets(
      cnt0: DataFrame): (Long, Seq[(String, Array[Long])]) = {
    val cnt = cnt0.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap // bounded: types x calendar days
    if (cnt.isEmpty) return (0L, Seq.empty)
    val lo = cnt.keys.map(_._2).min
    val hi = cnt.keys.map(_._2).max
    (lo, cnt.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      et -> (lo to hi).map(d =>
        cnt.getOrElse((et, d), 0L) * 1000000L).toArray
    })
  }

  private def hwSeriesFor(spark: SparkSession,
                          sfDir: String): (Long, Seq[(String, Array[Long])]) =
    hwSeriesFromBuckets(hwBuckets(Graft.table(spark, sfDir, "events")))

  /** The smoother as a view over any bucket relation - shared with
    * the incremental store face.
    */
  private[graft] def hwFromBuckets(cnt0: DataFrame): DataFrame = {
    val spark = cnt0.sparkSession
    import spark.implicits._
    val (lo, series) = hwSeriesFromBuckets(cnt0)
    series.flatMap { case (et, xs) =>
      hwFold(xs).map { case (t, lvl, tr, ns, fc) =>
        (et, lo + t, xs(t) / 1000000L, lvl, tr, ns, fc)
      }
    }.toDF("et", "day", "n_events", "level_mu", "trend_mu",
        "season_mu", "forecast_mu")
      .orderBy(col("et"), col("day"))
  }

  /** The exact integer recursion: (t, level, trend, season_t,
    * forecast_t) for every t >= hwSeason.
    */
  private def hwFold(xs: Array[Long]): Seq[(Int, Long, Long, Long, Long)] =
    if (xs.length < hwSeason + 1) Seq.empty
    else {
      var lvl = xs.take(hwSeason).sum / hwSeason
      var tr = 0L
      val seas = scala.collection.mutable.Queue(
        xs.take(hwSeason).map(_ - lvl): _*)
      (hwSeason until xs.length).map { t =>
        val x = xs(t)
        val s7 = seas.dequeue()
        val fc = lvl + tr + s7
        val nl = (x - s7 + 3L * (lvl + tr)) / 4L
        val nt = (nl - lvl + 3L * tr) / 4L
        val ns = (x - nl + 3L * s7) / 4L
        lvl = nl; tr = nt; seas.enqueue(ns)
        (t, lvl, tr, ns, fc)
      }
    }

  def qHoltWinters(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    hwFromBuckets(hwBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** Honest HW backtest (the q_forecast_eval discipline): per type,
    * the one-step-ahead MAE of the Holt-Winters forecast against the
    * NAIVE (yesterday) and SEASONAL-NAIVE (last week's same day)
    * baselines over the identical day range - the number that says
    * whether the seasonal model earns its state. All-integer micro
    * MAEs (truncating division both engines).
    */
  def qHwEval(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    import spark.implicits._
    val (_, series) = hwSeriesFor(spark, sfDir)
    series.flatMap { case (et, xs) =>
      val folds = hwFold(xs)
      if (folds.isEmpty) None
      else {
        val n = folds.length.toLong
        val hw = folds.map { case (t, _, _, _, fc) =>
          math.abs(fc - xs(t)) }.sum
        val nv = folds.map { case (t, _, _, _, _) =>
          math.abs(xs(t - 1) - xs(t)) }.sum
        val sn = folds.map { case (t, _, _, _, _) =>
          math.abs(xs(t - hwSeason) - xs(t)) }.sum
        Some((et, n, hw / n, nv / n, sn / n))
      }
    }.toDF("et", "n_days", "mae_hw_mu", "mae_naive_mu", "mae_snaive_mu")
      .orderBy(col("et"))
  }

  private lazy val hwFoldCtes: String =
    s"""WITH RECURSIVE cnt AS (
       |  SELECT event_type AS et, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", dayUs.toString)} AS d,
       |         count(*) AS c
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |    AND epoch_us(ts) >= 0
       |  GROUP BY 1, 2
       |), spine AS (
       |  SELECT unnest(range((SELECT min(d) FROM cnt),
       |                      (SELECT max(d) FROM cnt) + 1)) AS d
       |), dense AS (
       |  SELECT ty.et, s.d,
       |    CAST(COALESCE(c.c, 0) * 1000000 AS BIGINT) AS xmu,
       |    CAST(row_number() OVER (PARTITION BY ty.et ORDER BY s.d) - 1
       |         AS BIGINT) AS t
       |  FROM (SELECT DISTINCT et FROM cnt) ty
       |  CROSS JOIN spine s
       |  LEFT JOIN cnt c ON c.et = ty.et AND c.d = s.d
       |), mx AS (
       |  SELECT et, max(t) AS mx FROM dense GROUP BY et
       |), init AS (
       |  SELECT et, CAST(sum(xmu) // $hwSeason AS BIGINT) AS lvl,
       |    list(xmu ORDER BY t) AS xs
       |  FROM dense WHERE t < $hwSeason GROUP BY et
       |), fold AS (
       |  SELECT i.et, CAST($hwSeason - 1 AS BIGINT) AS t,
       |    i.lvl, CAST(0 AS BIGINT) AS tr,
       |    list_transform(i.xs, x -> x - i.lvl) AS seas,
       |    CAST(NULL AS BIGINT) AS x, CAST(NULL AS BIGINT) AS fc,
       |    CAST(NULL AS BIGINT) AS st
       |  FROM init i JOIN mx ON mx.et = i.et AND mx.mx >= $hwSeason
  |  UNION ALL
       |  -- lateral aliases must NOT collide with fold's column names:
       |  -- an unqualified `lvl` would bind to f.lvl, not the alias
       |  SELECT f.et, f.t + 1,
       |    CAST((d.xmu - f.seas[1] + 3 * (f.lvl + f.tr)) // 4
       |         AS BIGINT) AS nlvl,
       |    CAST((nlvl - f.lvl + 3 * f.tr) // 4 AS BIGINT) AS ntr,
       |    list_append(f.seas[2:],
       |      CAST((d.xmu - nlvl + 3 * f.seas[1]) // 4 AS BIGINT)),
       |    d.xmu,
       |    f.lvl + f.tr + f.seas[1],
       |    CAST((d.xmu - nlvl + 3 * f.seas[1]) // 4 AS BIGINT)
       |  FROM fold f
       |  JOIN dense d ON d.et = f.et AND d.t = f.t + 1
       |  JOIN mx ON mx.et = f.et AND f.t < mx.mx
       |)""".stripMargin

  lazy val qHoltWintersSql: String =
    s"""$hwFoldCtes
       |SELECT f.et, d.d AS day, f.x // 1000000 AS n_events,
       |  f.lvl AS level_mu, f.tr AS trend_mu, f.st AS season_mu,
       |  f.fc AS forecast_mu
       |FROM fold f JOIN dense d ON d.et = f.et AND d.t = f.t
       |WHERE f.t >= $hwSeason
       |ORDER BY f.et, day""".stripMargin

  lazy val qHwEvalSql: String =
    s"""$hwFoldCtes
       |SELECT f.et, CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(abs(f.fc - f.x)) // count(*) AS BIGINT) AS mae_hw_mu,
       |  CAST(sum(abs(p1.xmu - f.x)) // count(*) AS BIGINT)
       |    AS mae_naive_mu,
       |  CAST(sum(abs(p7.xmu - f.x)) // count(*) AS BIGINT)
       |    AS mae_snaive_mu
       |FROM fold f
       |JOIN dense p1 ON p1.et = f.et AND p1.t = f.t - 1
       |JOIN dense p7 ON p7.et = f.et AND p7.t = f.t - $hwSeason
       |WHERE f.t >= $hwSeason
       |GROUP BY f.et ORDER BY f.et""".stripMargin

  // ---- q_sax: symbolic aggregate approximation -------------------------

  /** SAX segments per user series (the word length). */
  val saxSegments = 8

  /** SAX symbolization (Lin et al., "Experiencing SAX", DMKD 2007):
    * each user's value series, ordered by (event time, event_id), is
    * z-normalized, averaged into `saxSegments` equal-count segments
    * (PAA), and each segment mean is quantized against the N(0,1)
    * quartile breakpoints ±0.6745 into a 4-symbol alphabet a|b|c|d -
    * the discretization that turns numeric series into tokens for
    * motif mining, sequence indexing, or feeding the text family's
    * n-gram machinery.
    *
    * ALL-INTEGER symbol decisions: z_g < β never divides or roots.
    * With per-user n, S = Σv, Q = Σv² and per-segment c, s_g (v in
    * exact milli-units), z_g = L / (c·√R2) for L = n·s_g − c·S and
    * R2 = n·Q − S², so z_g < β ⇔ 10⁴·L < 6745·c·√R2, decided by sign
    * plus ONE cross-multiplied square compare in DECIMAL(38) ≙ HUGEINT
    * (the q_anomaly discipline; c·(c−1)-style exactness, headroom to
    * n·v_milli ≈ 2×10¹³ per user). The reported PAA mean is the only
    * float: one final division, q6 both engines.
    *
    * Scale shape: one rank window keyed on user_id (per-user stats
    * ride the same pass), one (user, segment) map-combinable agg -
    * nothing global, nothing quadratic.
    */
  def qSax(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    saxFrom(Graft.table(spark, sfDir, "events"))
  }

  private[graft] def saxFrom(events: DataFrame): DataFrame = {
    val d = "decimal(38,0)"
    val wr = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val wu = Window.partitionBy(col("user_id"))
    val e = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"),
        expr("CAST(floor(value * 1000.0 + 0.5) AS BIGINT)").as("v"))
      .withColumn("r", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wu))
      .withColumn("s", sum(col("v")).over(wu))
      .withColumn("q", sum(col("v").cast(d) * col("v").cast(d)).over(wu))
    e.groupBy(col("user_id"),
        expr(s"((r - 1) * $saxSegments) DIV n").as("seg"),
        col("n"), col("s"), col("q"))
      .agg(count(lit(1)).as("m"), sum(col("v")).as("sg"))
      .withColumn("bigL", col("n").cast(d) * col("sg").cast(d) -
        col("m").cast(d) * col("s").cast(d))
      .withColumn("r2",
        col("n").cast(d) * col("q") - col("s").cast(d) * col("s").cast(d))
      .withColumn("lhs2",
        lit(100000000L).cast(d) * col("bigL") * col("bigL"))
      .withColumn("rhs2", lit(45495025L).cast(d) *
        col("m").cast(d) * col("m").cast(d) * col("r2"))
      .select(col("user_id"), col("seg"), col("m").as("n_seg"),
        graft.pipeline.ParityMath.q6(col("sg").cast("double") /
          (col("m") * 1000L).cast("double")).as("paa"),
        when(col("bigL") < 0 && col("lhs2") > col("rhs2"), "a")
          .when(col("bigL") < 0, "b")
          .when(col("bigL") === 0 || col("lhs2") < col("rhs2"), "c")
          .otherwise("d").as("symbol"))
      .orderBy(col("user_id"), col("seg"))
  }

  private lazy val saxCtes: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id,
       |    CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |    AND value IS NOT NULL
       |), w AS (
       |  SELECT user_id, v,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY tus, event_id) AS r,
       |    count(*) OVER wu AS n,
       |    sum(v) OVER wu AS s,
       |    sum(CAST(v AS HUGEINT) * v) OVER wu AS q
       |  FROM e WINDOW wu AS (PARTITION BY user_id)
       |), seg AS (
       |  SELECT user_id, ((r - 1) * $saxSegments) // n AS seg, n, s, q,
       |    count(*) AS m, CAST(sum(v) AS BIGINT) AS sg
       |  FROM w GROUP BY 1, 2, 3, 4, 5
       |), c AS (
       |  SELECT user_id, seg, m, sg,
       |    (CAST(n AS HUGEINT) * sg - CAST(m AS HUGEINT) * s) AS L,
       |    (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) AS r2
       |  FROM seg
       |)
       |""".stripMargin.stripSuffix("\n")

  private lazy val saxSelect: String =
    s"""SELECT user_id, CAST(seg AS BIGINT) AS seg,
       |  CAST(m AS BIGINT) AS n_seg,
       |  (floor(CAST(sg AS DOUBLE) / CAST(m * 1000 AS DOUBLE)
       |     * 1000000.0 + 0.5) / 1000000.0) AS paa,
       |  CASE WHEN L < 0 AND 100000000 * L * L
       |              > 45495025 * CAST(m AS HUGEINT) * m * r2 THEN 'a'
       |       WHEN L < 0 THEN 'b'
       |       WHEN L = 0 OR 100000000 * L * L
       |              < 45495025 * CAST(m AS HUGEINT) * m * r2 THEN 'c'
       |       ELSE 'd' END AS symbol
       |FROM c""".stripMargin

  lazy val qSaxSql: String =
    s"$saxCtes\n$saxSelect ORDER BY user_id, seg"

  /** SAX WORDS + temporal-shape cohorts: each user's per-segment
    * symbols concatenated in segment order into one word, then users
    * grouped by identical words - the "who moves alike" face that is
    * the point of symbolizing (motif mining over tokens instead of
    * distances). One extra user-keyed agg + one tiny word-keyed agg
    * on top of the sax relation.
    */
  def qSaxWord(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    saxFrom(Graft.table(spark, sfDir, "events"))
      .groupBy(col("user_id"))
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(seg, symbol))), x -> x.symbol), '')")
        .as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_users"),
        min(col("user_id")).as("exemplar_user"))
      .orderBy(col("n_users").desc, col("word"))
  }

  lazy val qSaxWordSql: String =
    s"""$saxCtes, sax AS (
       |$saxSelect
       |), words AS (
       |  SELECT user_id, string_agg(symbol, '' ORDER BY seg) AS word
       |  FROM sax GROUP BY user_id
       |)
       |SELECT word, CAST(count(*) AS BIGINT) AS n_users,
       |  min(user_id) AS exemplar_user
       |FROM words GROUP BY word
       |ORDER BY n_users DESC, word""".stripMargin

  // ---- q_decay_count: recency-weighted count cache --------------------

  /** Decay halflife (1 day) and the age cap beyond which weight is 0. */
  val decayHalflifeUs: Long = 24L * 3600 * 1000000L
  val decayMaxAge = 40

  /** Recency-weighted count cache: the reference's CountCache with an
    * exponential decay — each tuple contributes 2^-(age/halflife) of
    * a count, so "hot lately" and "hot ever" separate (the recency
    * prior every ranking/trending feature wants from an event rollup).
    *
    * Exactness scheme: ages are whole halflives between CALENDAR
    * buckets (day_max − day, so the bucketed relation is additive and
    * the store/streaming faces share this oracle), the weight is
    * 1e6 >> age (a BIGINT SHIFT, no pow/float anywhere), ages past
    * `decayMaxAge` contribute 0. One map-combinable (p, s, o, day)
    * count + one (p, s, o) fold; the max day is a 1-row broadcast.
    */
  /** Day-bucketed (p, s, o, day, c) counts from any extracted tuple
    * relation - one map-combinable keyed count; ages are whole
    * halflives between CALENDAR buckets (day_max − day), so the
    * relation is additive across arrivals and the decay is exactly
    * re-derivable from it (the store/streaming faces' state).
    */
  private[graft] def decayBuckets(tuples: DataFrame): DataFrame =
    tuples
      .select(col("p"), col("s"), col("o"),
        expr(graft.pipeline.ParityMath.fdivSql("t", s"${decayHalflifeUs}L")).as("day"))
      .groupBy(col("p"), col("s"), col("o"), col("day"))
      .agg(count(lit(1)).as("c"))

  def qDecayCount(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    decayFromBuckets(decayBuckets(
      graft.core.Transform.extract(spark, sfDir)))
  }

  /** The decay evaluation over any (p, s, o, day, c) day-bucketed
    * count relation - shared by the incremental store face and the
    * streaming face, whose state IS this relation (counts per day
    * bucket are ADDITIVE, so decay becomes a query-time view over a
    * mergeable summary - the sketch-store idea applied to recency
    * weighting; state is keys × ≤41 live day buckets).
    */
  private[graft] def decayFromBuckets(buckets0: DataFrame): DataFrame = {
    // materialize the bucket relation ONCE (keys × ≤41 live days -
    // small by construction): the 1-row max-day branch would otherwise
    // re-derive the whole upstream subtree (for the batch face, a
    // second full scan + extract of the corpus)
    val buckets = buckets0.localCheckpoint()
    val tmax = buckets.agg(max(col("day")).as("day_max"))
    buckets.crossJoin(broadcast(tmax))
      .select(col("p"), col("s"), col("o"), col("c"),
        (col("day_max") - col("day")).cast("int").as("age"))
      .groupBy(col("p"), col("s"), col("o"))
      .agg(sum(col("c")).as("cnt"),
        sum(when(col("age") < decayMaxAge,
          col("c") * expr("1000000L DIV shiftleft(1L, age)"))
          .otherwise(0L)).as("decayed_mu"))
      .orderBy(col("p"), col("s"), col("o"))
  }

  val qDecayCountSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |b AS (
       |  SELECT p, s, o, ${graft.pipeline.ParityMath.fdivDuckSql("t", decayHalflifeUs.toString)} AS day, count(*) AS c
       |  FROM tuples GROUP BY 1, 2, 3, 4
       |),
       |tm AS (SELECT max(day) AS day_max FROM b),
       |aged AS (
       |  SELECT p, s, o, c,
       |    CAST(tm.day_max - day AS INT) AS age
       |  FROM b CROSS JOIN tm
       |)
       |SELECT p, s, o, CAST(sum(c) AS BIGINT) AS cnt,
       |  CAST(sum(CASE WHEN age < $decayMaxAge
       |                THEN c * (1000000 // (CAST(1 AS BIGINT) << age))
       |                ELSE 0 END) AS BIGINT) AS decayed_mu
       |FROM aged GROUP BY 1, 2, 3 ORDER BY p, s, o""".stripMargin

  // ---- q_trending: recent-vs-prior lift ranking -----------------------

  /** How many top items the trending report emits. */
  val trendingTopN = 20

  /** Trending objects: rank every object by the LIFT of its most
    * recent day-bucket count over the bucket before (add-one smoothed,
    * so new arrivals rank by absolute recency volume and division is
    * total) — the "what is suddenly hot" complement to `q_decay_count`
    * ("hot lately, smoothly"). Objects active in neither of the two
    * buckets are excluded (their lift is the smoothing artifact 1).
    *
    * Exactness: lift is INTEGER micro-units — (c_r+1)·1e6 DIV (c_p+1)
    * — so ranking never compares floats; ties break by (c_r desc,
    * o asc), making the whole report deterministic.
    *
    * 100 TB shape: ONE events scan — the (o, day) counts aggregate
    * with map-side combine; the max day comes from THAT bucketed
    * relation (never a second scan) as a 1-row broadcast; the final
    * per-o fold runs over the bucket relation (≤ distinct objects ×
    * live days); and the top-N is a TakeOrderedAndProject (per-
    * partition heaps + an N-row driver merge), never a global sort.
    */
  def qTrending(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    trendingFromBuckets(graft.core.Transform.extract(spark, sfDir)
      .select(col("o"), expr(graft.pipeline.ParityMath.fdivSql("t", s"${decayHalflifeUs}L")).as("day"))
      .groupBy(col("o"), col("day"))
      .agg(count(lit(1)).as("c")))
  }

  /** The trending report over any (o, day, c) day-bucketed count
    * relation — shared by the batch face and the streaming face,
    * whose state IS this relation (per-day counts are ADDITIVE, the
    * `decayFromBuckets` pattern on the lift axis): the report is a
    * query-time view because one arriving event can move day_max and
    * reprice every object's lift.
    */
  private[graft] def trendingFromBuckets(b0: DataFrame): DataFrame = {
    // materialize the bucket relation ONCE (pagerank's localCheckpoint
    // pattern): without it the 1-row max-day branch re-derives the
    // whole upstream subtree (for the batch face, a second full
    // scan + extract of the corpus)
    val b = b0.localCheckpoint()
    val dmax = b.agg(max(col("day")).as("day_max"))
    b.crossJoin(broadcast(dmax))
      .filter(col("day") >= col("day_max") - 1)
      .groupBy(col("o"))
      .agg(sum(when(col("day") === col("day_max"), col("c"))
          .otherwise(0L)).as("cnt_recent"),
        sum(when(col("day") === col("day_max") - 1, col("c"))
          .otherwise(0L)).as("cnt_prev"))
      .select(col("o"), col("cnt_recent"), col("cnt_prev"),
        expr("(cnt_recent + 1L) * 1000000L DIV (cnt_prev + 1L)")
          .as("lift_mu"))
      .orderBy(col("lift_mu").desc, col("cnt_recent").desc, col("o"))
      .limit(trendingTopN)
  }

  val qTrendingSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |b AS (
       |  SELECT o, ${graft.pipeline.ParityMath.fdivDuckSql("t", decayHalflifeUs.toString)} AS day, count(*) AS c
       |  FROM tuples GROUP BY 1, 2
       |),
       |tm AS (SELECT max(day) AS day_max FROM b),
       |f AS (
       |  SELECT o,
       |    sum(CASE WHEN day = tm.day_max THEN c ELSE 0 END) AS cnt_recent,
       |    sum(CASE WHEN day = tm.day_max - 1 THEN c ELSE 0 END) AS cnt_prev
       |  FROM b CROSS JOIN tm
       |  WHERE day >= tm.day_max - 1
       |  GROUP BY 1
       |)
       |SELECT o, CAST(cnt_recent AS BIGINT) AS cnt_recent,
       |  CAST(cnt_prev AS BIGINT) AS cnt_prev,
       |  CAST((cnt_recent + 1) * 1000000 // (cnt_prev + 1) AS BIGINT)
       |    AS lift_mu
       |FROM f
       |ORDER BY lift_mu DESC, cnt_recent DESC, o
       |LIMIT $trendingTopN""".stripMargin

  // ---- q_seasonality: hour-of-day x day-of-week activity profile -----

  private[graft] val hourUs: Long = 3600L * 1000000L
  private[graft] val dayUs: Long = 24L * hourUs

  /** Seasonality profile: event volume per (day-of-week, hour-of-day)
    * cell plus the lift of each cell against a perfectly uniform week —
    * the "when is this system actually used" matrix behind load
    * forecasting, anomaly baselines (q_anomaly's per-entity z-score
    * deliberately ignores time-of-day; this is the global counterpart),
    * and crawl scheduling.
    *
    * Cell math is pure integer epoch arithmetic (epoch day 0 is a
    * Thursday, hence the +4 day-of-week shift) — identical in both
    * engines with no timezone or calendar library in the plan. The
    * lift is ONE q6-quantized double division per cell.
    *
    * 100 TB shape: one events scan into a map-combinable 168-cell
    * aggregation; the total for the lift comes from a window over the
    * TINY matrix (never a second scan — the q_cohort lesson). Nothing
    * shuffles but 168 partial rows per input partition.
    */
  def qSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // tus >= 0 is part of the operator contract, enforced on BOTH
    // faces: for negative (pre-epoch) timestamps the truncating
    // integer DIV/% (BOTH engines truncate — DuckDB 1.0.0 integer //
    // truncates too, see ParityMath.fdivDuckSql) would put dow/hour
    // outside 0..6/0..23. The filter makes the integer bucket math
    // well-defined instead of data-dependent.
    seasonalityFromCells(seasonalityCells(
      Graft.table(spark, sfDir, "events")))
  }

  /** The (dow, hour) cell aggregation — shared by the batch and
    * streaming faces so the bucket math cannot drift.
    */
  private[graft] def seasonalityCells(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .select(expr("graft_ts_us(ts)").as("tus"))
      .filter(col("tus") >= 0L)
      .select(expr(s"((tus DIV ${dayUs}L) + 4L) % 7L").as("dow"),
        expr(s"(tus DIV ${hourUs}L) % 24L").as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))

  /** The lift view over any (dow, hour, n_events) cell matrix — the
    * streaming face's state IS this ≤168-cell ADDITIVE matrix; lift is
    * a query-time view because every arriving event moves the total.
    * (The empty-partition window here runs over ≤168 rows by
    * construction — bounded, not data-sized.)
    */
  private[graft] def seasonalityFromCells(cells: DataFrame): DataFrame =
    cells
      .withColumn("total", sum(col("n_events")).over(Window.partitionBy()))
      .select(col("dow"), col("hour"), col("n_events"),
        graft.pipeline.ParityMath.q6(
          col("n_events").cast("double") * lit(168.0) /
            col("total").cast("double")).as("lift"))
      .orderBy(col("dow"), col("hour"))

  val qSeasonalitySql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS tus FROM events
       |  WHERE ts IS NOT NULL AND epoch_us(ts) >= 0
       |), c AS (
       |  SELECT ((tus // $dayUs) + 4) % 7 AS dow,
       |         (tus // $hourUs) % 24 AS hour,
       |         count(*) AS n_events
       |  FROM e GROUP BY 1, 2
       |), t AS (
       |  SELECT dow, hour, n_events, sum(n_events) OVER () AS total
       |  FROM c
       |)
       |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       |  CAST(n_events AS BIGINT) AS n_events,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(n_events AS DOUBLE) * 168.0 / CAST(total AS DOUBLE)")}
       |    AS lift
       |FROM t ORDER BY dow, hour""".stripMargin

  // ---- q_psi_drift: population-stability drift between time halves ---

  /** POPULATION STABILITY INDEX of the event-type mix between the
    * corpus's two time halves — the distribution-level drift monitor
    * next to `q_changepoint`'s mean-level one (the standard production
    * check before retraining on fresh data: PSI < 0.1 stable, > 0.25
    * act). Split at the exact midpoint (min+max) DIV 2 of the event
    * time (integer, deterministic — no median sort); per-type ref/cur
    * counts are ONE map-combinable aggregation; Laplace-smoothed
    * shares p = (c+1)/(n+k) make every ln argument positive with no
    * epsilon hacks (k = observed types); each term (p−q)·ln(p/q) is
    * the identical double text on both engines, and the TOTAL folds
    * the per-type terms in event_type order (the mixCutoffs
    * sorted-fold discipline — a plain 5-double sum would be
    * partition-order-dependent). 100 TB cost: one scan + a 5-row
    * reduction; the broadcast bounds row is the only extra exchange.
    */
  def qPsiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val ev = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(expr("graft_ts_us(ts)").as("tus"), col("event_type"))
    val bounds = ev.agg(min(col("tus")).as("lo"), max(col("tus")).as("hi"))
    val counts = ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        expr(s"IF(tus <= ${graft.pipeline.ParityMath.fdivSql("lo + hi", "2L")}, 1L, 0L)").as("is_ref"))
      .groupBy(col("event_type"))
      .agg(sum(col("is_ref")).as("c_ref"),
        sum(lit(1L) - col("is_ref")).as("c_cur"))
    val totals = counts.agg(sum(col("c_ref")).as("n_ref"),
      sum(col("c_cur")).as("n_cur"), count(lit(1)).as("k"))
    val termExpr =
      """((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE))
        |  - (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + k AS DOUBLE)))
        | * ln((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE))
        |      / (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + k AS DOUBLE)))"""
        .stripMargin
    val terms = counts.crossJoin(broadcast(totals))
      .select(col("event_type"), col("c_ref"), col("c_cur"),
        expr(termExpr).as("term"))
    val total = terms
      .agg(expr(
        """aggregate(array_sort(collect_list(struct(event_type, term))),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)""".stripMargin)
        .as("psi_raw"))
    terms.crossJoin(broadcast(total))
      .select(col("event_type"), col("c_ref"), col("c_cur"),
        graft.pipeline.ParityMath.q6(col("term")).as("psi_term"),
        graft.pipeline.ParityMath.q6(col("psi_raw")).as("psi_total"))
      .orderBy(col("event_type"))
  }

  val qPsiDriftSql: String = {
    val termSql =
      """((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE))
        |  - (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + k AS DOUBLE)))
        | * ln((CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + k AS DOUBLE))
        |      / (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + k AS DOUBLE)))"""
        .stripMargin
    s"""WITH e AS (
       |  SELECT epoch_us(ts) AS tus, event_type
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |), b AS (
       |  SELECT min(tus) AS lo, max(tus) AS hi FROM e
       |), c AS (
       |  SELECT event_type,
       |    sum(CASE WHEN tus <= ${graft.pipeline.ParityMath.fdivDuckSql("lo + hi", "2")} THEN 1 ELSE 0 END)
       |      AS c_ref,
       |    sum(CASE WHEN tus <= ${graft.pipeline.ParityMath.fdivDuckSql("lo + hi", "2")} THEN 0 ELSE 1 END)
       |      AS c_cur
       |  FROM e CROSS JOIN b GROUP BY event_type
       |), t AS (
       |  SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
       |         CAST(sum(c_cur) AS BIGINT) AS n_cur,
       |         CAST(count(*) AS BIGINT) AS k
       |  FROM c
       |), terms AS (
       |  SELECT event_type, CAST(c_ref AS BIGINT) AS c_ref,
       |         CAST(c_cur AS BIGINT) AS c_cur,
       |         $termSql AS term
       |  FROM c CROSS JOIN t
       |), tot AS (
       |  SELECT list_sum(list(term ORDER BY event_type)) AS psi_raw
       |  FROM terms
       |)
       |SELECT event_type, c_ref, c_cur,
       |  ${graft.pipeline.ParityMath.q6Sql("term")} AS psi_term,
       |  ${graft.pipeline.ParityMath.q6Sql("psi_raw")} AS psi_total
       |FROM terms CROSS JOIN tot
       |ORDER BY event_type""".stripMargin
  }

  // ---- q_cusum: online drift detection over the daily series -----------

  /** Page's CUSUM (1954) over the densified daily series — the ONLINE
    * member of the changepoint family (q_changepoint finds the best
    * split in hindsight; CUSUM is what a monitor computes as days
    * arrive: the running excursion of the series above/below its
    * reference level, and where that excursion peaked). The sequential
    * max(0, S+d) recursion has the classic closed form over prefix
    * sums — S⁺_t = P_t − min(0, min_{i≤t} P_i), S⁻_t mirrored — so
    * the whole detector is two running windows, no recursion.
    *
    * Exactness: deviations are scaled by n (d_t = n·c_t − T, so the
    * reference mean T/n never divides) — every quantity is a BIGINT
    * in count·days units and both engines agree bitwise; excursion
    * peaks are argmax rows under the total (excursion DESC, day ASC)
    * order. 100 TB shape: one corpus scan folds to the days-sized
    * relation; the running windows ride that TINY series (the stl
    * "window over the tiny matrix" posture).
    */
  def qCusum(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    cusumFromBuckets(mkBuckets(Graft.table(spark, sfDir, "events")))
  }

  private[graft] def cusumFromBuckets(cnt0: DataFrame): DataFrame = {
    val dense = mkDense(cnt0)
    val tot = dense.agg(sum(col("c")).as("t"),
      count(lit(1)).as("n_days"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val s = dense.crossJoin(broadcast(tot))
      .select(col("d"), col("n_days"),
        (col("n_days") * col("c") - col("t")).as("dd"))
      .withColumn("p", sum(col("dd")).over(w))
      .withColumn("up", col("p") -
        least(lit(0L), min(col("p")).over(w)))
      .withColumn("down",
        greatest(lit(0L), max(col("p")).over(w)) - col("p"))
      .localCheckpoint()
    val up = s.orderBy(col("up").desc, col("d")).limit(1)
      .select(col("n_days"), col("d").as("up_day"),
        col("up").as("up_exc"))
    val down = s.orderBy(col("down").desc, col("d")).limit(1)
      .select(col("d").as("down_day"), col("down").as("down_exc"))
    up.crossJoin(broadcast(down))
  }

  val qCusumSql: String =
    s"""WITH cnt AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL GROUP BY 1
       |), dense AS MATERIALIZED (
       |  SELECT s.d, coalesce(c.c, 0) AS c
       |  FROM (SELECT unnest(range(min(d), max(d) + 1)) AS d FROM cnt) s
       |  LEFT JOIN cnt c ON c.d = s.d
       |), tot AS (SELECT sum(c) AS t, CAST(count(*) AS BIGINT) AS n_days
       |           FROM dense),
       |s0 AS (
       |  SELECT d, n_days,
       |    sum(n_days * c - t) OVER (ORDER BY d ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM dense CROSS JOIN tot
       |), s AS MATERIALIZED (
       |  SELECT d, n_days,
       |    p - least(0, min(p) OVER wd) AS up,
       |    greatest(0, max(p) OVER wd) - p AS down
       |  FROM s0
       |  WINDOW wd AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
       |                AND CURRENT ROW)
       |), u AS (
       |  SELECT n_days, d AS up_day, CAST(up AS BIGINT) AS up_exc
       |  FROM s ORDER BY up DESC, d LIMIT 1
       |), dn AS (
       |  SELECT d AS down_day, CAST(down AS BIGINT) AS down_exc
       |  FROM s ORDER BY down DESC, d LIMIT 1
       |)
       |SELECT n_days, up_day, up_exc, down_day, down_exc
       |FROM u CROSS JOIN dn""".stripMargin

  // ---- q_changepoint: best mean-shift split over the daily series ----

  /** Mean-shift changepoint scan: for every split point of the daily
    * event-count series, the absolute difference between the mean
    * volume before (inclusive) and after the split — the exhaustive
    * single-changepoint scan (the inner step of binary segmentation /
    * CUSUM-style drift detection) a pipeline runs on a source's daily
    * volume to find the day the crawler broke or the upstream schema
    * changed. The top split is flagged.
    *
    * 100 TB shape: the events scan collapses to a map-combinable
    * per-day count first; every window after that (cumulative sum/count
    * forward, total) runs over the TINY daily matrix. The doubles are
    * two divisions + one subtraction per day, q6-quantized.
    */
  /** Split scan over any per-day (day, n_events) count relation —
    * shared by the batch face and the streaming face (whose streamed
    * state IS the additive daily count matrix).
    */
  private[graft] def changepointFrom(daily: DataFrame): DataFrame = {
    val wcum = Window.partitionBy().orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy()
    val scored = daily
      .withColumn("cum_n", sum(col("n_events")).over(wcum))
      .withColumn("cum_d", count(lit(1)).over(wcum))
      .withColumn("tot_n", sum(col("n_events")).over(wall))
      .withColumn("tot_d", count(lit(1)).over(wall))
      .filter(col("cum_d") < col("tot_d"))
      .select(col("day"), col("n_events"),
        graft.pipeline.ParityMath.q6(abs(
          col("cum_n").cast("double") / col("cum_d").cast("double") -
            (col("tot_n") - col("cum_n")).cast("double") /
              (col("tot_d") - col("cum_d")).cast("double"))).as("score"))
    scored
      .withColumn("mx", max(col("score")).over(wall))
      .withColumn("best_day",
        min(when(col("score") === col("mx"), col("day"))).over(wall))
      .select(col("day"), col("n_events"), col("score"),
        (col("score") === col("mx") && col("day") === col("best_day"))
          .as("is_change"))
      .orderBy(col("day"))
  }

  def qChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // ts >= 0 contract as in qSeasonality: pre-epoch timestamps would
    // hit the DIV-truncates / //-floors divergence between engines
    changepointFrom(Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull)
      .select(expr("graft_ts_us(ts)").as("tus"))
      .filter(col("tus") >= 0L)
      .select(expr(s"tus DIV ${dayUs}L").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_events")))
  }

  val qChangepointSql: String =
    s"""WITH e AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", dayUs.toString)} AS day FROM events
       |  WHERE ts IS NOT NULL AND epoch_us(ts) >= 0
       |), d AS (
       |  SELECT day, count(*) AS n_events FROM e GROUP BY 1
       |), c AS (
       |  SELECT day, n_events,
       |    sum(n_events) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
       |    row_number() OVER (ORDER BY day) AS cum_d,
       |    sum(n_events) OVER () AS tot_n,
       |    count(*) OVER () AS tot_d
       |  FROM d
       |), s AS (
       |  SELECT day, n_events,
       |    ${graft.pipeline.ParityMath.q6Sql(
            "abs(CAST(cum_n AS DOUBLE) / CAST(cum_d AS DOUBLE) - " +
            "CAST(tot_n - cum_n AS DOUBLE) / CAST(tot_d - cum_d AS DOUBLE))")}
       |      AS score
       |  FROM c WHERE cum_d < tot_d
       |), m AS (
       |  SELECT day, n_events, score, max(score) OVER () AS mx FROM s
       |), b AS (
       |  SELECT day, n_events, score, mx,
       |    min(CASE WHEN score = mx THEN day END) OVER () AS best_day
       |  FROM m
       |)
       |SELECT day, CAST(n_events AS BIGINT) AS n_events, score,
       |  (score = mx AND day = best_day) AS is_change
       |FROM b ORDER BY day""".stripMargin

  val qResampleSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", resampleBucketUs.toString)} AS tb,
       |         event_id
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), base AS (
       |  SELECT user_id, tb, count(*) AS n_events,
       |         max(event_id) AS last_eid
       |  FROM e GROUP BY 1, 2
       |), span AS (
       |  SELECT user_id, min(tb) AS lo, max(tb) AS hi
       |  FROM base GROUP BY 1
       |), spine AS (
       |  SELECT user_id, unnest(range(lo, hi + 1)) AS tb FROM span
       |), j AS (
       |  SELECT s.user_id, s.tb,
       |         COALESCE(b.n_events, 0) AS n_events, b.last_eid
       |  FROM spine s LEFT JOIN base b USING (user_id, tb)
       |)
       |SELECT user_id, tb, CAST(n_events AS BIGINT) AS n_events,
       |  last_value(last_eid IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY tb
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS last_event_id,
       |  (n_events = 0) AS is_gap
       |FROM j ORDER BY user_id, tb""".stripMargin

  // ---- q_dtw: dynamic time warping between type series -----------------

  /** Unreachable-cell sentinel for the DTW band: far above any real
    * warp cost (paths are ≤ 2·days cells of ≤ count-range each) yet
    * small enough that BIG + a few costs cannot overflow a Long.
    */
  private val dtwBig = 1000000000000000L

  /** DTW distance between every pair of event types' densified daily
    * count series - the alignment-tolerant shape distance SAX
    * symbolization approximates (two types with the same weekly shape
    * offset by a day are DTW-close but Euclidean-far). All-integer:
    * |Δcount| cell costs, Long min-plus recursion, so both engines
    * agree exactly.
    *
    * Execution: the corpus folds map-combinably to the (type, day)
    * count matrix (the hwBuckets relation the Holt-Winters family
    * already stores); the O(days²) recursion runs driver-side over
    * that TIME-bounded matrix (types × calendar days - the
    * gdTrain/Lloyd posture: no window expresses a 2-D min-plus DP).
    * The oracle replays the identical DP as an anti-diagonal recursive
    * CTE: diagonal d depends only on diagonals d-1 and d-2, carried as
    * two fixed-length lists per pair per level.
    */
  def qDtw(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    dtwFromBuckets(hwBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** The pairwise-DTW view over any (et, d, c) bucket relation -
    * shared with the incremental store face.
    */
  private[graft] def dtwFromBuckets(cnt0: DataFrame): DataFrame = {
    val spark = cnt0.sparkSession
    import spark.implicits._
    val (_, seriesMu) = hwSeriesFromBuckets(cnt0)
    // hwSeriesFromBuckets scales to micro-units for the smoother;
    // DTW costs are raw count deltas (exact division back)
    val series = seriesMu.map { case (et, xs) =>
      et -> xs.map(_ / 1000000L) }
    val out = for {
      i <- series.indices
      j <- series.indices if i < j
    } yield {
      val (ea, a) = series(i)
      val (eb, b) = series(j)
      (ea, eb, dtwDist(a, b), a.length.toLong)
    }
    out.toDF("type_a", "type_b", "dtw", "n_days")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Exact integer DTW (full band): row-major min-plus DP with the
    * standard D(0,0)=0 / first-row/column-unreachable boundary.
    */
  private def dtwDist(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length
    val m = b.length
    var prev = Array.fill(m + 1)(dtwBig)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      val cur = Array.fill(m + 1)(dtwBig)
      var j = 1
      while (j <= m) {
        val c = math.abs(a(i - 1) - b(j - 1))
        cur(j) = c + math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        j += 1
      }
      prev = cur
      i += 1
    }
    prev(m)
  }

  // ---- q_burstiness: Fano factor per type -------------------------------

  /** Burstiness (Fano factor, variance/mean) of each event type's
    * densified daily count series: the one-number dispersion verdict
    * behind rate-limiter sizing and anomaly-threshold choice (a
    * Poisson-like arrival process sits at 1; bursty traffic far
    * above). Fully distributed: the (type, day) matrix folds
    * map-combinably, each type's moment sums (S = Σc, Q = Σc²) are
    * exact BIGINTs, the densified span rides a broadcast one-row agg
    * (zero days contribute zero to S and Q but count toward n), and
    * only the final ratio (n·Q − S²)/(n·S) is floating point -
    * q6-rounded, identical both engines.
    */
  def qBurstiness(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    burstFromBuckets(hwBuckets(Graft.table(spark, sfDir, "events")))
  }

  /** The Fano verdict over any (et, d, c) bucket relation - shared by
    * the batch, stream and store faces.
    */
  private[graft] def burstFromBuckets(cnt0: DataFrame): DataFrame = {
    val span = cnt0.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select((col("hi") - col("lo") + lit(1L)).as("n_days"))
    cnt0.groupBy(col("et"))
      .agg(sum(col("c")).as("S"), sum(col("c") * col("c")).as("Q"))
      .crossJoin(broadcast(span))
      .select(col("et"), col("n_days"), col("S").as("n_events"),
        graft.pipeline.ParityMath.q6(expr(
          """(CAST(n_days * Q - S * S AS DOUBLE))
            | / (CAST(n_days * S AS DOUBLE))""".stripMargin))
          .as("fano"))
      .withColumn("is_bursty", col("fano") > lit(1.0))
      .orderBy(col("et"))
  }

  lazy val qBurstinessSql: String =
    s"""WITH buckets AS (
       |  SELECT event_type AS et, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", dayUs.toString)} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |    AND epoch_us(ts) >= 0
       |  GROUP BY 1, 2
       |), span AS (
       |  SELECT max(d) - min(d) + 1 AS n_days FROM buckets
       |), mom AS (
       |  SELECT et, CAST(sum(c) AS BIGINT) AS S,
       |         CAST(sum(c * c) AS BIGINT) AS Q
       |  FROM buckets GROUP BY 1
       |)
       |SELECT et, CAST(n_days AS BIGINT) AS n_days, S AS n_events,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """CAST(n_days * Q - S * S AS DOUBLE)
              | / CAST(n_days * S AS DOUBLE)""".stripMargin)} AS fano,
       |  (${graft.pipeline.ParityMath.q6Sql(
            """CAST(n_days * Q - S * S AS DOUBLE)
              | / CAST(n_days * S AS DOUBLE)""".stripMargin)}) > 1.0
       |    AS is_bursty
       |FROM mom CROSS JOIN span
       |ORDER BY et""".stripMargin

  lazy val qDtwSql: String =
    s"""WITH RECURSIVE buckets AS (
       |  SELECT event_type AS et, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", dayUs.toString)} AS d,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM events
       |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
       |    AND epoch_us(ts) >= 0
       |  GROUP BY 1, 2
       |), span AS (
       |  SELECT min(d) AS lo, max(d) AS hi FROM buckets
       |), types AS (
       |  SELECT DISTINCT et FROM buckets
       |), days AS (
       |  SELECT unnest(range(lo, hi + 1)) AS d FROM span
       |), dense AS (
       |  SELECT t.et, dy.d, COALESCE(b.c, 0) AS c
       |  FROM types t CROSS JOIN days dy
       |  LEFT JOIN buckets b ON b.et = t.et AND b.d = dy.d
       |), ser AS (
       |  SELECT et, list(c ORDER BY d) AS xs,
       |         CAST(count(*) AS INTEGER) AS n
       |  FROM dense GROUP BY et
       |), prs AS (
       |  SELECT a.et AS type_a, b.et AS type_b,
       |         a.xs AS xa, b.xs AS xb, a.n AS n
       |  FROM ser a JOIN ser b ON a.et < b.et
       |), walk AS (
       |  SELECT type_a, type_b, xa, xb, n, 0 AS dg,
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, n + 1),
       |        i -> CAST($dtwBig AS BIGINT))) AS cur,
       |    CAST(NULL AS BIGINT[]) AS prev
       |  FROM prs
       |  UNION ALL
       |  SELECT type_a, type_b, xa, xb, n, dg + 1,
       |    list_transform(range(0, CAST(n AS BIGINT) + 1), i ->
       |      CASE WHEN i >= 1 AND (dg + 1 - i) >= 1
       |                AND (dg + 1 - i) <= n
       |      THEN abs(xa[i] - xb[dg + 1 - i])
       |        + least(COALESCE(cur[i], $dtwBig),
       |                COALESCE(cur[i + 1], $dtwBig),
       |                COALESCE(prev[i], $dtwBig))
       |      ELSE CAST($dtwBig AS BIGINT) END),
       |    cur
       |  FROM walk WHERE dg < 2 * n
       |)
       |SELECT type_a, type_b, CAST(cur[n + 1] AS BIGINT) AS dtw,
       |       CAST(n AS BIGINT) AS n_days
       |FROM walk WHERE dg = 2 * n
       |ORDER BY type_a, type_b""".stripMargin
}
