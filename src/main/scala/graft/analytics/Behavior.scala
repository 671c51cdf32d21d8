package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics: the ordered-funnel conversion report —
  * the classic "of the users who did A, how many later did B, and of
  * those, how many later did C" product question over an event log.
  * (Next to `q_sessionize`/`q_window` in the reference's event-rollup
  * family; the ORDER constraint is what plain per-type counts miss.)
  *
  * Semantics: step order is the total per-user (ts, event_id) event
  * order (event_id is unique, so the order — and therefore the whole
  * result — is deterministic). A user reaches step 2 iff some step-1
  * event strictly precedes one of their step-2 events; step 3 iff a
  * CONVERTED step-2 event strictly precedes a step-3 event. "Did B
  * before ever doing A" correctly does not count.
  *
  * 100 TB shape: ONE user-keyed exchange carries the whole operator —
  * the two running-count window projections share the same partitioning
  * and sort, the per-user flags aggregate on the same partitioning
  * (Catalyst reuses the exchange), and the final 3-row report is a
  * tiny global fold of 1-bit flags. No joins, no second shuffle, state
  * O(1) per row.
  */
object Behavior {

  /** The funnel definition: view → click → purchase. */
  val funnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** The tiny 3-row report fold over any per-user (r1, r2, r3)
    * boolean-flag relation - shared by the batch face and the
    * streaming face (whose streamed state is exactly these flags), so
    * the report shape cannot drift between them.
    */
  private[graft] def funnelReportFrom(flags: DataFrame): DataFrame = {
    val Seq(s1, s2, s3) = funnelSteps
    flags
      .agg(sum(col("r1").cast("long")).as("u1"),
        sum(col("r2").cast("long")).as("u2"),
        sum(col("r3").cast("long")).as("u3"))
      .select(expr(
        s"""explode(array(
           |  struct(1L AS step, '$s1' AS step_name, u1 AS n_users),
           |  struct(2L AS step, '$s2' AS step_name, u2 AS n_users),
           |  struct(3L AS step, '$s3' AS step_name, u3 AS n_users)))
           |""".stripMargin).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
      .orderBy(col("step"))
  }

  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val Seq(s1, s2, s3) = funnelSteps
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    // strictly-preceding frame: a step counts only events BEFORE it
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val flags = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("n1_before",
        count(when(col("event_type") === s1, lit(1))).over(before))
      .withColumn("conv2",
        (col("event_type") === s2) && col("n1_before") > 0)
      .withColumn("n2_before",
        count(when(col("conv2"), lit(1))).over(before))
      .withColumn("conv3",
        (col("event_type") === s3) && col("n2_before") > 0)
      .groupBy(col("user_id"))
      .agg(max(col("event_type") === s1).as("r1"),
        max(col("conv2")).as("r2"), max(col("conv3")).as("r3"))
    funnelReportFrom(flags)
  }

  // ---- q_cohort: weekly cohort retention matrix ----------------------

  val cohortWeekUs: Long = 7L * 24 * 3600 * 1000000L

  /** Weekly cohort retention: users grouped by first-activity week,
    * each cell = how many of that cohort were active `week_offset`
    * weeks later (plus the exact rate against the cohort size). The
    * matrix every product/growth dashboard starts from - and the
    * per-entity-lifetime rollup a training pipeline uses to detect
    * source churn.
    *
    * 100 TB shape: ONE events scan. The per-user week set is a single
    * user-keyed map-combinable collect_set (bounded by the corpus's
    * week count); cohort = array_min of that set, offsets explode from
    * it, and the cohort SIZES need no second pass - every user is by
    * definition active at offset 0, so n_cohort is the matrix's own
    * offset-0 column (the tiny matrix broadcast-joins itself). The
    * naive formulation (distinct → first-week agg → join back → size
    * agg) scans events three times; this is the same result in one.
    */
  /** Matrix math over any per-user (user_id, ws: array of active
    * weeks) relation - shared by the batch face and the streaming
    * face, whose streamed state is exactly this relation.
    */
  private[graft] def cohortMatrixFrom(perUser: DataFrame): DataFrame = {
    val cells = perUser
      .select(expr("array_min(ws)").as("cw"), explode(col("ws")).as("w"))
      .groupBy(col("cw"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // sizes via a window over the TINY matrix (not a self-join, which
    // would re-derive the scan subtree): per cohort, the offset-0 cell
    cells
      .withColumn("n_cohort",
        max(when(col("week_offset") === 0L, col("n_active")))
          .over(Window.partitionBy(col("cw"))))
      .select(col("cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        graft.pipeline.ParityMath.q6(
          col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def qCohort(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    cohortMatrixFrom(Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", s"${cohortWeekUs}L")).as("w"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("w")).as("ws")))
  }

  val qCohortSql: String =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id, ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", cohortWeekUs.toString)} AS w
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), first AS (
       |  SELECT user_id, min(w) AS cw FROM weeks GROUP BY 1
       |), sizes AS (
       |  SELECT cw, count(*) AS n_cohort FROM first GROUP BY 1
       |), cells AS (
       |  SELECT f.cw, w.w - f.cw AS week_offset, count(*) AS n_active
       |  FROM weeks w JOIN first f USING (user_id)
       |  GROUP BY 1, 2
       |)
       |SELECT c.cw AS cohort_week, c.week_offset,
       |  CAST(c.n_active AS BIGINT) AS n_active,
       |  CAST(s.n_cohort AS BIGINT) AS n_cohort,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(c.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE)")}
       |    AS retention
       |FROM cells c JOIN sizes s USING (cw)
       |ORDER BY cohort_week, week_offset""".stripMargin

  // ---- q_markov: event-type transition matrix ------------------------

  /** First-order Markov transition matrix over the event log: for each
    * ordered pair of event types, how often does a user's `from_type`
    * event get immediately followed by a `to_type` event, and what
    * fraction of all transitions out of `from_type` is that — the
    * behavioral language model (next-action prediction, bot detection,
    * funnel discovery without a hand-declared step list).
    *
    * Semantics: transitions are consecutive events in the per-user
    * total (ts, event_id) order — the same order every behavior-family
    * operator uses, so the result is deterministic. The probability is
    * ONE double division per matrix cell over exact integer counts
    * (q6-quantized), so both engines agree bitwise.
    *
    * 100 TB shape: one user-keyed exchange + sort carries the lag
    * (same class as q_ewma); the transition counts aggregate with
    * map-side combine on the (from, to) key whose cardinality is
    * |event types|² — the matrix is tiny by construction, so the row
    * totals come from a window over the MATRIX (never a second events
    * scan or a self-join re-deriving the scan subtree, the q_cohort
    * lesson).
    */
  /** Matrix math over any (from_type, to_type, n_trans) count
    * relation - shared by the batch, streaming, and store faces (whose
    * states/fragments are transition counts), so the normalization
    * cannot drift between them.
    */
  private[graft] def markovMatrixFrom(counts: DataFrame): DataFrame = {
    val m = counts.groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n_trans")).as("n_trans"))
    m.withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("n_from"),
        graft.pipeline.ParityMath.q6(
          col("n_trans").cast("double") / col("n_from").cast("double"))
          .as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Row-level (from_type, to_type) transitions → counts. */
  private[graft] def markovCount(trans: DataFrame): DataFrame =
    trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))

  def qMarkov(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val trans = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"))
    markovMatrixFrom(markovCount(trans))
  }

  val qMarkovSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), t AS (
       |  SELECT
       |    lag(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY tus, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), m AS (
       |  SELECT from_type, to_type, count(*) AS n_trans
       |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2
       |), mm AS (
       |  SELECT from_type, to_type, n_trans,
       |    sum(n_trans) OVER (PARTITION BY from_type) AS n_from
       |  FROM m
       |)
       |SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
       |  CAST(n_from AS BIGINT) AS n_from,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE)")} AS p
       |FROM mm ORDER BY from_type, to_type""".stripMargin

  // ---- q_markov_entropy: per-state entropy + chain entropy rate --------

  /** Entropy of each state's outgoing transition distribution plus the
    * chain's overall ENTROPY RATE (the empirical-frequency-weighted
    * mean) - the one-number "how predictable is the next action"
    * diagnostic that prices q_markov's matrix (a near-zero rate says a
    * first-order model basically suffices; ln|states| says it adds
    * nothing). Micro-nat convention: per-transition
    * nll = floor(−ln(c_st/c_s)·10⁶ + 0.5) (the LM family's quantizer -
    * both engines feed ln the identical double, the accepted libm
    * risk the qclf margin quantified), then every downstream step is
    * exact integer arithmetic: H(s) = (Σ_t c_st·nll_st) DIV c_s,
    * rate = (Σ_s c_s·H(s)) DIV Σ_s c_s. One keyed agg over the
    * transition relation, windows only over the states-sized matrix.
    */
  def qMarkovEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val trans = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"))
    markovEntropyFrom(markovCount(trans))
  }

  /** Entropy math over any (from_type, to_type, n_trans) count
    * relation — shared by the batch, streaming, and store faces
    * exactly as `markovMatrixFrom` is for q_markov (the faces' stored
    * fact is the SAME transition matrix; entropy is one more
    * query-time view over it, never per-batch state: a single arriving
    * transition shifts its row's distribution AND the rate's weights).
    */
  private[graft] def markovEntropyFrom(counts: DataFrame): DataFrame = {
    val m = counts.groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n_trans")).as("n_trans"))
    val mm = m.withColumn("n_from",
      sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
    val nll = mm.withColumn("nll_mu", expr(
      """CAST(floor(-ln(CAST(n_trans AS DOUBLE)
        | / CAST(n_from AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"""
        .stripMargin))
    val hs = nll.groupBy(col("from_type"))
      .agg(max(col("n_from")).as("n_from"),
        sum(col("n_trans") * col("nll_mu")).as("hw"))
      .select(col("from_type"), col("n_from"),
        expr("hw DIV n_from").as("h_mu"))
    // the rate rides a window over the STATES-sized relation (a few
    // rows), never the transition stream
    hs.withColumn("rate_mu", expr("""
        (sum(n_from * h_mu) OVER ()) DIV (sum(n_from) OVER ())"""))
      .orderBy(col("from_type"))
  }

  val qMarkovEntropySql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), t AS (
       |  SELECT
       |    lag(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY tus, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), m AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_trans
       |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2
       |), mm AS (
       |  SELECT from_type, to_type, n_trans,
       |    CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
       |      AS n_from
       |  FROM m
       |), nl AS (
       |  SELECT from_type, to_type, n_trans, n_from,
       |    CAST(floor(-ln(CAST(n_trans AS DOUBLE)
       |      / CAST(n_from AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |      AS nll_mu
       |  FROM mm
       |), hs AS (
       |  SELECT from_type, CAST(max(n_from) AS BIGINT) AS n_from,
       |    CAST(sum(n_trans * nll_mu) AS BIGINT) // CAST(max(n_from) AS BIGINT)
       |      AS h_mu
       |  FROM nl GROUP BY from_type
       |)
       |SELECT from_type, n_from, h_mu,
       |  CAST((sum(n_from * h_mu) OVER ()) // (sum(n_from) OVER ())
       |    AS BIGINT) AS rate_mu
       |FROM hs ORDER BY from_type""".stripMargin

  // ---- q_markov2: second-order transitions ----------------------------

  /** SECOND-ORDER Markov transitions — the context-aware member of
    * the behavior family, completing the same arc the LM family walks
    * (unigram → bigram → backoff): P(to | from2, from1) next to
    * q_markov's memoryless P(to | from1), plus the LOG-LIFT of the
    * context over the first-order prediction —
    * ln(P₂(to|ctx) / P₁(to|from1)) in integer micro-nats — which is
    * the actionable number (a context with lift ≈ 0 carries no
    * memory; a large |lift| is where a 2-step recommender actually
    * beats the transition matrix). Both probability ratios clear to
    * count ratios (n₂·n_f1 / n_ctx·n₁), the ln quantizes per row (NLL
    * discipline), and p is the one q6 division.
    *
    * 100 TB shape: ONE user-keyed exchange carries both lags in a
    * single window projection; both count relations are map-combinable
    * aggs on the (tiny) type-tuple vocabulary, the first-order join
    * keyed on that vocabulary.
    */
  def qMarkov2(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val tr = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("f1", lag(col("event_type"), 1).over(w))
      .withColumn("f2", lag(col("event_type"), 2).over(w))
      .filter(col("f1").isNotNull)
      .select(col("f2"), col("f1"), col("event_type").as("to_type"))
    markov2FromTrans(tr)
  }

  /** The second-order report over any (f2 nullable, f1, to_type)
    * transition-fact relation — shared by the batch face (window lags)
    * and the streaming face (per-user two-observation ring), so the
    * count/lift math cannot drift. A null f2 marks each user's FIRST
    * transition: it feeds the first-order matrix but no context row —
    * exactly the batch lag semantics.
    */
  private[graft] def markov2FromTrans(tr0: DataFrame): DataFrame = {
    val tr = tr0.localCheckpoint()
    val first = tr.groupBy(col("f1"), col("to_type"))
      .agg(count(lit(1)).as("n1"))
    val nf = first.groupBy(col("f1")).agg(sum(col("n1")).as("nf"))
    val second = tr.filter(col("f2").isNotNull)
      .groupBy(col("f2"), col("f1"), col("to_type"))
      .agg(count(lit(1)).as("n2"))
      .withColumn("n_ctx", sum(col("n2")).over(
        Window.partitionBy(col("f2"), col("f1"))))
    second
      .join(first, Seq("f1", "to_type"))
      .join(nf, "f1")
      .select(col("f2").as("from2"), col("f1").as("from1"),
        col("to_type"),
        col("n2").as("n_trans"), col("n_ctx"),
        graft.pipeline.ParityMath.q6(
          col("n2").cast("double") / col("n_ctx").cast("double")).as("p"),
        expr(
          """CAST(floor(ln((CAST(n2 AS DOUBLE) * CAST(nf AS DOUBLE))
            |  / (CAST(n_ctx AS DOUBLE) * CAST(n1 AS DOUBLE)))
            |  * 1000000.0 + 0.5) AS BIGINT)""".stripMargin).as("lift_mu"))
      .orderBy(col("from2"), col("from1"), col("to_type"))
  }

  val qMarkov2Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), l AS MATERIALIZED (
       |  SELECT event_type,
       |    lag(event_type, 1) OVER w AS f1,
       |    lag(event_type, 2) OVER w AS f2
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
       |), first AS (
       |  SELECT f1, event_type, CAST(count(*) AS BIGINT) AS n1
       |  FROM l WHERE f1 IS NOT NULL GROUP BY 1, 2
       |), nf AS (SELECT f1, sum(n1) AS nf FROM first GROUP BY 1),
       |second AS (
       |  SELECT f2, f1, event_type, CAST(count(*) AS BIGINT) AS n2
       |  FROM l WHERE f2 IS NOT NULL GROUP BY 1, 2, 3
       |), sc AS (
       |  SELECT *, sum(n2) OVER (PARTITION BY f2, f1) AS n_ctx
       |  FROM second
       |)
       |SELECT sc.f2 AS from2, sc.f1 AS from1,
       |  sc.event_type AS to_type, sc.n2 AS n_trans,
       |  CAST(sc.n_ctx AS BIGINT) AS n_ctx,
       |  ${graft.pipeline.ParityMath.q6Sql(
          "CAST(sc.n2 AS DOUBLE) / CAST(sc.n_ctx AS DOUBLE)")} AS p,
       |  CAST(floor(ln((CAST(sc.n2 AS DOUBLE) * CAST(nf.nf AS DOUBLE))
       |    / (CAST(sc.n_ctx AS DOUBLE) * CAST(f.n1 AS DOUBLE)))
       |    * 1000000.0 + 0.5) AS BIGINT) AS lift_mu
       |FROM sc
       |JOIN first f ON f.f1 = sc.f1 AND f.event_type = sc.event_type
       |JOIN nf ON nf.f1 = sc.f1
       |ORDER BY from2, from1, to_type""".stripMargin

  // ---- q_paths: top user journey prefixes ----------------------------

  /** Path length: the first `pathLen` events of each user's history. */
  val pathLen: Int = 5

  /** Report size: the `pathTopK` most common paths. */
  val pathTopK: Int = 20

  /** Top user-journey prefixes: each user's first `pathLen` events (in
    * the per-user total (ts, event_id) order) joined into a `>`-path
    * string, ranked by how many users share the exact prefix — funnel
    * DISCOVERY, where q_funnel measures a funnel someone already
    * declared. (The behavior family's path-analysis member, next to
    * q_markov's one-step matrix: paths keep the full k-step sequence
    * the Markov factorization throws away.)
    *
    * 100 TB shape: ONE user-keyed exchange. The `row_number <= pathLen`
    * projection plans as the bounded-heap TopKPerKey operator (the
    * engine-wide window rewrite), so each user's unbounded history is
    * trimmed to `pathLen` rows map-side before the exchange; the path
    * strings aggregate with map-side combine; and the global top-k is
    * the bounded TopFreqAgg heap — at most 2k rows per partition ship
    * to the single final reducer, never the full path-frequency
    * relation, and nothing global is ever sorted.
    */
  /** Rank report over any per-user (path) relation — shared by the
    * batch face and the streaming face (whose state yields the same
    * per-user path strings), so the ranking cannot drift between them.
    */
  private[graft] def pathsTopFrom(perUser: DataFrame): DataFrame = {
    val topAgg = udaf(graft.functions.TopFreqAgg(pathTopK))
    perUser.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .agg(topAgg(col("path"), col("n_users")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "tc")))
      .select((col("pos") + 1).cast("long").as("rk"),
        col("tc._1").as("path"), col("tc._2").as("n_users"))
      .orderBy(col("rk"))
  }

  def qPaths(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val perUser = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pathLen)
      .groupBy(col("user_id"))
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(rn, event_type))), x -> x.event_type), '>')")
        .as("path"))
    pathsTopFrom(perUser)
  }

  val qPathsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), r AS (
       |  SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY tus, event_id) AS rn
       |  FROM e
       |), p AS (
       |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
       |  FROM r WHERE rn <= $pathLen GROUP BY user_id
       |), f AS (
       |  SELECT path, count(*) AS n_users FROM p GROUP BY 1
       |), top AS (
       |  SELECT path, n_users,
       |    row_number() OVER (ORDER BY n_users DESC, path ASC) AS rk
       |  FROM f
       |)
       |SELECT CAST(rk AS BIGINT) AS rk, path,
       |  CAST(n_users AS BIGINT) AS n_users
       |FROM top WHERE rk <= $pathTopK ORDER BY rk""".stripMargin

  val qFunnelSql: String = {
    val Seq(s1, s2, s3) = funnelSteps
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), w1 AS (
       |  SELECT user_id, tus, event_id, event_type,
       |    count(CASE WHEN event_type = '$s1' THEN 1 END)
       |      OVER wb AS n1_before
       |  FROM e
       |  WINDOW wb AS (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), w2 AS (
       |  SELECT user_id, event_type,
       |    (event_type = '$s2' AND n1_before > 0) AS conv2,
       |    count(CASE WHEN event_type = '$s2' AND n1_before > 0
       |               THEN 1 END) OVER wb AS n2_before
       |  FROM w1
       |  WINDOW wb AS (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |), f AS (
       |  SELECT user_id,
       |    max(event_type = '$s1') AS r1,
       |    max(conv2) AS r2,
       |    max(event_type = '$s3' AND n2_before > 0) AS r3
       |  FROM w2 GROUP BY 1
       |), t AS (
       |  SELECT sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS u1,
       |         sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS u2,
       |         sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS u3
       |  FROM f
       |)
       |SELECT CAST(1 AS BIGINT) AS step, '$s1' AS step_name,
       |       CAST(u1 AS BIGINT) AS n_users FROM t
       |UNION ALL
       |SELECT 2, '$s2', CAST(u2 AS BIGINT) FROM t
       |UNION ALL
       |SELECT 3, '$s3', CAST(u3 AS BIGINT) FROM t
       |ORDER BY step""".stripMargin
  }

  // ---- q_seq_pattern ------------------------------------------------

  /** The pattern the matcher mines: one or more browse events (view /
    * click) immediately followed by a purchase — "browse runs that
    * convert", with any other event type breaking the run. Restricted
    * to the regex class both engines scan identically (greedy,
    * leftmost, non-overlapping; no backreferences or lookaround, where
    * Java regex and RE2 diverge).
    */
  val seqPattern = "[vc]+p"

  /** Regex SEQUENCE-PATTERN mining over per-user event histories — the
    * regular-language generalization of the funnel family
    * (MATCH_RECOGNIZE's core, which neither Spark nor DuckDB ships):
    * q_funnel measures one declared step chain, q_paths ranks fixed
    * prefixes, q_markov keeps one-step factorization; this matches an
    * arbitrary REGULAR pattern over the whole ordered history. Each
    * event encodes as its type's initial (distinct across the five
    * types), the per-user history collapses to one ordered string,
    * and the pattern scan emits per user the match count and the
    * matched runs themselves.
    *
    * 100 TB shape: ONE user-keyed exchange (collect_list partials
    * merge map-side); the regex scan is narrow per-user work after
    * it. Per-user state is the event history — the inherent state of
    * ANY sequence matcher over arbitrary regular patterns (a
    * deployment bounds it with history retention); the sort happens
    * in-row (array_sort), so arrival order inside the aggregation
    * cannot perturb the string.
    */
  private[graft] def seqPatternFrom(seqs: DataFrame): DataFrame =
    seqs
      .withColumn("ms",
        expr(s"regexp_extract_all(seq, '$seqPattern', 0)"))
      .select(col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        size(col("ms")).cast("long").as("n_matches"),
        array_join(col("ms"), "|").as("matches"))
      .orderBy(col("user_id"))

  def qSeqPattern(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val seqs = Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
        col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"))
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(tus, event_id, c))), x -> x.c), '')")
        .as("seq"))
    seqPatternFrom(seqs)
  }

  val qSeqPatternSql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id,
       |    substring(event_type, 1, 1) AS c
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), s AS (
       |  SELECT user_id, string_agg(c, '' ORDER BY tus, event_id) AS seq
       |  FROM e GROUP BY user_id
       |)
       |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
       |  CAST(len(regexp_extract_all(seq, '$seqPattern')) AS BIGINT)
       |    AS n_matches,
       |  array_to_string(regexp_extract_all(seq, '$seqPattern'), '|')
       |    AS matches
       |FROM s ORDER BY user_id""".stripMargin

  // ---- q_survival: Kaplan-Meier inter-event retention -------------------

  /** Kaplan-Meier survival curve over pooled inter-event gaps: for
    * every consecutive event pair of a user the gap (in whole days) is
    * an OBSERVED duration; each user's last event contributes a
    * CENSORED duration up to the corpus observation end — the standard
    * retention/"time to next visit" estimator, censoring handled the
    * only statistically honest way (dropping the open-ended last gaps
    * would bias survival low). S(t) = prod over death-days s <= t of
    * (n_s - d_s)/n_s, in integer MICRO-units with truncating division
    * (DuckDB // ≙ Scala Long /, verified), deaths-before-censoring at
    * equal times (the KM convention).
    *
    * Scale shape: gap extraction is one per-user window (the funnel
    * discipline); the (day, deaths, censored) relation is
    * map-combinably aggregated and TIME-bounded (days, not data), so
    * the sequential product folds driver-side over that tiny relation
    * (the gdTrain/Lloyd posture) while everything data-sized stays
    * distributed. The oracle replays the fold as a recursive CTE over
    * the day-indexed relation.
    */
  def qSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    qSurvivalFrom(
      Graft.table(spark, sfDir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), expr("graft_ts_us(ts)").as("tus"),
          col("event_id")),
      TimeSeries.dayUs)
  }

  private[graft] def qSurvivalFrom(ev: DataFrame, dayUs: Long): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val seq = ev.withColumn("nxt", lead(col("tus"), 1).over(order))
    val mx = ev.agg(max(col("tus")).as("mx"))
    val obs = seq.filter(col("nxt").isNotNull)
      .select(expr(s"(nxt - tus) DIV ${dayUs}L").as("t"),
        lit(1L).as("d"), lit(0L).as("c"))
    val cens = seq.filter(col("nxt").isNull)
      .crossJoin(broadcast(mx))
      .select(expr(s"(mx - tus) DIV ${dayUs}L").as("t"),
        lit(0L).as("d"), lit(1L).as("c"))
    val days = obs.unionAll(cens)
      .groupBy(col("t"))
      .agg(sum(col("d")).as("d"), sum(col("c")).as("c"))
      .orderBy(col("t"))
      .collect() // TIME-bounded: one row per calendar day with activity
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var remaining = days.map(r => r._2 + r._3).sum
    var sMu = 1000000L
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    for ((t, d, c) <- days) {
      val nRisk = remaining
      if (d > 0) {
        sMu = (sMu * (nRisk - d)) / nRisk
        rows += ((t, nRisk, d, c, sMu))
      }
      remaining -= (d + c)
    }
    rows.toSeq
      .toDF("t_days", "n_risk", "d_events", "c_censored", "surv_mu")
      .orderBy(col("t_days"))
  }

  lazy val qSurvivalSql: String = {
    val dayUs = TimeSeries.dayUs
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_id
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), mx AS (SELECT max(tus) AS m FROM ev),
       |sq AS (
       |  SELECT user_id, tus,
       |    lead(tus) OVER (PARTITION BY user_id
       |                    ORDER BY tus, event_id) AS nxt
       |  FROM ev
       |), dur AS (
       |  SELECT (nxt - tus) // $dayUs AS t, 1 AS d, 0 AS c
       |  FROM sq WHERE nxt IS NOT NULL
       |  UNION ALL
       |  SELECT (mx.m - tus) // $dayUs AS t, 0 AS d, 1 AS c
       |  FROM sq CROSS JOIN mx WHERE nxt IS NULL
       |), days AS (
       |  SELECT t, CAST(sum(d) AS BIGINT) AS d, CAST(sum(c) AS BIGINT) AS c
       |  FROM dur GROUP BY t
       |), ord AS (
       |  SELECT t, d, c,
       |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i,
       |    CAST((SELECT count(*) FROM dur) AS BIGINT)
       |      - CAST(COALESCE(sum(d + c) OVER (ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS BIGINT) AS n_risk
       |  FROM days
       |), walk AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST(1000000 AS BIGINT) AS s
       |  UNION ALL
       |  SELECT o.i,
       |    CASE WHEN o.d > 0 THEN (w.s * (o.n_risk - o.d)) // o.n_risk
       |         ELSE w.s END
       |  FROM walk w JOIN ord o ON o.i = w.i + 1
       |)
       |SELECT o.t AS t_days, o.n_risk, o.d AS d_events,
       |       o.c AS c_censored, w.s AS surv_mu
       |FROM ord o JOIN walk w ON w.i = o.i
       |WHERE o.d > 0 ORDER BY t_days""".stripMargin
  }

  // ---- q_survival_logrank: stratified KM + two-group log-rank ----------

  /** STRATIFIED Kaplan-Meier plus the log-rank test — the comparison
    * member that makes `q_survival` actionable: one KM curve per user
    * cohort (even/odd user_id — a deterministic stand-in for "the
    * segment we compare", same convention as pprSeedMod) and the
    * log-rank chi-square asking whether the two curves differ beyond
    * chance. Per pooled death day t with group-0 at-risk n0 of n and
    * deaths d0 of d: O−E(t) = d0 − d·n0/n and hypergeometric variance
    * V(t) = d·(n0/n)·((n−n0)/n)·((n−d)/(n−1)) (0 when n = 1), each
    * quantized to integer MICRO-units (the micro-nat discipline:
    * both engines feed the same pinned double chain to floor(·10⁶+.5),
    * then every sum is exact BIGINT); chi² = (ΣOE)²/ΣV evaluates once
    * over the two micro-sums. At-risk sets are exact integers
    * (deaths-before-censoring, truncating division — the q_survival
    * conventions per group).
    *
    * Scale shape: identical to q_survival — gap extraction is one
    * per-user window, the (grp, day, deaths, censored) relation is
    * map-combinably aggregated and TIME-bounded (2 × days), so both
    * the per-group product folds and the log-rank accumulation run
    * driver-side over that tiny relation (the gdTrain/Lloyd posture).
    * The oracle replays the per-group walk as a grp-carrying recursive
    * CTE and the log-rank as one aggregate over the pooled death days.
    */
  def qSurvivalLogrank(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    survivalLogrankFrom(
      Graft.table(spark, sfDir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(pmod(col("user_id"), lit(2L)).as("grp"), col("user_id"),
          expr("graft_ts_us(ts)").as("tus"), col("event_id")),
      TimeSeries.dayUs)
  }

  private[graft] def survivalLogrankFrom(ev: DataFrame,
                                         dayUs: Long): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val seq = ev.withColumn("nxt", lead(col("tus"), 1).over(order))
    // pooled observation end: censoring is against the CORPUS horizon,
    // not per-group horizons (groups share the study window)
    val mx = ev.agg(max(col("tus")).as("mx"))
    val obs = seq.filter(col("nxt").isNotNull)
      .select(col("grp"), expr(s"(nxt - tus) DIV ${dayUs}L").as("t"),
        lit(1L).as("d"), lit(0L).as("c"))
    val cens = seq.filter(col("nxt").isNull)
      .crossJoin(broadcast(mx))
      .select(col("grp"), expr(s"(mx - tus) DIV ${dayUs}L").as("t"),
        lit(0L).as("d"), lit(1L).as("c"))
    val days = obs.unionAll(cens)
      .groupBy(col("grp"), col("t"))
      .agg(sum(col("d")).as("d"), sum(col("c")).as("c"))
      .orderBy(col("grp"), col("t"))
      .collect() // TIME-bounded: 2 x one row per active calendar day
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-group KM fold (exactly qSurvivalFrom's walk, per grp)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    for (g <- days.map(_._1).distinct.sorted) {
      val gd = days.filter(_._1 == g)
      var remaining = gd.map(r => r._3 + r._4).sum
      var sMu = 1000000L
      for ((_, t, d, c) <- gd) {
        val nRisk = remaining
        if (d > 0) {
          sMu = (sMu * (nRisk - d)) / nRisk
          rows += ((g, t, nRisk, d, c, sMu))
        }
        remaining -= (d + c)
      }
    }
    // log-rank over POOLED death days: both groups' at-risk counts
    // advance together down the shared day axis
    val byDay = days.groupBy(_._2)
    val rem = scala.collection.mutable.Map(
      days.map(_._1).distinct.map(g =>
        g -> days.filter(_._1 == g).map(r => r._3 + r._4).sum): _*)
    var sOmE = 0L
    var sV = 0L
    for (t <- days.map(_._2).distinct.sorted) {
      val at = byDay(t)
      def dOf(g: Long) = at.find(_._1 == g).map(_._3).getOrElse(0L)
      def cOf(g: Long) = at.find(_._1 == g).map(_._4).getOrElse(0L)
      val n0 = rem.getOrElse(0L, 0L); val n1 = rem.getOrElse(1L, 0L)
      val d0 = dOf(0L); val d1 = dOf(1L)
      val n = n0 + n1; val d = d0 + d1
      if (d > 0) {
        // pinned double chains, identical in the oracle's SQL
        sOmE += math.floor((d0.toDouble -
          d.toDouble * n0.toDouble / n.toDouble) * 1000000.0 + 0.5).toLong
        if (n > 1)
          sV += math.floor((d.toDouble * n0.toDouble / n.toDouble *
            (n - n0).toDouble / n.toDouble *
            (n - d).toDouble / (n - 1).toDouble) * 1000000.0 + 0.5).toLong
      }
      for (g <- Seq(0L, 1L) if rem.contains(g))
        rem(g) -= (dOf(g) + cOf(g))
    }
    val chi =
      if (sV == 0L) 0.0
      else {
        val raw = sOmE.toDouble * sOmE.toDouble / (1000000.0 * sV.toDouble)
        math.floor(raw * 1000000.0 + 0.5) / 1000000.0
      }
    rows.toSeq
      .toDF("grp", "t_days", "n_risk", "d_events", "c_censored",
        "surv_mu")
      .withColumn("logrank_chi2", lit(chi))
      .orderBy(col("grp"), col("t_days"))
  }

  lazy val qSurvivalLogrankSql: String = {
    val dayUs = TimeSeries.dayUs
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id % 2 AS grp, user_id, epoch_us(ts) AS tus,
       |    event_id
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), mx AS (SELECT max(tus) AS m FROM ev),
       |sq AS (
       |  SELECT grp, user_id, tus,
       |    lead(tus) OVER (PARTITION BY user_id
       |                    ORDER BY tus, event_id) AS nxt
       |  FROM ev
       |), dur AS (
       |  SELECT grp, (nxt - tus) // $dayUs AS t, 1 AS d, 0 AS c
       |  FROM sq WHERE nxt IS NOT NULL
       |  UNION ALL
       |  SELECT grp, (mx.m - tus) // $dayUs AS t, 0 AS d, 1 AS c
       |  FROM sq CROSS JOIN mx WHERE nxt IS NULL
       |), daysg AS (
       |  SELECT grp, t, CAST(sum(d) AS BIGINT) AS d,
       |    CAST(sum(c) AS BIGINT) AS c
       |  FROM dur GROUP BY grp, t
       |), ordg AS (
       |  SELECT grp, t, d, c,
       |    CAST(row_number() OVER (PARTITION BY grp ORDER BY t)
       |      AS BIGINT) AS i,
       |    CAST(sum(d + c) OVER (PARTITION BY grp) AS BIGINT)
       |      - CAST(COALESCE(sum(d + c) OVER (PARTITION BY grp
       |          ORDER BY t
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS BIGINT) AS n_risk
       |  FROM daysg
       |), walkg AS (
       |  SELECT grp, CAST(0 AS BIGINT) AS i, CAST(1000000 AS BIGINT) AS s
       |  FROM (SELECT DISTINCT grp FROM daysg)
       |  UNION ALL
       |  SELECT o.grp, o.i,
       |    CASE WHEN o.d > 0 THEN (w.s * (o.n_risk - o.d)) // o.n_risk
       |         ELSE w.s END
       |  FROM walkg w JOIN ordg o ON o.grp = w.grp AND o.i = w.i + 1
       |), pooled AS (
       |  SELECT t,
       |    CAST(sum(CASE WHEN grp = 0 THEN d ELSE 0 END) AS BIGINT)
       |      AS d0,
       |    CAST(sum(d) AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN grp = 0 THEN n_risk ELSE 0 END)
       |      AS BIGINT) AS n0,
       |    CAST(sum(n_risk) AS BIGINT) AS n
       |  FROM (
       |    -- at-risk per group at EVERY pooled day: total minus what
       |    -- left strictly before t (groups without a row at t still
       |    -- stand at risk)
       |    SELECT dd.t, g.grp,
       |      COALESCE((SELECT max(o.d) FROM ordg o
       |                WHERE o.grp = g.grp AND o.t = dd.t), 0) AS d,
       |      (SELECT sum(o.d + o.c) FROM ordg o WHERE o.grp = g.grp)
       |        - COALESCE((SELECT sum(o.d + o.c) FROM ordg o
       |                    WHERE o.grp = g.grp AND o.t < dd.t), 0)
       |        AS n_risk
       |    FROM (SELECT DISTINCT t FROM daysg) dd
       |    CROSS JOIN (SELECT DISTINCT grp FROM daysg) g
       |  ) GROUP BY t
       |), lr AS (
       |  SELECT
       |    CAST(COALESCE(sum(CAST(floor((CAST(d0 AS DOUBLE)
       |      - CAST(d AS DOUBLE) * CAST(n0 AS DOUBLE)
       |        / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)), 0)
       |      AS BIGINT) AS s_ome,
       |    CAST(COALESCE(sum(CASE WHEN n > 1 THEN
       |      CAST(floor((CAST(d AS DOUBLE) * CAST(n0 AS DOUBLE)
       |        / CAST(n AS DOUBLE) * CAST(n - n0 AS DOUBLE)
       |        / CAST(n AS DOUBLE) * CAST(n - d AS DOUBLE)
       |        / CAST(n - 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |      ELSE 0 END), 0) AS BIGINT) AS s_v
       |  FROM pooled WHERE d > 0
       |), chi AS (
       |  SELECT CASE WHEN s_v = 0 THEN 0.0
       |    ELSE floor((CAST(s_ome AS DOUBLE) * CAST(s_ome AS DOUBLE)
       |      / (1000000.0 * CAST(s_v AS DOUBLE))) * 1000000.0 + 0.5)
       |      / 1000000.0 END AS logrank_chi2
       |  FROM lr
       |)
       |SELECT o.grp, o.t AS t_days, o.n_risk, o.d AS d_events,
       |       o.c AS c_censored, w.s AS surv_mu, chi.logrank_chi2
       |FROM ordg o JOIN walkg w ON w.grp = o.grp AND w.i = o.i
       |CROSS JOIN chi
       |WHERE o.d > 0 ORDER BY o.grp, t_days""".stripMargin
  }

  // ---- q_stickiness: DAU/MAU engagement ratio --------------------------

  /** The stickiness window in days (30-day epoch windows — exact
    * integer bucketing both engines share; calendar months would drag
    * in tz/locale semantics for no analytical gain).
    */
  val stickinessWindowDays = 30L

  /** STICKINESS (avg DAU / MAU) per 30-day window — the engagement
    * ratio product dashboards read next to the cohort matrix
    * (q_cohort says who RETURNS across weeks; this says how much of
    * the live base shows up on a given day). Exact: dau_sum =
    * Σ_day |distinct users that day|, mau = |distinct users in the
    * window|, stickiness = dau_sum/(n_days·mau) — the average-DAU/MAU
    * form with the day count kept integral (no fractional mean), one
    * pinned q6 division per window.
    *
    * 100 TB shape: one (day, user) distinct, aggregated twice along
    * its own prefix (day-level count then window fold; window-level
    * distinct shares the same exchange) — two map-combinable aggs,
    * no joins, no second events scan.
    */
  def qStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    stickinessFromDayUsers(
      Graft.table(spark, sfDir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(expr(graft.pipeline.ParityMath.fdivSql("graft_ts_us(ts)", "86400000000")).as("d"),
          col("user_id"))
        .distinct())
  }

  /** The fold over any distinct (d, user_id) relation — the streaming
    * face's storable fact (first-seen day-user pairs, the streamDedup
    * discipline).
    */
  private[graft] def stickinessFromDayUsers(du: DataFrame): DataFrame = {
    // both the DAU and MAU branches fold this relation - materialize
    // it once (the mkDense discipline) instead of re-deriving the
    // distinct from the events scan twice
    val d0 = du.select(
      expr(graft.pipeline.ParityMath.fdivSql("d", s"$stickinessWindowDays")).as("w"),
      col("d"), col("user_id"))
      .localCheckpoint()
    val dau = d0.groupBy(col("w"), col("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_sum"))
    val mau = d0.groupBy(col("w"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "w")
      .select(col("w").as("win"), col("n_days"), col("dau_sum"),
        col("mau"),
        when(col("mau") > 0 && col("n_days") > 0,
          graft.pipeline.ParityMath.q6(expr(
            """CAST(dau_sum AS DOUBLE)
              |/ (CAST(n_days AS DOUBLE) * CAST(mau AS DOUBLE))"""
              .stripMargin))).as("stickiness"))
      .orderBy(col("win"))
  }

  val qStickinessSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT ${graft.pipeline.ParityMath.fdivDuckSql("epoch_us(ts)", "86400000000")} AS d, user_id
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |), dd AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("d", stickinessWindowDays.toString)} AS w, d,
       |         CAST(count(DISTINCT user_id) AS BIGINT) AS dau
       |  FROM du GROUP BY 1, 2
       |), a AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(sum(dau) AS BIGINT) AS dau_sum
       |  FROM dd GROUP BY 1
       |), m AS (
       |  SELECT ${graft.pipeline.ParityMath.fdivDuckSql("d", stickinessWindowDays.toString)} AS w,
       |         CAST(count(DISTINCT user_id) AS BIGINT) AS mau
       |  FROM du GROUP BY 1
       |)
       |SELECT a.w AS win, a.n_days, a.dau_sum, m.mau,
       |  CASE WHEN m.mau > 0 AND a.n_days > 0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """CAST(dau_sum AS DOUBLE)
              |/ (CAST(n_days AS DOUBLE) * CAST(mau AS DOUBLE))"""
              .stripMargin)}
       |  END AS stickiness
       |FROM a JOIN m ON a.w = m.w ORDER BY win""".stripMargin

  // ---- q_chisq: event-mix independence across user cohorts ------------

  /** CHI-SQUARE TEST OF INDEPENDENCE on the event_type x user-parity
    * contingency table (even/odd user_id - the pprSeedMod stand-in
    * convention for an experiment assignment), with Cramer's V as the
    * effect size: does the event MIX differ between the two cohorts
    * beyond what their sizes predict? The categorical companion to
    * q_abtest's single-goal proportion test.
    *
    * Determinism: the table, row/column margins and dof are exact
    * integers; each cell's (obs - e)^2/e is a pinned double chain
    * quantized to integer MICRO-units (both engines floor(x*1e6+.5)
    * the same expression) and summed exactly as BIGINTs - the
    * q_survival_logrank discipline - so cell order can never reorder
    * float addition; V = sqrt(chi2/(n*min(r-1,c-1))) is one more
    * pinned chain, q6.
    *
    * Zero-observed cells still contribute (obs 0 against a positive
    * expectation), so the grid is the full types x groups cross - a
    * type seen only in one cohort is exactly the signal.
    *
    * 100 TB shape: ONE map-combinable (type, parity) count over the
    * events scan; everything after lives on the tiny cell grid
    * (#types x 2). Margins broadcast; no second scan of anything
    * event-sized.
    */
  def qChisq(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    chisqFromCells(chisqCells(Graft.table(spark, sfDir, "events")))
  }

  /** The ADDITIVE contingency cells - the streaming/store faces' only
    * storable fact.
    */
  private[graft] def chisqCells(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type").as("et"),
        pmod(col("user_id"), lit(2)).as("grp"))
      .groupBy(col("et"), col("grp")).agg(count(lit(1)).as("n"))

  /** The pinned per-cell micro-contribution, spliced into both
    * engines: e = rt*cg/n_tot, cell = (obs - e)^2 / e.
    */
  private val chisqCellMicroExpr: String =
    """CAST(floor(
      |  ((CAST(obs AS DOUBLE)
      |    - CAST(rt AS DOUBLE) * CAST(cg AS DOUBLE)
      |      / CAST(n_tot AS DOUBLE))
      |   * (CAST(obs AS DOUBLE)
      |      - CAST(rt AS DOUBLE) * CAST(cg AS DOUBLE)
      |        / CAST(n_tot AS DOUBLE)))
      |  / (CAST(rt AS DOUBLE) * CAST(cg AS DOUBLE)
      |     / CAST(n_tot AS DOUBLE))
      |  * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)
      |) AS BIGINT)""".stripMargin

  private val chisqVExpr: String =
    """sqrt((CAST(chi2_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))
      |/ (CAST(n_tot AS DOUBLE)
      |   * CAST(least(n_types - 1, n_groups - 1) AS DOUBLE)))"""
      .stripMargin

  /** The test over any (et, grp, n) cell relation - shared by the
    * batch, streaming and store faces (margins and every expectation
    * shift with any arriving event: only the counts are storable).
    */
  private[graft] def chisqFromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0.localCheckpoint()
    val rt = cells.groupBy(col("et")).agg(sum(col("n")).as("rt"))
    val cg = cells.groupBy(col("grp")).agg(sum(col("n")).as("cg"))
    val tot = cells.agg(sum(col("n")).as("n_tot"),
      countDistinct(col("et")).as("n_types"),
      countDistinct(col("grp")).as("n_groups"))
    val grid = cells.select(col("et")).distinct()
      .crossJoin(cells.select(col("grp")).distinct())
      .join(cells, Seq("et", "grp"), "left")
      .select(col("et"), col("grp"),
        coalesce(col("n"), lit(0L)).as("obs"))
      .join(broadcast(rt), "et")
      .join(broadcast(cg), "grp")
      .crossJoin(broadcast(tot.select(col("n_tot"))))
    grid.select(expr(chisqCellMicroExpr).as("mi"))
      .agg(coalesce(sum(col("mi")), lit(0L)).as("chi2_micro"))
      .crossJoin(broadcast(tot))
      .select(col("n_tot"), col("n_types"), col("n_groups"),
        (greatest(col("n_types") - 1, lit(0L)) *
          greatest(col("n_groups") - 1, lit(0L))).as("dof"),
        (col("chi2_micro").cast("double") / lit(1000000.0)).as("chi2"),
        when(col("n_types") > 1 && col("n_groups") > 1,
          graft.pipeline.ParityMath.q6(expr(chisqVExpr)))
          .as("cramers_v"))
  }

  val qChisqSql: String =
    s"""WITH cells AS (
       |  SELECT event_type AS et, user_id % 2 AS grp,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events
       |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY 1, 2
       |), rt AS (SELECT et, CAST(sum(n) AS BIGINT) AS rt
       |          FROM cells GROUP BY 1),
       |cg AS (SELECT grp, CAST(sum(n) AS BIGINT) AS cg
       |       FROM cells GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_tot,
       |         CAST(count(DISTINCT et) AS BIGINT) AS n_types,
       |         CAST(count(DISTINCT grp) AS BIGINT) AS n_groups
       |  FROM cells
       |), grid AS (
       |  SELECT t.et, g.grp, CAST(coalesce(c.n, 0) AS BIGINT) AS obs
       |  FROM (SELECT DISTINCT et FROM cells) t
       |  CROSS JOIN (SELECT DISTINCT grp FROM cells) g
       |  LEFT JOIN cells c ON c.et = t.et AND c.grp = g.grp
       |), mic AS (
       |  SELECT CAST(coalesce(sum($chisqCellMicroExpr), 0) AS BIGINT)
       |    AS chi2_micro
       |  FROM grid JOIN rt USING (et) JOIN cg USING (grp) CROSS JOIN tot
       |)
       |SELECT tot.n_tot, tot.n_types, tot.n_groups,
       |  CAST(greatest(tot.n_types - 1, 0)
       |       * greatest(tot.n_groups - 1, 0) AS BIGINT) AS dof,
       |  CAST(chi2_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS chi2,
       |  CASE WHEN tot.n_types > 1 AND tot.n_groups > 1
       |  THEN ${graft.pipeline.ParityMath.q6Sql(chisqVExpr)}
       |  END AS cramers_v
       |FROM mic CROSS JOIN tot""".stripMargin

  // ---- q_abtest: two-proportion experiment readout ---------------------

  /** The conversion goal: a user converts on their first 'purchase'. */
  val abtestGoal = "purchase"

  /** TWO-PROPORTION Z-TEST between the even/odd user cohorts on the
    * purchase-conversion goal - the experiment readout every A/B
    * dashboard leads with (q_chisq asks "does the whole event mix
    * differ"; this asks the decision question about ONE goal metric,
    * signed, with the per-arm rates beside it).
    *
    * Determinism: per-arm user and converter counts are exact
    * integers off a per-user max fold; the rates and the pooled
    * z = (pA - pB)/sqrt(p(1-p)(1/nA + 1/nB)) are pinned double
    * chains over them (sqrt is IEEE correctly-rounded), q6, with z
    * NULL when either arm is empty or the pooled rate is degenerate
    * (0 or 1 - no variance, no verdict).
    *
    * 100 TB shape: ONE user-keyed map-combinable max fold over the
    * events scan, then a 4-counter global agg - no joins, state one
    * bit per user.
    */
  def qAbtest(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    abtestFromFlags(abtestFlags(Graft.table(spark, sfDir, "events")))
  }

  // ---- q_mannwhitney: rank-sum test between the user cohorts ----------

  /** MANN–WHITNEY U (Wilcoxon rank-sum) between the two user cohorts
    * (even/odd user_id — the abtest/log-rank split) over event
    * `value`: the NONPARAMETRIC companion completing the test family
    * (q_chisq on categories, q_abtest on rates, q_survival_logrank on
    * curves; this on a numeric distribution with no normality
    * assumption — the correct A/B readout for skewed metrics like
    * revenue or latency). Tie-safe and exact: observations collapse
    * to value-level counts (ties at a value carry EQUAL rank, so the
    * DOUBLED average rank lo+hi+1 is an integer — the
    * trimmedFromValueCounts argument on the rank axis), 2R_A folds as
    * Σ c_A·(2·lo + c + 1), the tie correction T = Σ(c³−c), and
    * z = (2U_A − n_A·n_B) / (2·√((n_A·n_B/12)·((n+1) − T/(n(n−1)))))
    * is ONE pinned double chain over those integers, q6, NULL when
    * either cohort is empty or every observation ties (variance 0).
    * No continuity correction (documented; both engines identical).
    * Headroom: T needs c³ < 2⁶³ — a single value repeated ≤ ~2M times
    * per distinct v_mu; beyond that T needs the DECIMAL(38,0) scheme
    * (the periodogram-style loud bound, not silent wrap).
    *
    * 100 TB shape: one map-combinable (grp, value) count, one
    * values-sized `GlobalRank.withPrefixSum` range shuffle for the
    * exclusive below-count (never a single-task global window), one
    * 1-row fold. The (grp, v_mu) count relation is the ADDITIVE
    * storable fact of both extra faces.
    */
  def qMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    mannWhitneyFromCounts(
      Graft.table(spark, sfDir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(pmod(col("user_id"), lit(2)).as("grp"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .as("v_mu"))
        .groupBy(col("grp"), col("v_mu"))
        .agg(count(lit(1)).as("c")))
  }

  // ---- q_kruskal: k-group rank test ------------------------------------

  /** KRUSKAL–WALLIS H between the EVENT TYPES over value — the
    * k-group extension of q_mannwhitney (MW asks "did the A/B split
    * move the distribution?", this asks "do the event types draw
    * value from one distribution at all?" — the screen run before
    * pairwise tests): pooled tie-averaged ranks (the DOUBLED-rank
    * integers, 2·lo + c + 1 per value group, from ONE
    * `GlobalRank.withPrefixSum` pass), per-type doubled rank sums
    * 2R_g exact BIGINTs, tie term T = Σ(c³−c), and
    * H = [12/(n(n+1))·Σ_g R_g²/n_g − 3(n+1)] / (1 − T/(n³−n)). The
    * per-type R_g²/n_g terms are doubles, so the cross-type total
    * folds in event_type order (the q_psi_drift sorted-fold
    * discipline — a plain sum would be partition-order-dependent);
    * everything upstream is exact integers. NULL H when n < 2,
    * k < 2, or every observation ties (the correction denominator
    * hits 0). Headroom: 2R_g ≤ 2n² needs n ≲ 2·10⁹ for BIGINT (the
    * MW bound's shape, loud not silent).
    *
    * 100 TB shape: one map-combinable (type, value) count — the
    * ADDITIVE storable fact of the stream/store faces — one
    * values-sized prefix pass, one types-sized fold.
    */
  def qKruskal(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    kruskalFromCounts(
      Graft.table(spark, sfDir, "events")
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_type").as("et"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .as("v_mu"))
        .groupBy(col("et"), col("v_mu"))
        .agg(count(lit(1)).as("c")))
  }

  /** The pooled tie-averaged rank sums over any (et, v_mu, c)
    * value-count relation — the shared core of BOTH k-group rank
    * tests (Kruskal–Wallis screens, Dunn localizes; one landed fact,
    * two views): per-type (n_g, 2R_g), the tie term, and n. ONE
    * `GlobalRank.withPrefixSum` pass, exact integers.
    */
  private[graft] def pooledRankSums(
      vc0: DataFrame): (DataFrame, DataFrame, Long) = {
    val vc = vc0.groupBy(col("et"), col("v_mu"))
      .agg(sum(col("c")).as("c")).localCheckpoint()
    val pooled = vc.groupBy(col("v_mu")).agg(sum(col("c")).as("c"))
    val (pf, nTot) = graft.core.GlobalRank.withPrefixSum(
      pooled, Seq(col("v_mu").asc), "c", "lo")
    // Loud BIGINT headroom, JOINTLY sufficient (r15 ADVICE: the old
    // independent caps n <= 2.1e9 AND c <= 2e6 still let the tie-cube
    // SUM reach ~n*c_max^2 ~ 8.4e21 >> Long.Max): 2R_g <= ~2n^2 caps
    // n at ~2.1e9 (driver-side), and since sum_v(c^3 - c) <=
    // c_max^2 * sum_v(c) = c_max^2 * n, the per-value cap is DERIVED
    // from the n already in hand - c <= sqrt(0.98*Long.Max/n) (~66k
    // at n = 2.1e9; the 2e6 ceiling only binds below n ~ 2.2e6).
    // Beyond either, silent non-ANSI Long wrap vs the HUGEINT oracle.
    require(nTot <= 2100000000L,
      s"rank test: n=$nTot exceeds the 2.1e9 BIGINT rank-sum bound")
    val cCap = math.min(2000000L, math.sqrt(
      Long.MaxValue.toDouble * 0.98 / math.max(nTot, 1L)).toLong)
    val cTie = graft.pipeline.ParityMath.loudBound(
      col("c"), cCap, "rank-test per-value tie count")
    val r2 = pf.select(col("v_mu"),
      (lit(2L) * col("lo") + col("c") + 1L).as("r2"),
      (cTie * cTie * cTie - cTie).as("tv"))
    val perType = vc.join(r2, "v_mu")
      .groupBy(col("et"))
      .agg(sum(col("c")).as("n_g"),
        sum(col("c") * col("r2")).as("two_r"))
      .localCheckpoint()
    val ties = r2.agg(coalesce(sum(col("tv")), lit(0L)).as("t_ties"))
    (perType, ties, nTot)
  }

  /** The test over any (et, v_mu, c) value-count relation — shared by
    * all three faces.
    */
  private[graft] def kruskalFromCounts(vc0: DataFrame): DataFrame = {
    val (perType, ties, nTot) = pooledRankSums(vc0)
    val totals = perType.agg(count(lit(1)).as("k_groups"))
    val terms = perType
      .select(col("et"),
        expr("""(CAST(two_r AS DOUBLE) / 2.0)
               |* (CAST(two_r AS DOUBLE) / 2.0)
               |/ CAST(n_g AS DOUBLE)""".stripMargin).as("term"))
      .agg(expr(
        """aggregate(array_sort(collect_list(struct(et, term))),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)""".stripMargin)
        .as("s_terms"))
    val hExpr =
      s"""(12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))
         |  * s_terms - 3.0 * (CAST(n_tot AS DOUBLE) + 1.0))
         |/ (1.0 - CAST(t_ties AS DOUBLE)
         |   / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
         |      * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE)))"""
        .stripMargin
    perType.crossJoin(broadcast(
        terms.crossJoin(ties).crossJoin(totals)
          .select(col("s_terms"), col("t_ties"), col("k_groups"),
            lit(nTot).as("n_tot"))))
      .select(col("et").as("event_type"), col("n_g"), col("two_r"),
        col("k_groups"), col("t_ties"),
        when(col("n_tot") > 1 && col("k_groups") > 1 &&
          expr("""CAST(t_ties AS DOUBLE)
                 |< CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
                 |  * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE)"""
            .stripMargin),
          graft.pipeline.ParityMath.q6(expr(hExpr))).as("h"))
      .orderBy(col("event_type"))
  }

  val qKruskalSql: String =
    s"""WITH obs AS (
       |  SELECT event_type AS et,
       |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE event_type IS NOT NULL AND value IS NOT NULL
       |), vc AS MATERIALIZED (
       |  SELECT et, v_mu, CAST(count(*) AS BIGINT) AS c
       |  FROM obs GROUP BY 1, 2
       |), pooled AS (
       |  SELECT v_mu, CAST(sum(c) AS BIGINT) AS c FROM vc GROUP BY 1
       |), r2 AS MATERIALIZED (
       |  SELECT v_mu,
       |    CAST(2 * coalesce(sum(c) OVER (ORDER BY v_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2,
       |    CAST(c * c * c - c AS BIGINT) AS tv
       |  FROM pooled
       |), pt AS MATERIALIZED (
       |  SELECT vc.et, CAST(sum(vc.c) AS BIGINT) AS n_g,
       |    CAST(sum(vc.c * r2.r2) AS BIGINT) AS two_r
       |  FROM vc JOIN r2 USING (v_mu) GROUP BY 1
       |), tt AS (
       |  SELECT CAST(coalesce(sum(tv), 0) AS BIGINT) AS t_ties,
       |    CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tot
       |  FROM pooled CROSS JOIN r2 r WHERE r.v_mu = pooled.v_mu
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_groups,
       |    (SELECT list_sum(list(
       |       (CAST(two_r AS DOUBLE) / 2.0)
       |       * (CAST(two_r AS DOUBLE) / 2.0)
       |       / CAST(n_g AS DOUBLE) ORDER BY et)) FROM pt) AS s_terms
       |  FROM pt
       |)
       |SELECT pt.et AS event_type, pt.n_g, pt.two_r,
       |  tot.k_groups, tt.t_ties,
       |  CASE WHEN tt.n_tot > 1 AND tot.k_groups > 1 AND
       |    CAST(tt.t_ties AS DOUBLE)
       |    < CAST(tt.n_tot AS DOUBLE) * CAST(tt.n_tot AS DOUBLE)
       |      * CAST(tt.n_tot AS DOUBLE) - CAST(tt.n_tot AS DOUBLE)
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """(12.0 / (CAST(tt.n_tot AS DOUBLE)
              |         * (CAST(tt.n_tot AS DOUBLE) + 1.0))
              |  * tot.s_terms - 3.0 * (CAST(tt.n_tot AS DOUBLE) + 1.0))
              |/ (1.0 - CAST(tt.t_ties AS DOUBLE)
              |   / (CAST(tt.n_tot AS DOUBLE) * CAST(tt.n_tot AS DOUBLE)
              |      * CAST(tt.n_tot AS DOUBLE)
              |      - CAST(tt.n_tot AS DOUBLE)))""".stripMargin)}
       |  END AS h
       |FROM pt CROSS JOIN tt CROSS JOIN tot
       |ORDER BY event_type""".stripMargin

  // ---- q_dunn: post-hoc pairwise rank tests ---------------------------

  /** DUNN'S TEST between every pair of event types — the POST-HOC
    * member the k-group family was missing: q_kruskal answers "do the
    * types draw value from one distribution at all?" and stops; the
    * analyst's next question is always WHICH pairs differ, and
    * running pairwise Mann–Whitneys re-ranks each pair (wrong: the
    * tests must share the pooled ranking, or the family-wise story
    * falls apart — Dunn 1964's point). This face reuses the EXACT
    * pooled rank sums Kruskal–Wallis already computes
    * (`pooledRankSums` — one landed fact, two views; the
    * stream/store faces share q_kruskal's (et, v_mu, c) state):
    * z_gh = (R̄_g − R̄_h) / √(σ²·(1/n_g + 1/n_h)) with
    * σ² = [n(n+1) − T/(n−1)]/12, tie-corrected; mean ranks are
    * two_r/(2n_g) off the exact integers, ONE pinned double chain per
    * pair, q6, NULL when the variance degenerates (all values tied).
    *
    * 100 TB shape: everything after the shared rank pass runs on the
    * TYPES-sized relation — the pair join is k², k = event types
    * (dozens), never data-sized.
    */
  def qDunn(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    dunnFromCounts(
      Graft.table(spark, sfDir, "events")
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_type").as("et"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .as("v_mu"))
        .groupBy(col("et"), col("v_mu"))
        .agg(count(lit(1)).as("c")))
  }

  private[graft] val dunnZExpr: String =
    """(CAST(r2_a AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE))
      | - CAST(r2_b AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE)))
      |/ sqrt((CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0)
      |        - CAST(t_ties AS DOUBLE)
      |          / (CAST(n_tot AS DOUBLE) - 1.0)) / 12.0
      |       * (1.0 / CAST(n_a AS DOUBLE)
      |          + 1.0 / CAST(n_b AS DOUBLE)))""".stripMargin

  private[graft] val dunnVarPosExpr: String =
    """CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0)
      |- CAST(t_ties AS DOUBLE)
      |  / (CAST(n_tot AS DOUBLE) - 1.0)""".stripMargin

  /** The pairwise readout over any (et, v_mu, c) value-count
    * relation — shared by all three faces.
    */
  private[graft] def dunnFromCounts(vc0: DataFrame): DataFrame = {
    val (perType, ties, nTot) = pooledRankSums(vc0)
    val a = perType.select(col("et").as("et_a"), col("n_g").as("n_a"),
      col("two_r").as("r2_a"))
    val b = perType.select(col("et").as("et_b"), col("n_g").as("n_b"),
      col("two_r").as("r2_b"))
    a.join(b, col("et_a") < col("et_b"))
      .crossJoin(broadcast(
        ties.select(col("t_ties"), lit(nTot).as("n_tot"))))
      .select(col("et_a"), col("et_b"), col("n_a"), col("n_b"),
        when(col("n_tot") > 1 && expr(dunnVarPosExpr) > 0.0,
          graft.pipeline.ParityMath.q6(expr(dunnZExpr))).as("z"))
      .orderBy(col("et_a"), col("et_b"))
  }

  val qDunnSql: String =
    s"""WITH obs AS (
       |  SELECT event_type AS et,
       |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE event_type IS NOT NULL AND value IS NOT NULL
       |), vc AS MATERIALIZED (
       |  SELECT et, v_mu, CAST(count(*) AS BIGINT) AS c
       |  FROM obs GROUP BY 1, 2
       |), pooled AS (
       |  SELECT v_mu, CAST(sum(c) AS BIGINT) AS c FROM vc GROUP BY 1
       |), r2 AS MATERIALIZED (
       |  SELECT v_mu,
       |    CAST(2 * coalesce(sum(c) OVER (ORDER BY v_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2,
       |    CAST(c * c * c - c AS BIGINT) AS tv
       |  FROM pooled
       |), pt AS MATERIALIZED (
       |  SELECT vc.et, CAST(sum(vc.c) AS BIGINT) AS n_g,
       |    CAST(sum(vc.c * r2.r2) AS BIGINT) AS two_r
       |  FROM vc JOIN r2 USING (v_mu) GROUP BY 1
       |), tt AS (
       |  SELECT CAST(coalesce(sum(tv), 0) AS BIGINT) AS t_ties,
       |    CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tot
       |  FROM pooled CROSS JOIN r2 r WHERE r.v_mu = pooled.v_mu
       |)
       |SELECT a.et AS et_a, b.et AS et_b,
       |  a.n_g AS n_a, b.n_g AS n_b,
       |  CASE WHEN n_tot > 1 AND ${dunnVarPosExpr
            .replace("r2_a", "a.two_r").replace("r2_b", "b.two_r")} > 0.0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(dunnZExpr
            .replace("r2_a", "a.two_r").replace("r2_b", "b.two_r")
            .replace("n_a", "a.n_g").replace("n_b", "b.n_g"))}
       |  END AS z
       |FROM pt a JOIN pt b ON a.et < b.et CROSS JOIN tt
       |ORDER BY et_a, et_b""".stripMargin

  // ---- q_ks_test: two-sample Kolmogorov–Smirnov -----------------------

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV between the user cohorts over
    * event value — the distribution-SHAPE member next to
    * q_mannwhitney's location shift (KS sees a variance or tail
    * change MW is blind to; the classic drift detector between a
    * reference and a live window). D = max_v |F_A(v) − F_B(v)| is
    * EXACT end to end: per distinct value the cumulative cohort
    * counts come from ONE `GlobalRank.withPrefixSum` pass (the
    * inclusive ECDF step), and |cumA·n_B − cumB·n_A| is an integer —
    * the max and the argmax value are integer comparisons, with the
    * single division D = num/(n_A·n_B) one q6 at the end. The
    * asymptotic significance scale λ = D·√(n_A·n_B/(n_A+n_B)) rides
    * along as one pinned double chain (the reader compares it to the
    * 1.36 ≈ α = 0.05 line). NULL verdict when either cohort is empty.
    * Headroom: cum·n < 2⁶³ bounds the corpus at ~3B per cohort;
    * beyond that the numerator needs the DECIMAL(38,0) scheme (loud
    * bound, not silent wrap).
    *
    * 100 TB shape: the q_mannwhitney plan exactly — one map-combinable
    * (grp, value) count (the SAME additive relation; the store face
    * reuses the MW landing verbatim), one values-sized range-shuffle
    * prefix sum, one 1-row fold. Ties need no special case: both
    * ECDFs step at the same point and the sup over step points is the
    * sup over the whole line.
    */
  def qKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    ksFromCounts(
      Graft.table(spark, sfDir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(pmod(col("user_id"), lit(2)).as("grp"),
          expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)")
            .as("v_mu"))
        .groupBy(col("grp"), col("v_mu"))
        .agg(count(lit(1)).as("c")))
  }

  private val ksLambdaExpr: String =
    """(CAST(d_num AS DOUBLE)
      | / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
      |* sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))"""
      .stripMargin

  /** The test over any (grp, v_mu, c) value-count relation — shared
    * by all three faces (the q_mannwhitney state, one more view).
    */
  private[graft] def ksFromCounts(vc0: DataFrame): DataFrame = {
    val vc = vc0.groupBy(col("v_mu")).agg(
      coalesce(sum(when(col("grp") === 0, col("c")).otherwise(0L)),
        lit(0L)).as("ca"),
      coalesce(sum(when(col("grp") =!= 0, col("c")).otherwise(0L)),
        lit(0L)).as("cb"))
    // two prefix passes over the same values-sized sorted relation
    // (never corpus-sized); inclusive ECDF steps = exclusive + own
    val (p1, nA) = graft.core.GlobalRank.withPrefixSum(
      vc, Seq(col("v_mu").asc), "ca", "cum_a0")
    val (p2, nB) = graft.core.GlobalRank.withPrefixSum(
      p1, Seq(col("v_mu").asc), "cb", "cum_b0")
    // Loud BIGINT headroom: the cross products cum_a*n_b / cum_b*n_a
    // reach n_a*n_b, which must fit int64 - beyond that, non-ANSI
    // Long wrap vs the HUGEINT oracle. The prefix totals are already
    // in hand driver-side; fail loudly (the qBetweenness discipline).
    require(BigInt(nA) * BigInt(nB) <= BigInt(Long.MaxValue),
      s"ksTest: n_a=$nA * n_b=$nB exceeds the BIGINT ECDF-step bound")
    val cum = p2.select(col("v_mu"),
        (col("cum_a0") + col("ca")).as("cum_a"),
        (col("cum_b0") + col("cb")).as("cum_b"))
      .localCheckpoint()
    val tot = cum.agg(coalesce(max(col("cum_a")), lit(0L)).as("n_a"),
      coalesce(max(col("cum_b")), lit(0L)).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), col("v_mu"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
          .as("dn"))
      .agg(coalesce(max(col("n_a")), lit(0L)).as("n_a"),
        coalesce(max(col("n_b")), lit(0L)).as("n_b"),
        // argmax with ties to the SMALLEST value: max over
        // (dn, -v_mu) pairs is deterministic
        max(struct(col("dn"), (-col("v_mu")).as("nv"))).as("m"))
      .select(col("n_a"), col("n_b"),
        coalesce(col("m.dn"), lit(0L)).as("d_num"),
        (-col("m.nv")).as("d_at"),
        when(col("n_a") > 0 && col("n_b") > 0,
          graft.pipeline.ParityMath.q6(
            col("m.dn").cast("double") /
              (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("d"),
        when(col("n_a") > 0 && col("n_b") > 0,
          graft.pipeline.ParityMath.q6(expr(ksLambdaExpr
            .replace("d_num", "m.dn")))).as("ks_lambda"))
  }

  val qKsTestSql: String =
    s"""WITH obs AS (
       |  SELECT user_id % 2 AS grp,
       |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE user_id IS NOT NULL AND value IS NOT NULL
       |), vc AS (
       |  SELECT v_mu,
       |    CAST(coalesce(sum(CASE WHEN grp = 0 THEN 1 END), 0)
       |      AS BIGINT) AS ca,
       |    CAST(coalesce(sum(CASE WHEN grp <> 0 THEN 1 END), 0)
       |      AS BIGINT) AS cb
       |  FROM obs GROUP BY 1
       |), cum AS (
       |  SELECT v_mu,
       |    CAST(sum(ca) OVER (ORDER BY v_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_a,
       |    CAST(sum(cb) OVER (ORDER BY v_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_b
       |  FROM vc
       |), tot AS (
       |  SELECT CAST(coalesce(max(cum_a), 0) AS BIGINT) AS n_a,
       |         CAST(coalesce(max(cum_b), 0) AS BIGINT) AS n_b
       |  FROM cum
       |), dd AS (
       |  SELECT t.n_a, t.n_b, c.v_mu,
       |    abs(c.cum_a * t.n_b - c.cum_b * t.n_a) AS dn
       |  FROM cum c CROSS JOIN tot t
       |), m AS (
       |  SELECT CAST(coalesce(max(n_a), 0) AS BIGINT) AS n_a,
       |    CAST(coalesce(max(n_b), 0) AS BIGINT) AS n_b,
       |    CAST(coalesce(max(dn), 0) AS BIGINT) AS d_num,
       |    CAST(min(v_mu) FILTER (WHERE dn = (SELECT max(dn) FROM dd))
       |      AS BIGINT) AS d_at
       |  FROM dd
       |)
       |SELECT n_a, n_b, d_num, d_at,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            """CAST(d_num AS DOUBLE)
              |/ (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"""
              .stripMargin)}
       |  END AS d,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            """(CAST(d_num AS DOUBLE)
              | / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
              |* sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              |       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))"""
              .stripMargin)}
       |  END AS ks_lambda
       |FROM m""".stripMargin

  private val mannWhitneyZExpr: String =
    """(CAST(two_u_a AS DOUBLE)
      | - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      |/ (2.0 * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
      |   * ((CAST(n_tot AS DOUBLE) + 1.0)
      |      - CAST(t_ties AS DOUBLE)
      |        / (CAST(n_tot AS DOUBLE)
      |           * (CAST(n_tot AS DOUBLE) - 1.0)))))""".stripMargin

  /** The test over any (grp, v_mu, c) value-count relation — shared
    * by all three faces (counts are additive under any batch split).
    */
  private[graft] def mannWhitneyFromCounts(vc0: DataFrame): DataFrame = {
    val spark = vc0.sparkSession
    val vc = vc0.groupBy(col("v_mu")).agg(
      sum(col("c")).as("c"),
      coalesce(sum(when(col("grp") === 0, col("c")).otherwise(0L)),
        lit(0L)).as("c_a"))
    val (ranked, nTot) = graft.core.GlobalRank.withPrefixSum(
      vc, Seq(col("v_mu").asc), "c", "lo")
    // Loud BIGINT headroom, JOINTLY sufficient (r15 ADVICE; the
    // pooledRankSums discipline): 2R_A <= ~2n^2 needs n <~ 2.1e9
    // (driver-side, nTot is already in hand), and since the tie-cube
    // SUM obeys sum_v(c^3 - c) <= c_max^2 * n, the per-value cap is
    // DERIVED from that n - c <= sqrt(0.98*Long.Max/n) (~66k at
    // n = 2.1e9; the 2e6 ceiling only binds below n ~ 2.2e6),
    // enforced in-plan (the driver never sees per-value counts).
    // Beyond either, the fold needs the DECIMAL(38,0) scheme; fail
    // loudly rather than let non-ANSI Long arithmetic wrap while the
    // DuckDB HUGEINT oracle keeps computing.
    require(nTot <= 2100000000L,
      s"mannWhitney: n=$nTot exceeds the 2.1e9 BIGINT rank-sum bound")
    val cCap = math.min(2000000L, math.sqrt(
      Long.MaxValue.toDouble * 0.98 / math.max(nTot, 1L)).toLong)
    val cTie = graft.pipeline.ParityMath.loudBound(
      col("c"), cCap, "mannWhitney per-value tie count")
    ranked.agg(
        coalesce(sum(col("c_a")), lit(0L)).as("n_a"),
        coalesce(sum(col("c") - col("c_a")), lit(0L)).as("n_b"),
        coalesce(sum(col("c_a") * (lit(2L) * col("lo") + col("c")
          + 1L)), lit(0L)).as("two_r_a"),
        coalesce(sum(cTie * cTie * cTie - cTie),
          lit(0L)).as("t_ties"))
      .select(col("n_a"), col("n_b"),
        (col("two_r_a") - col("n_a") * (col("n_a") + 1L))
          .as("two_u_a"),
        col("t_ties"), lit(nTot).as("n_tot"))
      .select(col("n_a"), col("n_b"), col("two_u_a"), col("t_ties"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("n_tot") > 1 &&
          expr("""(CAST(n_tot AS DOUBLE) + 1.0)
                 |- CAST(t_ties AS DOUBLE)
                 |  / (CAST(n_tot AS DOUBLE)
                 |     * (CAST(n_tot AS DOUBLE) - 1.0))"""
            .stripMargin) > 0.0,
          graft.pipeline.ParityMath.q6(expr(mannWhitneyZExpr)))
          .as("z"))
  }

  val qMannWhitneySql: String =
    s"""WITH obs AS (
       |  SELECT user_id % 2 AS grp,
       |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE user_id IS NOT NULL AND value IS NOT NULL
       |), vc AS (
       |  SELECT v_mu,
       |    CAST(count(*) AS BIGINT) AS c,
       |    CAST(coalesce(sum(CASE WHEN grp = 0 THEN 1 END), 0)
       |      AS BIGINT) AS c_a
       |  FROM obs GROUP BY 1
       |), r AS (
       |  SELECT v_mu, c, c_a,
       |    CAST(coalesce(sum(c) OVER (ORDER BY v_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS lo
       |  FROM vc
       |), t AS (
       |  SELECT
       |    CAST(coalesce(sum(c_a), 0) AS BIGINT) AS n_a,
       |    CAST(coalesce(sum(c - c_a), 0) AS BIGINT) AS n_b,
       |    CAST(coalesce(sum(c_a * (2 * lo + c + 1)), 0) AS BIGINT)
       |      AS two_r_a,
       |    CAST(coalesce(sum(c * c * c - c), 0) AS BIGINT) AS t_ties,
       |    CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tot
       |  FROM r
       |)
       |SELECT n_a, n_b,
       |  two_r_a - n_a * (n_a + 1) AS two_u_a, t_ties,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND n_tot > 1 AND
       |    (CAST(n_tot AS DOUBLE) + 1.0)
       |    - CAST(t_ties AS DOUBLE)
       |      / (CAST(n_tot AS DOUBLE)
       |         * (CAST(n_tot AS DOUBLE) - 1.0)) > 0.0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """(CAST(two_r_a - n_a * (n_a + 1) AS DOUBLE)
              | - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
              |/ (2.0 * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
              |   / 12.0)
              |   * ((CAST(n_tot AS DOUBLE) + 1.0)
              |      - CAST(t_ties AS DOUBLE)
              |        / (CAST(n_tot AS DOUBLE)
              |           * (CAST(n_tot AS DOUBLE) - 1.0)))))"""
              .stripMargin)}
       |  END AS z
       |FROM t""".stripMargin

  /** The per-user conversion flag relation (user_id, grp, conv) -
    * max-mergeable, the streaming/store faces' storable fact.
    */
  private[graft] def abtestFlags(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === abtestGoal).cast("long"))
        .as("conv"))
      .select(col("user_id"), pmod(col("user_id"), lit(2)).as("grp"),
        col("conv"))

  private val abtestZExpr: String =
    """(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      | - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |/ sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |       * (CAST(1 AS DOUBLE)
      |          - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |       * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
      |          + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE)))"""
      .stripMargin

  /** The readout over any (user_id, grp, conv) flag relation - shared
    * by all three faces.
    */
  private[graft] def abtestFromFlags(flags: DataFrame): DataFrame =
    flags.agg(
        coalesce(sum(when(col("grp") === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_a"),
        coalesce(sum(when(col("grp") === 0, col("conv"))
          .otherwise(0L)), lit(0L)).as("x_a"),
        coalesce(sum(when(col("grp") === 1, 1L).otherwise(0L)), lit(0L))
          .as("n_b"),
        coalesce(sum(when(col("grp") === 1, col("conv"))
          .otherwise(0L)), lit(0L)).as("x_b"))
      .select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        when(col("n_a") > 0, graft.pipeline.ParityMath.q6(
          col("x_a").cast("double") / col("n_a").cast("double")))
          .as("rate_a"),
        when(col("n_b") > 0, graft.pipeline.ParityMath.q6(
          col("x_b").cast("double") / col("n_b").cast("double")))
          .as("rate_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("x_a") + col("x_b") > 0 &&
          col("x_a") + col("x_b") < col("n_a") + col("n_b"),
          graft.pipeline.ParityMath.q6(expr(abtestZExpr))).as("z"))

  val qAbtestSql: String =
    s"""WITH pu AS (
       |  SELECT user_id, user_id % 2 AS grp,
       |    CAST(max(CASE WHEN event_type = '$abtestGoal'
       |             THEN 1 ELSE 0 END) AS BIGINT) AS conv
       |  FROM events
       |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
       |  GROUP BY 1, 2
       |), t AS (
       |  SELECT
       |    CAST(coalesce(sum(CASE WHEN grp = 0 THEN 1 END), 0)
       |      AS BIGINT) AS n_a,
       |    CAST(coalesce(sum(CASE WHEN grp = 0 THEN conv END), 0)
       |      AS BIGINT) AS x_a,
       |    CAST(coalesce(sum(CASE WHEN grp = 1 THEN 1 END), 0)
       |      AS BIGINT) AS n_b,
       |    CAST(coalesce(sum(CASE WHEN grp = 1 THEN conv END), 0)
       |      AS BIGINT) AS x_b
       |  FROM pu
       |)
       |SELECT n_a, x_a, n_b, x_b,
       |  CASE WHEN n_a > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            "CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)")}
       |  END AS rate_a,
       |  CASE WHEN n_b > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            "CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)")}
       |  END AS rate_b,
       |  CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
       |         AND x_a + x_b < n_a + n_b
       |  THEN ${graft.pipeline.ParityMath.q6Sql(abtestZExpr)}
       |  END AS z
       |FROM t""".stripMargin
}
