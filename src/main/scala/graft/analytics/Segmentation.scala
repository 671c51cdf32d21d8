package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity segmentation over the orders fact: the classic RFM
  * (recency / frequency / monetary) quintile scoring every CRM and
  * curation pipeline runs to split a population into behavioral tiers
  * — the per-entity rollup + rank counterpart to q_cohort's per-week
  * matrix. (Same family as the reference's per-subject count rollups:
  * reduce a fact stream to per-entity state, then rank the states.)
  */
object Segmentation {

  private val dayUs: Long = 24L * 3600L * 1000000L

  /** Quintile scores via explicit integer rank math
    * (`1 + ((rn-1)*5) DIV n`), NOT `ntile` — ntile's uneven-bucket
    * placement is engine-defined at the margins, while row_number over
    * a total order plus integer division is bit-identical everywhere.
    * Monetary sums in exact integer cents (the orders table carries
    * 2-decimal doubles; summing raw doubles would make the result
    * depend on partition-order float association).
    *
    * 100 TB shape: the orders fact collapses to per-customer state in
    * ONE customer-keyed map-combinable aggregation — the three global
    * rankings then run over the DIMENSION-sized state relation (one
    * row per customer) as range-partitioned partition-offset ranks
    * (GlobalRank), never a single-task empty-partition window; the
    * fact table itself is never sorted. The global max-date for
    * recency is one bounded 1-row aggregate.
    */
  /** Ranking math over any per-customer (o_custkey, last_us, frequency,
    * monetary_cents) state relation — shared by the batch face and the
    * incremental store face (whose stored per-batch partials merge to
    * exactly this state), so the quintile math cannot drift.
    */
  private[graft] def rfmFrom(per: DataFrame): DataFrame = {
    // Three GLOBAL total-order rankings — but never through a
    // single-task `Window.partitionBy()` window: at 100 TB the
    // per-customer state is ~10⁹ rows, and an empty-partition window
    // funnels all of them through ONE task, three times. Instead all
    // three rankings share ONE axis-tagged range shuffle
    // (GlobalRank.longAxisRanks): partition-offset ranks over the
    // (axis, value, key) order, with n_cust and max_us falling out of
    // the same size pass as driver-side literals — no extra
    // aggregation job, no per-axis re-shuffle, no cache.
    val state = per
      .select(col("o_custkey"), col("last_us"), col("frequency"),
        col("monetary_cents"))
    val (ranks, nCust, maxs) = graft.core.GlobalRank.longAxisRanks(
      state, "o_custkey",
      Seq("last_us", "frequency", "monetary_cents"),
      Seq("rn_r", "rn_f", "rn_m"))
    val maxUs = if (nCust == 0L) 0L else maxs.head
    val n = math.max(nCust, 1L) // avoid DIV 0 on an empty state
    state.join(ranks, "o_custkey")
      .select(col("o_custkey"),
        expr(s"(${maxUs}L - last_us) DIV ${dayUs}L").as("recency_days"),
        col("frequency"), col("monetary_cents"),
        expr(s"1L + (rn_r - 1L) * 5L DIV ${n}L").as("r_score"),
        expr(s"1L + (rn_f - 1L) * 5L DIV ${n}L").as("f_score"),
        expr(s"1L + (rn_m - 1L) * 5L DIV ${n}L").as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .orderBy(col("o_custkey"))
  }

  /** The additive per-customer rollup of an orders relation — the
    * store face persists exactly this per batch (max/count/sum all
    * merge associatively across batches).
    */
  private[graft] def rfmRollup(orders: DataFrame): DataFrame =
    orders
      .select(col("o_custkey"), expr("graft_ts_us(o_orderdate)").as("ous"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("ous")).as("last_us"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))

  def qRfm(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    rfmFrom(rfmRollup(Graft.table(spark, sfDir, "orders")))
  }

  /** 2-D skyline (Pareto frontier) over the per-customer state: the
    * customers no one beats on BOTH frequency and monetary — the
    * multi-objective "best under two criteria at once" pick (same
    * question a curation pipeline asks of sources: max quality AND
    * max coverage). Dominance: q beats p iff q ≥ p on both axes and
    * > on at least one; equal (f, m) points beat neither, so exact
    * duplicates BOTH survive.
    *
    * Formulation — partition-and-merge, because dominance is CLOSED
    * under partitioning (a global skyline point is a local skyline
    * point of whatever partition holds it, and every strictly
    * dominated point has — by transitivity of strict dominance — a
    * dominator that survives its own partition's local pass): range
    * partition the per-customer state on (f desc, m desc), run the
    * one-pass local frontier in each partition (running max of m over
    * strictly-higher-f groups; survive iff m equals the group max AND
    * strictly exceeds that running max — so equal (f, m) duplicates
    * both survive, matching the dominance definition), then merge the
    * tiny per-partition frontiers with the SAME pass over one
    * partition. No global single-task window, no quadratic dominance
    * self-join — the oracle runs exactly that NOT-EXISTS self-join as
    * the independent formulation. The merge task is sized by the sum
    * of local frontier sizes (worst case the skyline itself plus one
    * frontier per partition boundary), not the data.
    */
  def qSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    skylineFrom(rfmRollup(Graft.table(spark, sfDir, "orders")))
  }

  /** The frontier over any per-customer state relation carrying
    * (o_custkey, frequency, monetary_cents) — shared by the batch face
    * and the streaming face, whose state IS the per-customer rollup
    * (count + sum merge additively): the frontier itself is a
    * query-time view, because one arriving order can both promote its
    * customer INTO the skyline and evict any number of now-dominated
    * members.
    */
  private[graft] def skylineFrom(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    val per = state
      .select(col("o_custkey"), col("frequency"), col("monetary_cents"))
    val order = Seq(col("frequency").desc, col("monetary_cents").desc,
      col("o_custkey").asc)
    // one-pass frontier over partitions already sorted by
    // (f desc, m desc, key): prevMax = max monetary over all
    // STRICTLY-higher-f rows seen so far, groupMax = max monetary of
    // the current f group (its first row, by the sort)
    def frontier(sorted: DataFrame): DataFrame = {
      import sorted.sparkSession.implicits._
      sorted.toDF("_1", "_2", "_3").as[(Long, Long, Long)]
        .mapPartitions { it =>
          var curF = 0L
          var groupMax = 0L
          var prevMax = Long.MinValue
          var started = false
          it.filter { case (_, f, m) =>
            if (!started || f != curF) {
              if (started) prevMax = math.max(prevMax, groupMax)
              started = true; curF = f; groupMax = m
            }
            m == groupMax && m > prevMax
          }
        }
        .toDF("o_custkey", "frequency", "monetary_cents")
    }
    val parts = spark.sparkContext.defaultParallelism
    val local = frontier(per
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*))
    // repartition(1), NOT coalesce(1): coalesce would collapse the
    // local pass itself into the single merge task
    val merged = frontier(local
      .repartition(1)
      .sortWithinPartitions(order: _*))
    merged.orderBy(col("frequency").desc, col("monetary_cents").desc,
      col("o_custkey"))
  }

  val qSkylineSql: String =
    s"""WITH per AS (
       |  SELECT o_custkey, count(*) AS frequency,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS monetary_cents
       |  FROM orders GROUP BY 1
       |)
       |SELECT p.o_custkey, CAST(p.frequency AS BIGINT) AS frequency,
       |  p.monetary_cents
       |FROM per p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM per q
       |  WHERE q.frequency >= p.frequency
       |    AND q.monetary_cents >= p.monetary_cents
       |    AND (q.frequency > p.frequency
       |         OR q.monetary_cents > p.monetary_cents)
       |)
       |ORDER BY frequency DESC, monetary_cents DESC, o_custkey""".stripMargin

  val qRfmSql: String =
    s"""WITH per AS (
       |  SELECT o_custkey, max(epoch_us(o_orderdate)) AS last_us,
       |    count(*) AS frequency,
       |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS monetary_cents
       |  FROM orders GROUP BY 1
       |), r AS (
       |  SELECT o_custkey, last_us, frequency, monetary_cents,
       |    count(*) OVER () AS n_cust,
       |    max(last_us) OVER () AS max_us,
       |    row_number() OVER (ORDER BY last_us, o_custkey) AS rn_r,
       |    row_number() OVER (ORDER BY frequency, o_custkey) AS rn_f,
       |    row_number() OVER (ORDER BY monetary_cents, o_custkey) AS rn_m
       |  FROM per
       |), s AS (
       |  SELECT o_custkey,
       |    (max_us - last_us) // $dayUs AS recency_days,
       |    CAST(frequency AS BIGINT) AS frequency, monetary_cents,
       |    1 + ((rn_r - 1) * 5) // n_cust AS r_score,
       |    1 + ((rn_f - 1) * 5) // n_cust AS f_score,
       |    1 + ((rn_m - 1) * 5) // n_cust AS m_score
       |  FROM r
       |)
       |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       |  frequency, monetary_cents,
       |  CAST(r_score AS BIGINT) AS r_score,
       |  CAST(f_score AS BIGINT) AS f_score,
       |  CAST(m_score AS BIGINT) AS m_score,
       |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
       |    || CAST(m_score AS VARCHAR) AS segment
       |FROM s ORDER BY o_custkey""".stripMargin
}
