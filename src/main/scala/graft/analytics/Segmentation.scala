package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * ONE customer-keyed map-combinable aggregation — the three ranking
    * windows then run over the DIMENSION-sized state relation (one row
    * per customer), which is the relation you'd rank on any engine;
    * the fact table itself is never sorted. The global max-date for
    * recency is a window over the same tiny relation.
    */
  /** Ranking math over any per-customer (o_custkey, last_us, frequency,
    * monetary_cents) state relation — shared by the batch face and the
    * incremental store face (whose stored per-batch partials merge to
    * exactly this state), so the quintile math cannot drift.
    */
  private[graft] def rfmFrom(per: DataFrame): DataFrame = {
    val wall = Window.partitionBy()
    per
      .withColumn("n_cust", count(lit(1)).over(wall))
      .withColumn("max_us", max(col("last_us")).over(wall))
      .withColumn("rn_r", row_number().over(
        Window.partitionBy().orderBy(col("last_us"), col("o_custkey"))))
      .withColumn("rn_f", row_number().over(
        Window.partitionBy().orderBy(col("frequency"), col("o_custkey"))))
      .withColumn("rn_m", row_number().over(
        Window.partitionBy().orderBy(col("monetary_cents"),
          col("o_custkey"))))
      .select(col("o_custkey"),
        expr(s"(max_us - last_us) DIV ${dayUs}L").as("recency_days"),
        col("frequency"), col("monetary_cents"),
        expr("1L + (CAST(rn_r AS BIGINT) - 1L) * 5L DIV n_cust")
          .as("r_score"),
        expr("1L + (CAST(rn_f AS BIGINT) - 1L) * 5L DIV n_cust")
          .as("f_score"),
        expr("1L + (CAST(rn_m AS BIGINT) - 1L) * 5L DIV n_cust")
          .as("m_score"))
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
    * Formulation: after the fact collapses to per-customer integers,
    * p survives iff (a) no strictly-higher-frequency point reaches
    * its monetary (max over the RANGE frame f' > f, exact under
    * frequency ties because the frame is value-based, not row-based)
    * and (b) no same-frequency point strictly exceeds it (per-f max).
    * One sort of the DIMENSION-sized state relation; no self-join,
    * no quadratic dominance test — the oracle runs exactly that
    * NOT-EXISTS self-join as the independent formulation.
    */
  def qSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val per = rfmRollup(Graft.table(spark, sfDir, "orders"))
      .select(col("o_custkey"), col("frequency"), col("monetary_cents"))
    val fGt = Window.orderBy(col("frequency").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val fEq = Window.partitionBy(col("frequency"))
    per
      .withColumn("m_fgt", max(col("monetary_cents")).over(fGt))
      .withColumn("m_feq", max(col("monetary_cents")).over(fEq))
      .filter((col("m_fgt").isNull ||
          col("m_fgt") < col("monetary_cents")) &&
        col("monetary_cents") === col("m_feq"))
      .select(col("o_custkey"), col("frequency"), col("monetary_cents"))
      .orderBy(col("frequency").desc, col("monetary_cents").desc,
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
