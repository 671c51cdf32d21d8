package graft.analytics

import graft.core.Graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** TPC-H-shaped analytics over the synthetic star schema: the classic
  * scan→filter→aggregate→join→window coverage, written the way the plans
  * should look at 100 TB - filters pushed to the parquet scan, dims
  * explicitly broadcast, decimal-exact aggregation (so the DuckDB oracle
  * hash-matches), one shuffle per aggregation.
  */
object Tpch {

  private def dec(c: String, p: Int, s: Int): Column =
    col(c).cast(DecimalType(p, s))

  /** Q1-style pricing summary: filter + single hash aggregate. */
  def q1(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Graft.table(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        dec("l_quantity", 12, 2).as("qty"),
        dec("l_extendedprice", 12, 2).as("px"),
        dec("l_discount", 4, 2).as("disc"),
        dec("l_tax", 4, 2).as("tax"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).as("dq"),
        sum(col("px")).as("dp"),
        sum(col("px") * (lit(1) - col("disc"))).as("ddp"),
        sum(col("px") * (lit(1) - col("disc")) * (lit(1) + col("tax")))
          .as("dc"),
        sum(col("disc")).as("dd"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("dq").cast(DoubleType).as("sum_qty"),
        col("dp").cast(DoubleType).as("sum_base_price"),
        col("ddp").cast(DoubleType).as("sum_disc_price"),
        col("dc").cast(DoubleType).as("sum_charge"),
        (col("dq").cast(DoubleType) / col("count_order").cast(DoubleType))
          .as("avg_qty"),
        (col("dp").cast(DoubleType) / col("count_order").cast(DoubleType))
          .as("avg_price"),
        (col("dd").cast(DoubleType) / col("count_order").cast(DoubleType))
          .as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Pivoted revenue matrix (priority x order year) - the pivot form
    * of a grouped aggregation, with the value list EXPLICIT so
    * Catalyst plans ONE pass (pivot without values runs a distinct
    * scan first to discover them - a second full read a 100 TB input
    * cannot afford). Internally this is a single groupBy with one
    * conditional aggregate per pivot column - exactly the CASE-WHEN
    * formulation the oracle spells out. Catalyst plans it as the
    * standard two-level pivot aggregation: a keyed shuffle on
    * (group, pivot value) with map-side partial agg over the data,
    * then a second exchange whose input is only groups x years rows -
    * negligible at any scale. Money sums stay DECIMAL until the final
    * output cast.
    */
  val pivotYears: Seq[Int] = 1995 to 2001

  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val base = Graft.table(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        year(col("o_orderdate")).as("yr"),
        dec("o_totalprice", 12, 2).as("p"))
    base.groupBy(col("o_orderpriority"))
      .pivot("yr", pivotYears.map(y => y: Any))
      .agg(sum(col("p")))
      .select(col("o_orderpriority") +:
        pivotYears.map(y =>
          col(s"`$y`").cast(DoubleType).as(s"y$y")): _*)
      .orderBy(col("o_orderpriority"))
  }

  val qPivotSql: String = {
    val cells = pivotYears.map(y =>
      s"""CAST(sum(CASE WHEN yr = $y THEN p END) AS DOUBLE) AS y$y""")
    s"""SELECT o_orderpriority,
       |  ${cells.mkString(",\n  ")}
       |FROM (
       |  SELECT o_orderpriority, year(o_orderdate) AS yr,
       |         CAST(o_totalprice AS DECIMAL(12,2)) AS p
       |  FROM orders
       |)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qty) AS DOUBLE) AS sum_qty,
      |  CAST(sum(px) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(px * (1 - disc)) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(px * (1 - disc) * (1 + tax)) AS DOUBLE) AS sum_charge,
      |  CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |  CAST(sum(px) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
      |  CAST(sum(disc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(l_quantity AS DECIMAL(12,2)) AS qty,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS px,
      |         CAST(l_discount AS DECIMAL(4,2)) AS disc,
      |         CAST(l_tax AS DECIMAL(4,2)) AS tax
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3-style shipping priority: broadcast the filtered customer dim,
    * shuffle only the fact-side aggregate, top-10 via TakeOrdered.
    */
  def q3(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-06-01 00:00:00").cast("timestamp")
    val cust = Graft.table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Graft.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Graft.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (dec("l_extendedprice", 12, 2) * (lit(1) - dec("l_discount", 4, 2)))
          .as("rev"))
    li.join(broadcast(ord.join(broadcast(cust),
          col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev")).as("drev"))
      .select(col("l_orderkey"),
        col("drev").cast(DoubleType).as("revenue"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS revenue,
      |  epoch_us(o_orderdate) AS o_orderdate_us
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Q5-style local-supplier volume: the full six-table join with every
    * dimension broadcast so the only shuffle is the final group-by.
    */
  def q5(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Graft.table(spark, sfDir, "region")
      .filter(col("r_name") === "ASIA")
    val nation = Graft.table(spark, sfDir, "nation")
    val cust = Graft.table(spark, sfDir, "customer")
    val supp = Graft.table(spark, sfDir, "supplier")
    val ord = Graft.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
    val li = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (dec("l_extendedprice", 12, 2) * (lit(1) - dec("l_discount", 4, 2)))
          .as("rev"))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("drev"))
      .select(col("n_name"), col("drev").cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window coverage: per-customer order rank by price + running spend
    * over time. One shuffle on custkey serves both window functions.
    */
  def qWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("raw_price").desc, col("o_orderkey"))
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Graft.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("raw_price"),
        dec("o_totalprice", 14, 2).as("price"),
        col("o_orderdate"))
      .withColumn("price_rank", row_number().over(byPrice).cast(LongType))
      .withColumn("running_spend",
        sum(col("price")).over(byTime).cast(DoubleType))
      .filter(col("price_rank") <= 5)
      .select(col("o_custkey"), col("o_orderkey"),
        col("price").cast(DoubleType).as("price"),
        col("price_rank"), col("running_spend"))
      .orderBy(col("o_custkey"), col("price_rank"))
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, CAST(price AS DOUBLE) AS price,
      |       price_rank, running_spend
      |FROM (
      |  SELECT o_custkey, o_orderkey, price,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY raw_price DESC, o_orderkey)
      |      AS price_rank,
      |    CAST(sum(price) OVER (PARTITION BY o_custkey
      |                          ORDER BY o_orderdate, o_orderkey
      |                          ROWS BETWEEN UNBOUNDED PRECEDING
      |                          AND CURRENT ROW) AS DOUBLE)
      |      AS running_spend
      |  FROM (SELECT *, o_totalprice AS raw_price,
      |               CAST(o_totalprice AS DECIMAL(14,2)) AS price
      |        FROM orders)
      |)
      |WHERE price_rank <= 5
      |ORDER BY o_custkey, price_rank""".stripMargin

  /** Salted two-phase aggregation - the skew-mitigation pattern for a
    * hot grouping key (l_returnflag has 3 values over the whole fact
    * table; a naive groupBy funnels everything through 3 reducers).
    * Phase 1 pre-aggregates on (key, salt=orderkey%16) - map-side +
    * 48-way parallel reduce; phase 2 folds the 48 partials. Result is
    * identical to the direct group-by (which is what the oracle runs).
    */
  def qSaltAgg(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        dec("l_quantity", 12, 2).as("qty"),
        (col("l_orderkey") % 16).as("salt"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("qty")).as("pq"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pq")).as("dq"), sum(col("pn")).as("n"))
      .select(col("l_returnflag"),
        col("dq").cast(DoubleType).as("sum_qty"),
        col("n").cast(LongType).as("n"))
      .orderBy(col("l_returnflag"))

  val qSaltAggSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q4 shape (adapted to the synthetic schema): orders in a
    * quarter with at least one returned lineitem, counted per
    * priority. The EXISTS becomes a LEFT SEMI join - the fact table
    * never widens, duplicates never multiply, and the returned-flag
    * filter is pushed to the lineitem scan so the semi join's build
    * side is the small filtered key set.
    */
  def q4SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Graft.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val flagged = Graft.table(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4SemiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Multi-level aggregation via ROLLUP: per (flag, status), per flag,
    * and grand total in one pass - Catalyst expands the grouping sets,
    * still a single shuffle.
    */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        dec("l_quantity", 12, 2).as("qty"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty")).as("dq"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("dq").cast(DoubleType).as("sum_qty"), col("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS with a NON-hierarchical set list — the member of
    * the multi-granularity family rollup/cube can't express (rollup =
    * prefix chain, cube = powerset; this skips (l_returnflag) on
    * purpose). Same single-scan expansion: the optimizer plans one
    * Expand over the scan, one aggregation — never one scan per set.
    */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        dec("l_quantity", 12, 2).as("qty"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty")).as("dq"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("dq").cast(DoubleType).as("sum_qty"), col("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE: all 2^k grouping sets in one pass - Spark's Expand emits one
    * replicated row per grouping set ahead of a single keyed
    * aggregation (k small by definition, so the 4x row amplification
    * is the known, bounded cost; no per-set rescan of the fact table).
    */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        dec("l_quantity", 12, 2).as("qty"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty")).as("dq"), count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("dq").cast(DoubleType).as("sum_qty"), col("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Exact + percentile statistics per group: countDistinct (Spark's
    * expand + two-phase distinct aggregation) and interpolated median /
    * quartiles (DuckDB quantile_cont ≙ Spark percentile). Quantiles of
    * 2-decimal quantities interpolate exactly in both engines.
    */
  def qStatsAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Graft.table(spark, sfDir, "lineitem")
    // Exact percentiles over PRE-AGGREGATED (value, frequency) pairs:
    // l_quantity is low-cardinality, so the partial-agg-friendly
    // count-by-value pass shrinks the percentile input from the fact
    // table to ~50 rows per group - the exact result, none of the
    // full-column aggregation state.
    val qtyFreq = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("freq"))
    val pct = qtyFreq.groupBy(col("l_returnflag"))
      .agg(expr(
        "percentile(l_quantity, array(0.25D, 0.5D, 0.75D), freq)")
        .as("qs"))
    val distincts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    distincts.join(pct, "l_returnflag")
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"),
        element_at(col("qs"), 2).as("q50"),
        element_at(col("qs"), 1).as("q25"),
        element_at(col("qs"), 3).as("q75"))
      .orderBy(col("l_returnflag"))
  }

  val qStatsAggSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.75) AS q75
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Generic column profiler - the data-quality pass a pipeline runs
    * before training: per column, null count, distinct count, min/max
    * (as strings for type-generality). One pass per column batched into
    * a single aggregate row, then unpivoted; no collect.
    */
  /** Long-form profiling: explode each row into (column_name, value)
    * entries and aggregate per column. One distinct aggregate per
    * group, so the plan is the two-phase partial-distinct - N
    * countDistinct over one wide aggregate would Expand every row
    * ×(N+1) through the shuffle instead. String casts are
    * shortest-roundtrip, so distinct counts equal the raw columns'.
    */
  def profile(df: org.apache.spark.sql.DataFrame,
              columns: Seq[String]): DataFrame = {
    val entries = columns.map { c =>
      struct(lit(c).as("column_name"), col(c).cast("string").as("v"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name").as("column_name"), col("e.v").as("v"))
      .groupBy(col("column_name"))
      .agg(sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_val"), max(col("v")).as("max_val"))
      .orderBy(col("column_name"))
  }

  def qProfile(spark: SparkSession, sfDir: String): DataFrame =
    profile(Graft.table(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))

  val qProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val branches = cols.map { c =>
      s"""  SELECT '$c' AS column_name,
         |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_nulls,
         |    CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |    min(CAST($c AS VARCHAR)) AS min_val,
         |    max(CAST($c AS VARCHAR)) AS max_val
         |  FROM orders""".stripMargin
    }
    s"""WITH p AS (
       |${branches.mkString("\n  UNION ALL\n")}
       |)
       |SELECT * FROM p ORDER BY column_name""".stripMargin
  }

  /** Sessionization: 30-minute-gap sessions per user via lag + running
    * flag sum - the standard single-shuffle formulation (partition by
    * user, in-partition sort by time).
    */
  val sessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Session rows from any (user_id, event_id, t µs) relation - the
    * lag/gap core, shared by the batch face and the per-batch fragment
    * builder of the incremental session store.
    */
  private[graft] def sessionFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    ev
      .withColumn("new_sess",
        when(col("t") - lag(col("t"), 1).over(w) > sessionGapUs ||
          lag(col("t"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t")).as("start_t"), max(col("t")).as("end_t"))
  }

  def qSessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionFrom(Graft.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("graft_ts_us(ts)").as("t")))
      .orderBy(col("user_id"), col("session_id"))

  val qSessionizeSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
      |), flags AS (
      |  SELECT user_id, event_id, t,
      |    CASE WHEN t - lag(t) OVER w > 1800000000
      |           OR lag(t) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
      |), sess AS (
      |  SELECT user_id, event_id, t,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id
      |                             ORDER BY t, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING
      |                             AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flags
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(t) AS start_t, max(t) AS end_t
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Tile width for the interval-overlap self-join (1 hour in µs). */
  val overlapBinUs: Long = 3600L * 1000 * 1000

  /** Per-session CONCURRENCY via an interval-overlap SELF-JOIN — how
    * many other sessions (any user) were active at some point during
    * each session: the load/contention signal behind capacity reports
    * and "was the site busy" features, and the canonical interval×
    * interval join Spark has no native operator for (q_range_join is
    * the point-in-interval case).
    *
    * 100 TB shape: the BIN-TILING plan (the technique behind every
    * production range-join optimizer): each session explodes to its
    * covered 1-hour tiles (spans are gap-bounded, so the fan-out is
    * small and data-independent-ish; the tile width is the operational
    * knob), the self-join keys on the TILE — an equi-join shuffle
    * whose per-key volume is bounded by peak concurrency, never |S|²
    * — the exact overlap predicate filters inside each tile, and a
    * pair sharing several tiles is counted EXACTLY ONCE by the
    * ownership rule: only the tile containing max(start₁, start₂)
    * (the first tile where both are alive) scores it. The oracle
    * replays the plain quadratic inequality join (DuckDB's IEJoin) —
    * same relation, no tiles — so the tiling's exactness is what the
    * gate certifies.
    */
  def qSessionOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    graft.core.Graft.ensureConf(spark)
    overlapFrom(sessionFrom(Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"),
          expr("graft_ts_us(ts)").as("t")))
      .select(col("user_id"), col("session_id"),
        col("start_t"), col("end_t")))
  }

  /** The overlap count over any (user_id, session_id, start_t, end_t)
    * session relation — shared by the batch face and the streaming
    * face's snapshot view.
    *
    * Interval-stabbing identity, pair-free: two intervals overlap iff
    * NOT (other.start > my.end OR other.end < my.start) — and the two
    * disjuncts are disjoint (start ≤ end), so
    *   n_overlap(s) = F_start≤(end_s) − F_end<(start_s) − 1
    * (N total sessions cancel; −1 removes s itself; same-user
    * sessions are >30-min-gap disjoint by construction, so no other
    * self-exclusion exists to replicate). Both cumulatives ride ONE
    * axis-tagged range-shuffle prefix sum: axis 0 anchors every
    * session start (cc 1) and queries at end_s AFTER anchors at the
    * same v (kind 1 — the ≤); axis 1 anchors every end and queries at
    * start_s BEFORE anchors at the same v (kind 0 — the strict <).
    * Tied query rows carry cc 0, so their exclusive prefixes agree
    * regardless of tie order. The tiled bin self-join this replaces
    * materialized every overlapping PAIR (quadratic in session
    * density at a fixed time span — the q_range_join argument); here
    * output volume is sessions-sized and nothing fans past 4 rows per
    * session.
    */
  private[graft] def overlapFrom(sessions: DataFrame): DataFrame = {
    val tagged = sessions.select(explode(expr(
        """array(
          |  named_struct('axis', 0, 'v', start_t, 'kind', 0,
          |    'cc', CAST(1 AS BIGINT),
          |    'qu', CAST(NULL AS BIGINT), 'qs', CAST(NULL AS BIGINT)),
          |  named_struct('axis', 0, 'v', end_t, 'kind', 1,
          |    'cc', CAST(0 AS BIGINT), 'qu', user_id, 'qs', session_id),
          |  named_struct('axis', 1, 'v', end_t, 'kind', 1,
          |    'cc', CAST(1 AS BIGINT),
          |    'qu', CAST(NULL AS BIGINT), 'qs', CAST(NULL AS BIGINT)),
          |  named_struct('axis', 1, 'v', start_t, 'kind', 0,
          |    'cc', CAST(0 AS BIGINT), 'qu', user_id, 'qs', session_id))"""
          .stripMargin)).as("r"))
      .select(col("r.axis").as("axis"), col("r.v").as("v"),
        col("r.kind").as("kind"), col("r.cc").as("cc"),
        col("r.qu").as("qu"), col("r.qs").as("qs"))
    val (pf, grand) = graft.core.GlobalRank.withPrefixSum(
      tagged, Seq(col("axis").asc, col("v").asc, col("kind").asc),
      "cc", "f")
    // the tagged prefix runs ACROSS axes (axis leading), so every
    // axis-1 prefix carries axis 0's whole anchor mass N on top of
    // F_end<; each axis anchors every session once, so grand = 2N and
    // n = f0 − (f1 − N) − 1
    val nSessions = grand / 2
    val fStartLeEnd = pf.filter(col("axis") === 0 && col("kind") === 1)
      .select(col("qu").as("user_id"), col("qs").as("session_id"),
        col("f").as("f0"))
    val fEndLtStart = pf.filter(col("axis") === 1 && col("kind") === 0)
      .select(col("qu").as("user_id"), col("qs").as("session_id"),
        col("f").as("f1"))
    fStartLeEnd.join(fEndLtStart, Seq("user_id", "session_id"))
      .select(col("user_id"), col("session_id"),
        (col("f0") - col("f1") + lit(nSessions) - 1L).as("n_overlap"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionOverlapSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
      |), flags AS (
      |  SELECT user_id, event_id, t,
      |    CASE WHEN t - lag(t) OVER w > 1800000000
      |           OR lag(t) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
      |), sess AS (
      |  SELECT user_id, event_id, t,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id
      |                             ORDER BY t, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING
      |                             AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flags
      |), sr AS MATERIALIZED (
      |  SELECT user_id, session_id, min(t) AS start_t, max(t) AS end_t
      |  FROM sess GROUP BY user_id, session_id
      |), ov AS (
      |  SELECT a.user_id, a.session_id, CAST(count(*) AS BIGINT) AS n
      |  FROM sr a JOIN sr b
      |    ON a.start_t <= b.end_t AND b.start_t <= a.end_t
      |   AND NOT (a.user_id = b.user_id AND a.session_id = b.session_id)
      |  GROUP BY 1, 2
      |)
      |SELECT s.user_id, s.session_id,
      |       coalesce(o.n, 0) AS n_overlap
      |FROM sr s LEFT JOIN ov o
      |  ON s.user_id = o.user_id AND s.session_id = o.session_id
      |ORDER BY s.user_id, s.session_id""".stripMargin

  /** Per-group Pearson correlation + population covariance between
    * quantity and price, computed from EXACT sums: both columns are
    * integral in cents/units, so n, Σx, Σy, Σxy, Σx², Σy² accumulate
    * exactly (Spark DECIMAL(38,0) / DuckDB HUGEINT - no float
    * summation order anywhere), and only then does each engine cast
    * the identical exact sums to double and run the identical closed
    * formula - bitwise-comparable where a native corr() (running
    * float state, order-dependent) never could be. One map-side
    * combinable aggregation; 100 TB cost = one keyed shuffle of six
    * numbers per group.
    */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(l_quantity AS DECIMAL(10,0))").as("x"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS DECIMAL(18,0))")
          .as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        graft.pipeline.ParityMath.q6(expr(
          """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
            .stripMargin)).as("corr_qty_price"),
        graft.pipeline.ParityMath.q6(expr(
          """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 100.0)"""
            .stripMargin)).as("covar_pop"))
      .orderBy(col("l_returnflag"))
  }

  val qCorrSql: String =
    s"""WITH b AS (
       |  SELECT l_returnflag,
       |    CAST(l_quantity AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
       |  FROM lineitem
       |), s AS (
       |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
       |    sum(x * x) AS sxx, sum(y * y) AS syy
       |  FROM b GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, n,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin)} AS corr_qty_price,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 100.0)"""
              .stripMargin)} AS covar_pop
       |FROM s ORDER BY l_returnflag""".stripMargin

  // ---- q_spearman: rank correlation ------------------------------------

  /** SPEARMAN rank correlation between quantity and price — the
    * robust companion to q_corr's Pearson (a handful of price
    * outliers can drag Pearson anywhere; the rank statistic moves
    * only as far as the outliers' ranks): Pearson over tie-averaged
    * ranks, computed EXACTLY. Ties make average ranks half-integral,
    * so both axes carry DOUBLED ranks (2·lo + c + 1 per value group —
    * an integer; doubling both axes cancels in the correlation), the
    * exclusive below-counts come from `GlobalRank.withPrefixSum`
    * (range-shuffle cumulative, never a single-task global window),
    * and n/Σrx/Σry/Σrxry/Σrx²/Σry² accumulate in DECIMAL(38,0) ≙
    * HUGEINT before ONE closed-formula double chain under q6 (the
    * q_corr discipline on the rank axis). NULL when either axis is
    * constant (zero rank variance).
    *
    * 100 TB shape: the corpus collapses to the (x, y) PAIR-COUNT
    * relation (map-combinable, and the ADDITIVE storable fact of the
    * stream/store faces); per-axis value counts fold from it; the
    * rank join-back runs pair-relation-sized, never row-sized.
    */
  def qSpearman(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    spearmanFromPairCounts(Graft.table(spark, sfDir, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("k")))
  }

  /** The statistic over any (x, y, k) pair-count relation — shared by
    * all three faces.
    */
  private[graft] def spearmanFromPairCounts(pc0: DataFrame): DataFrame = {
    val pc = pc0.localCheckpoint()
    // BOTH axes' value counts ride ONE axis-tagged range shuffle
    // (axis-leading order, the `longAxisRanks` argument): per axis the
    // exclusive prefix is the tagged prefix minus the axes landed
    // before it — axis 0 contributes exactly nTot to every axis-1
    // prefix, and each axis's counts sum to nTot, so grand = 2·nTot.
    // Chaining `withPrefixSum` per axis paid the RangePartitioner
    // sampling pass + size pass + shuffle twice for the same math.
    val vc = pc.select(explode(array(
        struct(lit(0).as("axis"), col("x").as("v"), col("k")),
        struct(lit(1).as("axis"), col("y").as("v"), col("k")))).as("t"))
      .select(col("t.axis").as("axis"), col("t.v").as("v"),
        col("t.k").as("k"))
      .groupBy(col("axis"), col("v")).agg(sum(col("k")).as("c"))
    val (pf, grand) = graft.core.GlobalRank.withPrefixSum(
      vc, Seq(col("axis").asc, col("v").asc), "c", "lo0")
    val nTot = grand / 2
    // Loud headroom (the qBetweenness require discipline): doubled
    // ranks reach 2n+1 and the triple products k*rx*ry accumulate
    // in DECIMAL(38,0), so n*(2n+1)^2 < 1e38 caps n at ~2.9e12 -
    // comfortably above the 6e11-row 100 TB design point, and the
    // DECIMAL(14,0) rank casts below hold to n < 5e13. Beyond the
    // bound, non-ANSI decimal overflow nulls silently while the
    // DuckDB HUGEINT oracle keeps computing; fail loudly instead.
    require(nTot <= 2900000000000L,
      s"spearman: n=$nTot exceeds the 2.9e12 DECIMAL(38,0) bound")
    val ranks = pf.select(col("axis"), col("v"),
      (lit(2L) * (col("lo0") - col("axis") * lit(nTot)) +
        col("c") + 1L).as("r2"))
    def axisRanks(a: Int, cn: String): DataFrame =
      ranks.filter(col("axis") === a)
        .select(col("v").as(cn), col("r2").as(s"r2_$cn"))
    val d14 = "decimal(14,0)"
    pc.join(axisRanks(0, "x"), "x").join(axisRanks(1, "y"), "y")
      .select(col("k").cast(d14).as("k"),
        col("r2_x").cast(d14).as("rx"), col("r2_y").cast(d14).as("ry"))
      .agg(coalesce(sum(col("k")), lit(0L).cast(d14)).as("n"),
        sum(col("k") * col("rx")).as("sx"),
        sum(col("k") * col("ry")).as("sy"),
        sum(col("k") * (col("rx") * col("ry"))).as("sxy"),
        sum(col("k") * (col("rx") * col("rx"))).as("sxx"),
        sum(col("k") * (col("ry") * col("ry"))).as("syy"))
      .select(col("n").cast("long").as("n"),
        when(expr(
          """CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            |AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            |  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0"""
            .stripMargin),
          graft.pipeline.ParityMath.q6(expr(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin))).as("spearman"))
  }

  val qSpearmanSql: String =
    s"""WITH b AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
       |  FROM lineitem
       |), pc AS MATERIALIZED (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS k FROM b GROUP BY 1, 2
       |), xr AS (
       |  SELECT x, CAST(2 * coalesce(sum(c) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2_x
       |  FROM (SELECT x, sum(k) AS c FROM pc GROUP BY 1)
       |), yr AS (
       |  SELECT y, CAST(2 * coalesce(sum(c) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2_y
       |  FROM (SELECT y, sum(k) AS c FROM pc GROUP BY 1)
       |), j AS (
       |  SELECT CAST(pc.k AS HUGEINT) AS k,
       |    CAST(xr.r2_x AS HUGEINT) AS rx,
       |    CAST(yr.r2_y AS HUGEINT) AS ry
       |  FROM pc JOIN xr USING (x) JOIN yr USING (y)
       |), s AS (
       |  SELECT coalesce(sum(k), 0) AS n,
       |    sum(k * rx) AS sx, sum(k * ry) AS sy,
       |    sum(k * (rx * ry)) AS sxy,
       |    sum(k * (rx * rx)) AS sxx,
       |    sum(k * (ry * ry)) AS syy
       |  FROM j
       |)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
       |   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin)}
       |  END AS spearman
       |FROM s""".stripMargin

  // ---- q_corr_events / q_spearman_events: the correlation pair on ----
  // the events axis (the family's generator-anchored twins)

  /** Shared axes of both events twins: x = micro-quantized value,
    * y = second-of-day — "does the metric carry a time-of-day
    * effect", the monitoring question the pair answers (Pearson reads
    * the linear component, Spearman the monotone one). Second-of-day
    * uses the sign-safe fdiv/pmod pair, so the pre-1970 proof corpus
    * lands in [0, 86400) identically on both engines.
    */
  private def eventsXY(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("x"),
        expr(s"pmod(${graft.pipeline.ParityMath
          .fdivSql("graft_ts_us(ts)", "1000000")}, 86400)").as("y"),
        col("event_type").as("et"))

  private val eventsXYDuck: String =
    s"""SELECT CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS x,
       |    ((${graft.pipeline.ParityMath
             .fdivDuckSql("epoch_us(ts)", "1000000")} % 86400)
       |     + 86400) % 86400 AS y,
       |    event_type AS et
       |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL""".stripMargin

  /** PEARSON value↔time-of-day correlation per event type over the
    * events table — q_corr's moment fold on the axis that actually
    * scales in the generator anchor (lineitem does not; r15 verdict
    * #6). Same one-pass map-combinable moment shape, but the micro-
    * quantized x axis makes Σk·x² reach ~3·10¹⁷·n, so the moments
    * accumulate in DECIMAL(38,0) ≙ HUGEINT (headroom to n ~ 10²⁰ —
    * structurally unreachable) instead of q_corr's BIGINT, and the
    * closed formula is ONE pinned double chain under q6, identical
    * text both engines.
    *
    * 100 TB shape: one map-combinable six-moment agg keyed by the
    * handful of event types; nothing else exists.
    */
  def qCorrEvents(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val d20 = "decimal(20,0)"
    val d38 = "decimal(38,0)"
    eventsXY(spark, sfDir)
      .filter(col("et").isNotNull)
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d20)).cast(d38).as("sx"),
        sum(col("y").cast(d20)).cast(d38).as("sy"),
        sum((col("x").cast(d20) * col("y").cast(d20)).cast(d38))
          .cast(d38).as("sxy"),
        sum((col("x").cast(d20) * col("x").cast(d20)).cast(d38))
          .cast(d38).as("sxx"),
        sum((col("y").cast(d20) * col("y").cast(d20)).cast(d38))
          .cast(d38).as("syy"))
      .select(col("et"), col("n"),
        when(expr(
          """CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
            |AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            |  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0"""
            .stripMargin),
          graft.pipeline.ParityMath.q6(expr(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin))).as("corr_value_tod"))
      .orderBy(col("et"))
  }

  val qCorrEventsSql: String =
    s"""WITH b AS (
       |  $eventsXYDuck
       |), s AS (
       |  SELECT et, CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(y AS HUGEINT) * y) AS syy
       |  FROM b WHERE et IS NOT NULL GROUP BY et
       |)
       |SELECT et, n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
       |   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin)}
       |  END AS corr_value_tod
       |FROM s ORDER BY et""".stripMargin

  /** SPEARMAN value↔time-of-day over events — the SAME
    * `spearmanFromPairCounts` fold as q_spearman (one landed fact,
    * two corpora), here on the axis the generator anchor scales, so
    * the `withPrefixSums` rank machinery carries a measured 10×
    * slope (r15 verdict #6: q_spearman/q_corr were the only
    * rank/moment statistics without one). The pair-count relation is
    * ~corpus-sized on the micro-quantized axis — the honest worst
    * case for the rank join-back.
    */
  def qSpearmanEvents(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    spearmanFromPairCounts(eventsXY(spark, sfDir)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("k")))
  }

  val qSpearmanEventsSql: String =
    s"""WITH b AS (
       |  $eventsXYDuck
       |), pc AS MATERIALIZED (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS k FROM b GROUP BY 1, 2
       |), xr AS (
       |  SELECT x, CAST(2 * coalesce(sum(c) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2_x
       |  FROM (SELECT x, sum(k) AS c FROM pc GROUP BY 1)
       |), yr AS (
       |  SELECT y, CAST(2 * coalesce(sum(c) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      + c + 1 AS BIGINT) AS r2_y
       |  FROM (SELECT y, sum(k) AS c FROM pc GROUP BY 1)
       |), j AS (
       |  SELECT CAST(pc.k AS HUGEINT) AS k,
       |    CAST(xr.r2_x AS HUGEINT) AS rx,
       |    CAST(yr.r2_y AS HUGEINT) AS ry
       |  FROM pc JOIN xr USING (x) JOIN yr USING (y)
       |), s AS (
       |  SELECT coalesce(sum(k), 0) AS n,
       |    sum(k * rx) AS sx, sum(k * ry) AS sy,
       |    sum(k * (rx * ry)) AS sxy,
       |    sum(k * (rx * rx)) AS sxx,
       |    sum(k * (ry * ry)) AS syy
       |  FROM j
       |)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
       |   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(
            """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
              .stripMargin)}
       |  END AS spearman
       |FROM s""".stripMargin

  // ---- q_gini: activity-concentration coefficient ---------------------

  /** GINI coefficient of per-user event counts — the concentration
    * diagnostic behind every "do 1% of users generate 90% of events?"
    * question (bot/abuse triage, sampling design, load-model sanity):
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the counts sorted
    * ascending with user_id tie-break (a total order, so the rank —
    * and therefore the statistic — is deterministic on both engines).
    * The global sort is the classical scale trap; this uses
    * `GlobalRank.withRank`'s range-shuffle rank (every partition ranks
    * its own slice against broadcast offsets — no single-task window),
    * then Σ rank·x accumulates exactly in DECIMAL(38,0) ≙ HUGEINT and
    * the closed formula runs once over three exact numbers under q6.
    * 100 TB cost: one user-keyed count + one range exchange of the
    * users-sized relation.
    */
  def qGini(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    giniFromCounts(Graft.table(spark, sfDir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x")))
  }

  /** The Gini view over any (user_id, x) count relation — shared by
    * the batch face and the streaming face (whose Complete-mode state
    * is exactly this relation): the statistic needs the GLOBAL sorted
    * order, so it can only ever be a query-time view, never
    * incremental state.
    */
  private[graft] def giniFromCounts(counts: DataFrame): DataFrame = {
    val (ranked, n) = graft.core.GlobalRank.withRank(
      counts, Seq(col("x").asc, col("user_id").asc), "rk")
    ranked
      .select(col("x").cast("decimal(18,0)").as("x"),
        col("rk").cast("decimal(18,0)").as("rk"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("rk")).as("sxr"))
      .select(lit(n).as("n_users"),
        col("sx").cast("long").as("total_events"),
        graft.pipeline.ParityMath.q6(expr(
          s"""2.0 * CAST(sxr AS DOUBLE)
             |  / (CAST($n AS DOUBLE) * CAST(sx AS DOUBLE))
             |  - (CAST($n AS DOUBLE) + 1.0) / CAST($n AS DOUBLE)"""
            .stripMargin)).as("gini"))
  }

  val qGiniSql: String =
    s"""WITH c AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
       |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
       |), r AS (
       |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk FROM c
       |), s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(x AS HUGEINT)) AS sx,
       |         sum(CAST(x AS HUGEINT) * rk) AS sxr
       |  FROM r
       |)
       |SELECT n AS n_users, CAST(sx AS BIGINT) AS total_events,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """2.0 * CAST(sxr AS DOUBLE)
              |  / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
              |  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)"""
              .stripMargin)} AS gini
       |FROM s""".stripMargin

  // ---- q_trimmed_mean: robust location per event type ------------------

  /** 10%-TRIMMED MEAN of `value` per event type — the robust location
    * member next to q_mad's robust dispersion (an outlier that moves
    * the plain mean arbitrarily moves this one not at all once it
    * falls in the trimmed tail): per type, drop the k = n DIV 10
    * smallest and largest observations under the total
    * (value, event_id) order, then average the rest. ENTIRELY integer
    * (values in micro-units at ingest, truncating-division means —
    * on NON-NEGATIVE sums, where Spark DIV ≡ DuckDB //; a deployment
    * with signed values must pin floor semantics on both sides) — no
    * float ever, both engines bitwise by construction; the plain
    * mean rides along so the reader sees what the trim removed.
    *
    * 100 TB shape: one type-keyed exchange + sort (the window), a
    * rank filter, one map-combinable agg — the q_ewma plan shape with
    * a trim instead of a frame.
    */
  def qTrimmedMean(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("v_mu"), col("event_id"))
    Graft.table(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v_mu"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("k", expr("n DIV 10"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("k")).as("n_trim_each"),
        sum(col("v_mu")).as("s_all"),
        sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
          col("v_mu")).otherwise(0L)).as("s_kept"),
        sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
          1L).otherwise(0L)).as("n_kept"))
      .select(col("event_type"), col("n"), col("n_trim_each"),
        col("n_kept"),
        expr("s_all DIV n").as("mean_mu"),
        when(col("n_kept") > 0, expr("s_kept DIV n_kept"))
          .as("trimmed_mean_mu"))
      .orderBy(col("event_type"))
  }

  val qTrimmedMeanSql: String =
    s"""WITH v AS (
       |  SELECT event_type, event_id,
       |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_mu
       |  FROM events
       |  WHERE event_type IS NOT NULL AND value IS NOT NULL
       |), r AS (
       |  SELECT event_type, v_mu,
       |    row_number() OVER (PARTITION BY event_type
       |                       ORDER BY v_mu, event_id) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM v
       |), a AS (
       |  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       |    CAST(max(n // 10) AS BIGINT) AS n_trim_each,
       |    CAST(coalesce(sum(CASE WHEN rk > n // 10
       |      AND rk <= n - n // 10 THEN 1 ELSE 0 END), 0) AS BIGINT)
       |      AS n_kept,
       |    CAST(sum(v_mu) AS BIGINT) AS s_all,
       |    CAST(coalesce(sum(CASE WHEN rk > n // 10
       |      AND rk <= n - n // 10 THEN v_mu ELSE 0 END), 0) AS BIGINT)
       |      AS s_kept
       |  FROM r GROUP BY 1
       |)
       |SELECT event_type, n, n_trim_each, n_kept,
       |  CAST(s_all // n AS BIGINT) AS mean_mu,
       |  CASE WHEN n_kept > 0
       |  THEN CAST(s_kept // n_kept AS BIGINT) END AS trimmed_mean_mu
       |FROM a ORDER BY event_type""".stripMargin

  /** The trimmed-mean report over any (event_type, v_mu, c)
    * VALUE-COUNT relation — the stream/store faces' storable fact
    * (counts are additive under any batch split). Equivalent to the
    * batch face's rank filter because ties at a trim boundary carry
    * EQUAL v_mu: a value group occupies the contiguous rank range
    * (lo, hi], its kept mass is the overlap with (k, n−k], and the
    * kept SUM is v_mu × overlap regardless of which tied rows the
    * row-level rank would have trimmed. Same truncating-division
    * means as the batch face (shared oracle; the non-negative-sums
    * contract documented there applies here identically).
    */
  private[graft] def trimmedFromValueCounts(vc: DataFrame): DataFrame = {
    val wcum = Window.partitionBy(col("event_type"))
      .orderBy(col("v_mu"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vc.withColumn("hi", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("k", expr("n DIV 10"))
      .withColumn("kept", greatest(lit(0L),
        least(col("hi"), col("n") - col("k")) -
          greatest(col("lo"), col("k"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("k")).as("n_trim_each"),
        sum(col("kept")).as("n_kept"),
        sum(col("v_mu") * col("c")).as("s_all"),
        sum(col("v_mu") * col("kept")).as("s_kept"))
      .select(col("event_type"), col("n"), col("n_trim_each"),
        col("n_kept"),
        expr("s_all DIV n").as("mean_mu"),
        when(col("n_kept") > 0, expr("s_kept DIV n_kept"))
          .as("trimmed_mean_mu"))
      .orderBy(col("event_type"))
  }

  // ---- q_lorenz: decile concentration curve ---------------------------

  /** LORENZ CURVE of per-user activity in deciles — the curve behind
    * q_gini's one number (gini = 1 − 2·area under this curve): decile
    * d of users (ranked ascending by count, ties to the smaller id —
    * the gini order exactly) holds cum_share of all events. The
    * curve every "top 10% of sources produce X% of tokens"
    * concentration claim reads from.
    *
    * Determinism: the decile assignment ((rk−1)·10 DIV n + 1) and all
    * counts are exact integers on the same GlobalRank order as gini;
    * cum_share is one pinned division per decile row, q6.
    *
    * 100 TB shape: one map-combinable per-user count, GlobalRank's
    * range-shuffle rank (never a single-task global window), one
    * 10-row agg — the running sum lives on the decile relation.
    */
  def qLorenz(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    lorenzFromCounts(Graft.table(spark, sfDir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x")))
  }

  /** The curve over any (user_id, x) count relation — shared with the
    * gini faces' state (one arriving event re-ranks globally: query-
    * time view only).
    */
  private[graft] def lorenzFromCounts(counts: DataFrame): DataFrame = {
    val (ranked, n) = graft.core.GlobalRank.withRank(
      counts, Seq(col("x").asc, col("user_id").asc), "rk")
    if (n == 0)
      return counts.sparkSession.range(0).select(
        col("id").as("decile"), col("id").as("n_users"),
        col("id").as("n_events"), col("id").as("cum_events"),
        lit(0.0).as("cum_share"))
    val tot = ranked.agg(coalesce(sum(col("x")), lit(0L)).as("tot"))
    val dec = ranked
      .select(expr(s"((rk - 1) * 10) DIV ${n}L + 1").as("decile"),
        col("x"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    dec.withColumn("cum_events", sum(col("n_events")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_users"), col("n_events"),
        col("cum_events"),
        when(col("tot") > 0, graft.pipeline.ParityMath.q6(
          col("cum_events").cast("double") / col("tot").cast("double")))
          .as("cum_share"))
      .orderBy(col("decile"))
  }

  val qLorenzSql: String =
    s"""WITH c AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS x
       |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
       |), r AS (
       |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk,
       |         count(*) OVER () AS n
       |  FROM c
       |), tot AS (SELECT CAST(coalesce(sum(x), 0) AS BIGINT) AS tot
       |           FROM c),
       |dec AS (
       |  SELECT CAST((rk - 1) * 10 // n + 1 AS BIGINT) AS decile,
       |         CAST(count(*) AS BIGINT) AS n_users,
       |         CAST(sum(x) AS BIGINT) AS n_events
       |  FROM r GROUP BY 1
       |), cum AS (
       |  SELECT decile, n_users, n_events,
       |    CAST(sum(n_events) OVER (ORDER BY decile
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum_events
       |  FROM dec
       |)
       |SELECT decile, n_users, n_events, cum_events,
       |  CASE WHEN tot > 0 THEN ${graft.pipeline.ParityMath.q6Sql(
            "CAST(cum_events AS DOUBLE) / CAST(tot AS DOUBLE)")}
       |  END AS cum_share
       |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin

  // ---- q_histogram: fixed-width price histogram + exact CDF ----------

  /** Bucket width for the extended-price histogram. */
  val histWidth: Double = 5000.0

  /** Fixed-width histogram of `l_extendedprice` with the exact
    * cumulative distribution — the data-profiling primitive q_profile's
    * min/max/avg summary can't give (where the mass actually sits),
    * and the exact counterpart the q_qtile_sketch family is an
    * approximation of.
    *
    * Bucketing is `floor(price / width)`: one IEEE divide + floor,
    * identical cross-engine (prices are 2-decimal values exactly
    * representable in doubles). The CDF is a running sum over the
    * bucket matrix, q6-quantized for the fraction.
    *
    * 100 TB shape: one lineitem scan reading ONE column, collapsed by
    * a map-combinable ~21-cell aggregation; the cumulative window and
    * the total run over the TINY bucket matrix. The shuffle carries
    * buckets-per-partition rows, nothing else.
    */
  def qHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    histogramFromCells(histogramCells(
      Graft.table(spark, sfDir, "lineitem")))
  }

  /** The bucket-count aggregation — shared by the batch and streaming
    * faces so the floor-divide bucket math cannot drift.
    */
  private[graft] def histogramCells(lineitem: DataFrame): DataFrame =
    lineitem
      .select(expr(s"CAST(floor(l_extendedprice / $histWidth) AS BIGINT)")
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_items"))

  /** The CDF view over any (bucket, n_items) matrix — the streaming
    * face's state IS this ADDITIVE bucket matrix; the cumulative sum
    * and total are query-time views because one arriving row shifts
    * every later bucket's CDF. (The windows run over the ~21-cell
    * matrix — bounded by the price range, not the data.)
    */
  private[graft] def histogramFromCells(cells: DataFrame): DataFrame = {
    val wcum = Window.partitionBy().orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_items", sum(col("n_items")).over(wcum))
      .withColumn("total", sum(col("n_items")).over(Window.partitionBy()))
      .select(col("bucket"),
        (col("bucket").cast(DoubleType) * lit(histWidth)).as("lo"),
        col("n_items"), col("cum_items"),
        graft.pipeline.ParityMath.q6(
          col("cum_items").cast("double") / col("total").cast("double"))
          .as("cdf"))
      .orderBy(col("bucket"))
  }

  val qHistogramSql: String =
    s"""WITH b AS (
       |  SELECT CAST(floor(l_extendedprice / $histWidth) AS BIGINT)
       |    AS bucket
       |  FROM lineitem
       |), c AS (
       |  SELECT bucket, count(*) AS n_items FROM b GROUP BY 1
       |), w AS (
       |  SELECT bucket, n_items,
       |    sum(n_items) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS cum_items,
       |    sum(n_items) OVER () AS total
       |  FROM c
       |)
       |SELECT bucket, CAST(bucket AS DOUBLE) * $histWidth AS lo,
       |  CAST(n_items AS BIGINT) AS n_items,
       |  CAST(cum_items AS BIGINT) AS cum_items,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(cum_items AS DOUBLE) / CAST(total AS DOUBLE)")} AS cdf
       |FROM w ORDER BY bucket""".stripMargin

  // ---- q_benford: first-significant-digit diagnostic -------------------

  /** Benford expected frequencies log10(1 + 1/d), computed ONCE in
    * Scala and injected as plan-time literals into BOTH engines (the
    * LSH-hyperplane discipline: no cross-engine libm log in the
    * dataflow; Double.toString round-trips, so DuckDB parses the
    * identical double).
    */
  private val benfordExpected: Seq[(Long, Double)] =
    (1 to 9).map(d => d.toLong -> math.log10(1.0 + 1.0 / d))

  /** First-significant-digit distribution of event values vs Benford's
    * law - the classic fabrication/quality screen over any monetary or
    * magnitude column. Exact digit extraction: 2-decimal values are
    * exact in doubles (the q_histogram argument), so cents =
    * floor(v·100 + 0.5) is an exact BIGINT and the first digit is its
    * leading DECIMAL-STRING character - identical in both engines, no
    * log10 in the dataflow. One scan into a 9-cell map-combinable agg;
    * the per-digit chi-square contribution ((n − N·e)² / (N·e), q6) is
    * the screen's test statistic, summable by the reader.
    */
  def qBenford(spark: SparkSession, sfDir: String): DataFrame =
    benfordFromCounts(
      benfordDigits(Graft.table(spark, sfDir, "events"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n")))

  /** The per-event leading digit - the ADDITIVE fact the stream and
    * store faces accumulate (digit counts merge by plain sum under
    * any batch split).
    */
  private[graft] def benfordDigits(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull && col("value") > 0.0)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0L)
      .select(expr(
        "CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))

  /** Frequencies + chi-square from any (digit, n) count relation -
    * shared by the batch, stream and store faces.
    */
  private[graft] def benfordFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val tot = counts.agg(sum(col("n")).as("total"))
    val exp = benfordExpected.toDF("digit", "expected")
    exp.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        col("expected"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        graft.pipeline.ParityMath.q6(
          col("n").cast(DoubleType) / col("total").cast(DoubleType))
          .as("obs_freq"),
        graft.pipeline.ParityMath.q6(col("expected")).as("exp_freq"),
        graft.pipeline.ParityMath.q6(
          (col("n").cast(DoubleType)
            - col("total").cast(DoubleType) * col("expected"))
          * (col("n").cast(DoubleType)
            - col("total").cast(DoubleType) * col("expected"))
          / (col("total").cast(DoubleType) * col("expected"))).as("chi"))
      .orderBy(col("digit"))
  }

  lazy val qBenfordSql: String = {
    val vals = benfordExpected
      .map { case (d, e) => s"($d, $e)" }.mkString(", ")
    s"""WITH cents AS (
       |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
       |  FROM events WHERE value IS NOT NULL AND value > 0.0
       |), digits AS (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
       |    AS digit
       |  FROM cents WHERE cents > 0
       |), c AS (
       |  SELECT digit, CAST(count(*) AS BIGINT) AS n
       |  FROM digits GROUP BY 1
       |), t AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM c),
       |e AS (SELECT * FROM (VALUES $vals) AS v(digit, expected))
       |SELECT CAST(e.digit AS BIGINT) AS digit,
       |  COALESCE(c.n, 0) AS n,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.N AS DOUBLE)")}
       |    AS obs_freq,
       |  ${graft.pipeline.ParityMath.q6Sql("e.expected")} AS exp_freq,
       |  ${graft.pipeline.ParityMath.q6Sql(
            """(CAST(COALESCE(c.n, 0) AS DOUBLE)
              |   - CAST(t.N AS DOUBLE) * e.expected)
              | * (CAST(COALESCE(c.n, 0) AS DOUBLE)
              |   - CAST(t.N AS DOUBLE) * e.expected)
              | / (CAST(t.N AS DOUBLE) * e.expected)""".stripMargin)}
       |    AS chi
       |FROM e LEFT JOIN c ON c.digit = e.digit CROSS JOIN t
       |ORDER BY digit""".stripMargin
  }
}
