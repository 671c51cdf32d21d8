package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session/table plumbing shared by every graft operator.
  *
  * The engine is DataFrame-first: every operator below declares a logical
  * plan and lets Catalyst/Tungsten pick the physical strategy. Nothing in
  * the library ever collects to the driver.
  */
object Graft {

  /** Settings every query needs, applied idempotently to whatever session
    * the driver hands us. `nanosAsLong` because the synthetic `events`
    * table carries parquet TIMESTAMP(NANOS), which Spark 4 otherwise
    * refuses to read; we read it as epoch-nanos BIGINT and normalize to
    * epoch-micros (matching DuckDB's ns→µs truncation).
    */
  def ensureConf(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.NativeFunctions.register(spark)
    // engine-wide: row_number+filter top-k plans as the bounded-heap
    // operator instead of a per-key sort (TopKWindowRewrite)
    graft.plans.TopKWindowRewrite.install(spark)
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureConf(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Read + spread across the cluster for compute-bound narrow
    * pipelines (per-row regex/hashing/vector math). A parquet row group
    * is indivisible - one task - so when the input has fewer row groups
    * than cores (true for the single-row-group test files, and for any
    * pathological production layout) the whole narrow stage would run
    * on a handful of threads. One cheap round-robin shuffle of the raw
    * rows buys full-width parallelism for the expensive per-row work;
    * ops that immediately shuffle anyway should use `table` instead.
    */
  /** The split-starvation probe (`df.rdd.getNumPartitions`) runs a
    * full physical-planning pass per call; the answer is a property of
    * the table's file layout, fixed for the life of a session — so it
    * is memoized per (session, dir, table). ~100 headline queries call
    * this (some more than once); unmemoized, each paid the extra
    * planning pass just to re-learn the same layout fact.
    */
  private val spreadCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]()

  def tableParallel(spark: SparkSession, sfDir: String,
                    name: String): DataFrame = {
    val df = table(spark, sfDir, name)
    // Only pay the round-robin shuffle when the scan is actually
    // starved of splits: a production table with thousands of row
    // groups already feeds every core, and an unconditional
    // repartition would re-shuffle the whole corpus for nothing.
    val cores = spark.sparkContext.defaultParallelism
    val it = spreadCache.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    val starved = spreadCache.computeIfAbsent(
      (spark, s"$sfDir/$name"),
      _ => Boolean.box(df.rdd.getNumPartitions < cores))
    if (starved) df.repartition(cores) else df
  }
}
