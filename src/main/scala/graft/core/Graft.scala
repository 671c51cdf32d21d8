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
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureConf(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
