package graft.sources

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Pluggable event sources ≙ the reference's `Extract` protocol being
  * extendable to any object type (protocols.clj): the engine's contract
  * is just "a DataFrame with the event schema" - any format that can
  * produce those columns plugs into the SAME extract→transform→record
  * pipeline (`Transform.extractFrom` is source-agnostic).
  *
  * Parquet is the columnar default; JSON/CSV cover log-shaped feeds.
  * All three read with an explicit schema (no sampling-based inference
  * at scale), and the streaming face reuses the same schemas via
  * `readStream`.
  */
object EventSource {

  /** The canonical event schema (`ts` as epoch-nanos BIGINT, matching
    * the nanosAsLong parquet read).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def parquet(spark: SparkSession, path: String): DataFrame = {
    Graft.ensureConf(spark)
    spark.read.parquet(path)
  }

  def json(spark: SparkSession, path: String): DataFrame = {
    Graft.ensureConf(spark)
    spark.read.schema(eventSchema).json(path)
  }

  def csv(spark: SparkSession, path: String): DataFrame = {
    Graft.ensureConf(spark)
    spark.read.schema(eventSchema).option("header", "true").csv(path)
  }

  /** ORC: the other columnar format Spark ships natively - same
    * predicate pushdown / column pruning story as parquet, so an
    * ORC-resident deployment pays no plan-shape penalty switching in.
    */
  def orc(spark: SparkSession, path: String): DataFrame = {
    Graft.ensureConf(spark)
    spark.read.schema(eventSchema).orc(path)
  }
}
