package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-level training-data operators: global vocabulary and
  * deterministic sharded shuffling - the "what order and what words"
  * half of a training-data pipeline, shaped for 100 TB.
  */
object CorpusOps {

  val vocabK = 100
  val shuffleShards = 8
  val shuffleSalt = "shuf42:"

  // ---- txt_vocab -----------------------------------------------------

  /** Global top-k vocabulary by term frequency. Explode → count is the
    * canonical map-side-combinable aggregation (one shuffle on term);
    * the global top-k plans as TakeOrderedAndProject - per-partition
    * heaps + a k-row merge on the driver, never a full global sort.
    */
  def vocab(spark: SparkSession, sfDir: String): DataFrame =
    Graft.tableParallel(spark, sfDir, "documents")
      .select(explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term"))
      .limit(vocabK)

  val vocabSql: String =
    s"""SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
       |  FROM documents
       |)
       |GROUP BY term ORDER BY freq DESC, term LIMIT $vocabK""".stripMargin

  // ---- pipe_shuffle --------------------------------------------------

  /** Deterministic sharded corpus shuffle ≙ randomizing training-data
    * order: a salted 48-bit content hash gives every doc a
    * pseudo-random sort key; shard = key mod #shards, position = rank
    * within the shard. No global sort - each shard ranks
    * independently (one keyed shuffle), which is exactly how a
    * training pipeline writes its shuffled shards. Rerunning yields
    * the same order (seeded by the salt), so downstream runs are
    * reproducible.
    */
  def shuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"))
    Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr(s"graft_md5_48(concat('$shuffleSalt', CAST(doc_id AS STRING)))")
          .as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(shuffleShards.toLong)))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  val shuffleSql: String = {
    val h48 = HashParity.hex48Duck(
      s"md5(concat('$shuffleSalt', CAST(doc_id AS VARCHAR)))")
    s"""WITH keyed AS (
       |  SELECT doc_id, $h48 AS skey FROM documents
       |)
       |SELECT skey % $shuffleShards AS shard,
       |       CAST(row_number() OVER (PARTITION BY skey % $shuffleShards
       |                               ORDER BY skey, doc_id) AS BIGINT)
       |         AS pos,
       |       doc_id
       |FROM keyed ORDER BY shard, pos""".stripMargin
  }
}
