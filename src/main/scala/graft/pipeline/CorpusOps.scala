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

  // ---- pipe_pack -----------------------------------------------------

  val packBudget = 256L

  /** Sequence packing: assign documents to token-budgeted training
    * bins. Contiguous-fill in the deterministic shuffle order: within
    * a shard, a document's bin is the budget-quotient of its exclusive
    * prefix token sum - each bin holds ~budget tokens (the last doc
    * may spill past the boundary, the standard streaming-packing
    * approximation). Per-shard windows only; no global sort, no
    * sequential driver pass - the 100 TB shape of packing.
    */
  def pack(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("skey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr(s"graft_md5_48(concat('$shuffleSalt', CAST(doc_id AS STRING)))")
          .as("skey"),
        expr("CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT)")
          .as("n_tok"))
      .withColumn("shard", pmod(col("skey"), lit(shuffleShards.toLong)))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(cum - n_tok) DIV $packBudget"))
      .select(col("shard"), col("bin"), col("doc_id"), col("n_tok"))
      .orderBy(col("shard"), col("bin"), col("doc_id"))
  }

  val packSql: String = {
    val h48 = HashParity.hex48Duck(
      s"md5(concat('$shuffleSalt', CAST(doc_id AS VARCHAR)))")
    s"""WITH keyed AS (
       |  SELECT doc_id, $h48 AS skey,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
       |  FROM documents
       |), cums AS (
       |  SELECT doc_id, skey % $shuffleShards AS shard, n_tok,
       |    sum(n_tok) OVER (PARTITION BY skey % $shuffleShards
       |                     ORDER BY skey, doc_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING
       |                     AND CURRENT ROW) AS cum
       |  FROM keyed
       |)
       |SELECT shard, (cum - n_tok) // $packBudget AS bin, doc_id, n_tok
       |FROM cums ORDER BY shard, bin, doc_id""".stripMargin
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
