package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized MinHash signature store: the shingle/hash relation and
  * the exploded LSH band stream are computed ONCE per (session, corpus)
  * and persisted, then shared by every dedup query in the session
  * (dd_minhash_lsh candidate generation, dd_ngram_jaccard verification,
  * pipe_corpus_clean's composed pipeline). Without it, each query
  * re-tokenizes and re-hashes the whole corpus - at 100 TB the
  * signature relation is exactly what you'd write to a table between
  * pipeline stages, so the cache stands in for that materialization.
  *
  * The memo key is (session, corpus dir); `release` drops the cached
  * relations (e.g. between scale factors in one session).
  */
object SignatureStore {

  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val bandCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** doc_id + distinct word-3-gram shingles + 48-bit shingle hashes.
    * Narrow one-pass compute (Dedup.shinglesFrom); persisted on first
    * use.
    */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    shingleCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      Dedup.shinglesFrom(Graft.tableParallel(s, dir, "documents")).persist()
    })

  /** (doc_id, band, band_hash) exploded - the LSH bucket key stream,
    * derived from the persisted shingle relation and itself persisted
    * (both the candidate join's build and probe side read it).
    */
  def bands(spark: SparkSession, sfDir: String,
            bandExprs: DataFrame => DataFrame): DataFrame =
    bandCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      bandExprs(shingles(s, dir)).persist()
    })

  def release(spark: SparkSession, sfDir: String): Unit = {
    Option(shingleCache.remove((spark, sfDir))).foreach(_.unpersist())
    Option(bandCache.remove((spark, sfDir))).foreach(_.unpersist())
  }

  def releaseAll(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    (shingleCache.keySet.asScala ++ bandCache.keySet.asScala)
      .filter(_._1 eq spark).toSeq.distinct
      .foreach { case (_, dir) => release(spark, dir) }
  }
}
