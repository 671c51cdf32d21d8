package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * Narrow one-pass compute; persisted on first use.
    */
  def shingles(spark: SparkSession, sfDir: String): DataFrame =
    shingleCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      Graft.tableParallel(s, dir, "documents")
        .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .filter(size(col("toks")) >= 3)
        .withColumn("sh", expr(
          """array_distinct(transform(sequence(1, size(toks) - 2),
            |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
            |                 element_at(toks, i + 2))))""".stripMargin))
        .withColumn("hs", expr("transform(sh, s -> graft_md5_48(s))"))
        .select(col("doc_id"), col("sh"), col("hs"))
        .persist()
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
}
