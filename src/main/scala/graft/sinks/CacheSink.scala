package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Pluggable cache-state store ≙ the reference's `CacheServer` protocol
  * (/root/reference/src-clj/streamsum/protocols.clj: `getMap(name)`
  * returning a mutable map the app reads summaries from).
  *
  * In a distributed engine the "mutable map per cache" becomes "a named
  * relation per cache": `put` publishes a cache's state under its name,
  * `get` returns it as a DataFrame. Implementations decide durability -
  * in-memory temp views for tests/in-process serving (≙ the reference's
  * default HashMap server), parquet directories for durable/
  * cluster-shared state. Streaming pipelines plug the same interface
  * into foreachBatch.
  */
trait CacheSink {
  def put(cacheName: String, state: DataFrame): Unit
  def get(spark: SparkSession, cacheName: String): DataFrame

  /** ≙ caches.clj `reset-caches!`: drop a cache's published state. */
  def reset(spark: SparkSession, cacheName: String): Unit
}

/** ≙ default-cache-server (caches.clj:215): session-scoped, in-memory. */
final class MemoryCacheSink extends CacheSink {
  override def put(cacheName: String, state: DataFrame): Unit =
    state.createOrReplaceTempView(s"graft_cache_$cacheName")
  override def get(spark: SparkSession, cacheName: String): DataFrame =
    spark.table(s"graft_cache_$cacheName")
  override def reset(spark: SparkSession, cacheName: String): Unit =
    spark.catalog.dropTempView(s"graft_cache_$cacheName")
}

/** Durable store: one parquet directory per cache under `root`. */
final class ParquetCacheSink(root: String) extends CacheSink {
  override def put(cacheName: String, state: DataFrame): Unit =
    state.write.mode(SaveMode.Overwrite).parquet(s"$root/$cacheName")
  override def get(spark: SparkSession, cacheName: String): DataFrame =
    spark.read.parquet(s"$root/$cacheName")
  override def reset(spark: SparkSession, cacheName: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(s"$root/$cacheName")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }
}
