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

/** Versioned atomic-publish store: the production half of foreachBatch
  * exactly-once that `ParquetCacheSink`'s in-place overwrite lacks. A
  * `put` writes the new snapshot to its OWN `v=<n>` directory -
  * invisible to readers - then flips a one-line `_LATEST` manifest via
  * an atomic rename (FileContext RENAME OVERWRITE), so a reader racing
  * a publish always sees a complete snapshot (old or new, never a
  * half-written directory), and a crash between the data write and the
  * manifest flip leaves the previous version intact: a restarted batch
  * simply rewrites the orphan `v=<n>` and flips again (idempotent, the
  * same replay contract as the incremental stores). The last
  * `keepVersions` snapshots are retained so in-flight readers of the
  * previous version don't lose their files at the instant of a flip.
  */
final class SnapshotCacheSink(root: String, keepVersions: Int = 2)
    extends CacheSink {
  import org.apache.hadoop.fs.Path

  private def fsFor(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Manifest reads must bypass client-side checksum sidecars: on a
    * ChecksumFileSystem (local FS) the `.crc` travels in a SECOND
    * rename behind the data file's, so a checksummed reader racing the
    * flip can pair new manifest bytes with the old sidecar and throw.
    * HDFS/object stores don't keep sidecar files — no-op there.
    */
  private def rawFs(fs: org.apache.hadoop.fs.FileSystem) = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case f => f
  }

  private def manifest(name: String) = new Path(s"$root/$name/_LATEST")

  /** Latest committed version, or None before the first publish. */
  def currentVersion(spark: SparkSession, name: String): Option[Long] = {
    val m = manifest(name)
    val fs = rawFs(fsFor(spark, m))
    if (!fs.exists(m)) None
    else {
      // read to EOF from one open handle (not a pre-fetched length):
      // a rename-overwrite between stat and read must not truncate
      val in = fs.open(m)
      val out = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      finally in.close()
      Some(out.toString("UTF-8").trim.toLong)
    }
  }

  override def put(name: String, state: DataFrame): Unit = {
    val spark = state.sparkSession
    val next = currentVersion(spark, name).getOrElse(0L) + 1
    // data first, into a version-private dir (Overwrite: a replay of a
    // torn publish rewrites the orphan instead of appending to it)
    state.write.mode(SaveMode.Overwrite).parquet(s"$root/$name/v=$next")
    // then the commit point: write-temp + atomic rename-overwrite.
    // The tmp write goes through the RAW fs so no checksum sidecar is
    // ever created (see rawFs) - the manifest is a single immutable
    // line per version, self-validating by parse.
    val m = manifest(name)
    val fs = rawFs(fsFor(spark, m))
    val tmp = new Path(s"$root/$name/._LATEST.$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val scheme = m.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // LocalFs FileContext rename-overwrite is delete-then-rename - a
      // window where the manifest doesn't exist at all. The platform
      // primitive is the real atomic overwrite on a local filesystem.
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(m).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      // HDFS/object-store AbstractFileSystems implement overwrite
      // rename atomically server-side
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        m.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, m, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    // retain a window of old snapshots for in-flight readers
    val dir = new Path(s"$root/$name")
    fs.listStatus(dir).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("v=") &&
          nm.stripPrefix("v=").toLong <= next - keepVersions)
        fs.delete(st.getPath, true)
    }
  }

  override def get(spark: SparkSession, name: String): DataFrame = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"SnapshotCacheSink: '$name' has never been published under $root"))
    spark.read.parquet(s"$root/$name/v=$v")
  }

  override def reset(spark: SparkSession, name: String): Unit = {
    val p = new Path(s"$root/$name")
    val fs = fsFor(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
