package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

/** A sink that can fold a micro-batch DELTA into the published snapshot
  * by key replacement: every row of `delta` replaces ALL previous rows
  * sharing its key (one row per changed key for the count cache, the
  * full refreshed ring for the last-N cache). This is the reference's
  * in-place `CacheServer.getMap().put(k, v)` update
  * (src-java/streamsum/TupleCache.java:20) restated for a snapshot
  * store: the published relation after the merge equals
  * `prev MINUS keys(delta) UNION delta`.
  */
trait DeltaCacheSink extends CacheSink {
  def mergeDelta(cacheName: String, delta: DataFrame,
                 keys: Seq[String]): Unit
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

/** The one-line `_LATEST` manifest both snapshot sinks commit through:
  * write-temp + atomic rename-overwrite, reads from a single open
  * handle. Extracted so the bucketed sink shares the exact machinery
  * the race spec pins.
  */
private[sinks] object Manifest {
  import org.apache.hadoop.fs.Path

  def fsFor(spark: SparkSession, p: Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Manifest reads must bypass client-side checksum sidecars: on a
    * ChecksumFileSystem (local FS) the `.crc` travels in a SECOND
    * rename behind the data file's, so a checksummed reader racing the
    * flip can pair new manifest bytes with the old sidecar and throw.
    * HDFS/object stores don't keep sidecar files — no-op there.
    */
  def rawFs(fs: org.apache.hadoop.fs.FileSystem): org.apache.hadoop.fs.FileSystem =
    fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  /** Latest committed version, or None before the first publish. */
  def readVersion(spark: SparkSession, m: Path): Option[Long] = {
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

  /** Commit point: write-temp + atomic rename-overwrite. The tmp write
    * goes through the RAW fs so no checksum sidecar is ever created -
    * the manifest is a single immutable line per version,
    * self-validating by parse.
    */
  def flip(spark: SparkSession, m: Path, next: Long): Unit = {
    val fs = rawFs(fsFor(spark, m))
    val tmp = new Path(m.getParent, s".${m.getName}.$next.tmp")
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
  }
}

/** Versioned atomic-publish store: the production half of foreachBatch
  * exactly-once that `ParquetCacheSink`'s in-place overwrite lacks. A
  * `put` writes the new snapshot to its OWN `v=<n>` directory -
  * invisible to readers - then flips a one-line `_LATEST` manifest via
  * an atomic rename (see [[Manifest]]), so a reader racing a publish
  * always sees a complete snapshot (old or new, never a half-written
  * directory), and a crash between the data write and the manifest
  * flip leaves the previous version intact: a restarted batch simply
  * rewrites the orphan `v=<n>` and flips again (idempotent, the same
  * replay contract as the incremental stores). The last `keepVersions`
  * snapshots are retained so in-flight readers of the previous version
  * don't lose their files at the instant of a flip.
  *
  * `mergeDelta` here is the simple full-rewrite fold (read previous
  * snapshot, anti-join, rewrite everything) - O(total state) per call.
  * Use [[BucketedSnapshotCacheSink]] when the per-trigger cost must be
  * O(delta), which is every high-frequency deployment.
  */
final class SnapshotCacheSink(root: String, keepVersions: Int = 2)
    extends DeltaCacheSink {
  import org.apache.hadoop.fs.Path

  private def manifest(name: String) = new Path(s"$root/$name/_LATEST")

  /** Latest committed version, or None before the first publish. */
  def currentVersion(spark: SparkSession, name: String): Option[Long] =
    Manifest.readVersion(spark, manifest(name))

  override def put(name: String, state: DataFrame): Unit = {
    val spark = state.sparkSession
    val next = currentVersion(spark, name).getOrElse(0L) + 1
    // data first, into a version-private dir (Overwrite: a replay of a
    // torn publish rewrites the orphan instead of appending to it)
    state.write.mode(SaveMode.Overwrite).parquet(s"$root/$name/v=$next")
    Manifest.flip(spark, manifest(name), next)
    // retain a window of old snapshots for in-flight readers
    val fs = Manifest.rawFs(Manifest.fsFor(spark, manifest(name)))
    val dir = new Path(s"$root/$name")
    fs.listStatus(dir).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("v=") &&
          nm.stripPrefix("v=").toLong <= next - keepVersions)
        fs.delete(st.getPath, true)
    }
  }

  override def mergeDelta(name: String, delta: DataFrame,
                          keys: Seq[String]): Unit = {
    val spark = delta.sparkSession
    val merged = currentVersion(spark, name) match {
      case Some(_) =>
        get(spark, name)
          .join(delta.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(delta)
      case None => delta
    }
    put(name, merged)
  }

  override def get(spark: SparkSession, name: String): DataFrame = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"SnapshotCacheSink: '$name' has never been published under $root"))
    spark.read.parquet(s"$root/$name/v=$v")
  }

  override def reset(spark: SparkSession, name: String): Unit = {
    val p = new Path(s"$root/$name")
    val fs = Manifest.fsFor(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }
}

/** O(delta)-per-trigger snapshot store: the scale answer to
  * [[SnapshotCacheSink]]'s full-rewrite `mergeDelta`, which at 10⁹
  * cached keys with a 10⁴-key delta pays the whole cache every
  * trigger. Two mechanisms compose (the merge-on-read layout every
  * streaming lakehouse converges on):
  *
  *   - **Delta log.** Each `mergeDelta` appends ONE delta-sized parquet
  *     write (`v=<n>/delta`) and flips the manifest - per-trigger cost
  *     is O(delta), full stop. Readers merge base + pending deltas by
  *     key at read time (later versions win), so the snapshot is
  *     always exact.
  *   - **Bucket-local compaction.** The base is hash-bucketed on the
  *     merge keys (`v=<n>/base/_b=<k>`). When pending delta rows exceed
  *     `compactFrac` of the base, the deltas are folded in - but only
  *     the buckets the deltas actually touch are rewritten; untouched
  *     buckets carry forward BY REFERENCE (the new version's `_STATE`
  *     map points at the old version's files, byte-identical). Read
  *     cost is thereby bounded: at most 1/compactFrac deltas pending.
  *
  * Why not bucketed rewrite alone: a d-key delta hashed over B buckets
  * touches ~B·(1-e^(-d/B)) of them - for d ≳ B that is ALL of them,
  * i.e. still O(total state) per trigger. The delta log makes the
  * per-trigger cost genuinely O(delta); bucketing caps what each
  * compaction rewrites.
  *
  * Commit protocol is byte-for-byte the [[Manifest]] one: data and the
  * per-version `_STATE` layout file are written first (invisible),
  * then `_LATEST` flips atomically. A crash mid-publish leaves an
  * orphan `v=<n>` that the replayed batch rewrites - same idempotent
  * replay contract, pinned by the same race spec. Retention keeps
  * every version REFERENCED by the last `keepVersions` states (a
  * carried-forward bucket keeps its home version alive past the
  * window).
  *
  * Sizing at 100 TB: `numBuckets` so one bucket ≈ a few executor
  * partitions (10⁹ keys / 4096 buckets ≈ 250k keys/bucket); compaction
  * then rewrites (touched/B)·state, and a steady 10⁴-key trigger
  * stream compacts every (compactFrac·state)/delta triggers.
  */
final class BucketedSnapshotCacheSink(root: String, keys: Seq[String],
                                      numBuckets: Int = 64,
                                      keepVersions: Int = 2,
                                      compactFrac: Double = 0.25)
    extends DeltaCacheSink {
  import org.apache.hadoop.fs.Path
  require(keys.nonEmpty && numBuckets > 0 && compactFrac > 0)

  private val B = "_b"
  private val DV = "__dv"

  private def manifest(name: String) = new Path(s"$root/$name/_LATEST")
  private def vdir(name: String, v: Long) = s"$root/$name/v=$v"

  def currentVersion(spark: SparkSession, name: String): Option[Long] =
    Manifest.readVersion(spark, manifest(name))

  private def bucketOf = pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Per-version layout: which version dir holds each bucket's current
    * base file (+ row count), and the pending delta versions in apply
    * order (+ row counts). Written to `v=<n>/_STATE` BEFORE the flip,
    * immutable afterwards.
    */
  private case class State(base: Map[Int, (Long, Long)],
                           deltas: Seq[(Long, Long)])

  private def writeState(spark: SparkSession, name: String, v: Long,
                         st: State): Unit = {
    val lines = st.base.toSeq.sorted.map { case (b, (bv, rows)) =>
      s"B $b $bv $rows"
    } ++ st.deltas.map { case (dv, rows) => s"D $dv $rows" }
    val p = new Path(s"${vdir(name, v)}/_STATE")
    val fs = Manifest.rawFs(Manifest.fsFor(spark, p))
    val out = fs.create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readState(spark: SparkSession, name: String,
                        v: Long): State = {
    val p = new Path(s"${vdir(name, v)}/_STATE")
    val fs = Manifest.rawFs(Manifest.fsFor(spark, p))
    val in = fs.open(p)
    val out = new java.io.ByteArrayOutputStream()
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
    finally in.close()
    val lines = out.toString("UTF-8").split("\n").filter(_.nonEmpty)
    val base = lines.collect { case l if l.startsWith("B ") =>
      val Array(_, b, bv, rows) = l.split(" ")
      b.toInt -> (bv.toLong, rows.toLong)
    }.toMap
    val deltas = lines.collect { case l if l.startsWith("D ") =>
      val Array(_, dv, rows) = l.split(" ")
      dv.toLong -> rows.toLong
    }.toSeq
    State(base, deltas)
  }

  /** Write `df` hash-bucketed under `dir`; returns bucket -> row count.
    * The repartition puts each bucket in one task so a bucket is one
    * file, and the count-back reads only parquet footers plus the
    * discovered `_b=` partition column (no data pages).
    */
  private def writeBase(df: DataFrame, dir: String): Map[Int, Long] = {
    val spark = df.sparkSession
    df.withColumn(B, bucketOf).repartition(col(B))
      .write.partitionBy(B).mode(SaveMode.Overwrite).parquet(dir)
    try spark.read.parquet(dir).groupBy(col(B)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    catch { // zero rows leave no part files to infer a schema from
      case _: org.apache.spark.sql.AnalysisException => Map.empty
    }
  }

  private def readBase(spark: SparkSession, name: String,
                       base: Map[Int, (Long, Long)]): DataFrame = {
    val paths = base.toSeq.map { case (b, (bv, _)) =>
      s"${vdir(name, bv)}/base/$B=$b"
    }
    spark.read.parquet(paths: _*)
  }

  /** Key-replacement merge: rows of the LATEST delta version holding a
    * key win over earlier deltas and over the base.
    */
  private def applyDeltas(base: DataFrame,
                          deltas: Seq[(Long, DataFrame)]): DataFrame = {
    val tagged = deltas.map { case (v, df) => df.withColumn(DV, lit(v)) }
      .reduce(_ unionByName _)
    val latest = tagged
      .withColumn("__mx", max(col(DV))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)))
      .where(col(DV) === col("__mx")).drop(DV, "__mx")
    base.join(tagged.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(latest)
  }

  override def put(name: String, state: DataFrame): Unit = {
    val spark = state.sparkSession
    val next = currentVersion(spark, name).getOrElse(0L) + 1
    val rows = writeBase(state, s"${vdir(name, next)}/base")
    if (rows.isEmpty) { // empty state: nothing published, no flip
      val p = new Path(vdir(name, next))
      val fs = Manifest.fsFor(spark, p)
      if (fs.exists(p)) fs.delete(p, true)
      return
    }
    writeState(spark, name, next, State(rows.map { case (b, n) =>
      b -> (next, n)
    }, Nil))
    Manifest.flip(spark, manifest(name), next)
    retention(spark, name, next)
  }

  override def mergeDelta(name: String, delta: DataFrame,
                          mergeKeys: Seq[String]): Unit = {
    require(mergeKeys == keys,
      s"sink is bucketed on $keys, merge asked for $mergeKeys")
    val spark = delta.sparkSession
    currentVersion(spark, name) match {
      case None => put(name, delta) // first publish IS the base
      case Some(cur) =>
        val st = readState(spark, name, cur)
        val next = cur + 1
        val dDir = s"${vdir(name, next)}/delta"
        // the O(delta) path: ONE delta-sized write per trigger
        delta.write.mode(SaveMode.Overwrite).parquet(dDir)
        val dRows = spark.read.parquet(dDir).count()
        if (dRows == 0) { // empty batch: no version bump
          val p = new Path(vdir(name, next))
          val fs = Manifest.fsFor(spark, p)
          if (fs.exists(p)) fs.delete(p, true)
          return
        }
        val pendingRows = st.deltas.map(_._2).sum + dRows
        val baseRows = st.base.values.map(_._2).sum
        if (pendingRows < math.max(1L, (compactFrac * baseRows).toLong)) {
          // append-only publish: base map unchanged, delta list grows
          writeState(spark, name, next,
            State(st.base, st.deltas :+ (next -> dRows)))
        } else {
          // compaction: fold ALL pending deltas into the buckets they
          // touch; untouched buckets carry forward by reference
          val deltaDfs = (st.deltas.map(_._1) :+ next).map { v =>
            v -> spark.read.parquet(s"${vdir(name, v)}/delta")
          }
          val touched = deltaDfs.map(_._2).reduce(_ unionByName _)
            .select(bucketOf.as(B)).distinct()
            .collect().map(_.getInt(0)).toSet // bounded by numBuckets
          val prevTouched = st.base.filter { case (b, _) => touched(b) }
          val merged =
            if (prevTouched.isEmpty) applyDeltas(
              deltaDfs.head._2.limit(0), deltaDfs)
            else applyDeltas(readBase(spark, name, prevTouched), deltaDfs)
          val rows = writeBase(merged, s"${vdir(name, next)}/base")
          writeState(spark, name, next, State(
            st.base.filterNot { case (b, _) => touched(b) } ++
              rows.map { case (b, n) => b -> (next, n) }, Nil))
        }
        Manifest.flip(spark, manifest(name), next)
        retention(spark, name, next)
    }
  }

  override def get(spark: SparkSession, name: String): DataFrame = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"BucketedSnapshotCacheSink: '$name' has never been published " +
          s"under $root"))
    val st = readState(spark, name, v)
    val base = readBase(spark, name, st.base)
    if (st.deltas.isEmpty) base
    else applyDeltas(base, st.deltas.map { case (dv, _) =>
      dv -> spark.read.parquet(s"${vdir(name, dv)}/delta")
    })
  }

  /** The key's bucket, computed DRIVER-SIDE with the identical
    * Catalyst expression the writer bucketed with (`pmod(hash(keys),
    * numBuckets)` - Murmur3, seed 42), so pruning and placement can
    * never disagree. Literals are created at the column's exact
    * DataType: `hash` of an Int and a Long differ, so the caller's
    * value is converted against the stored schema, not its runtime
    * class.
    */
  private def bucketForKey(schema: org.apache.spark.sql.types.StructType,
                           keyVals: Seq[Any]): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val lits = keys.zip(keyVals).map { case (k, value) =>
      Literal.create(value, schema(k).dataType)
    }
    val h = Murmur3Hash(lits, 42).eval(null).asInstanceOf[Int]
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  /** Point lookup ≙ the reference's primary serving op
    * `getMap(name).get(key)` (src-java/streamsum/TupleCache.java:20):
    * reads ONE base bucket file - the key's hash bucket - plus the
    * pending deltas filtered by key, never the whole base. At 10⁹
    * cached keys over 4096 buckets a point read touches ~1/4096 of
    * the state (plus ≤ compactFrac·base of key-filtered delta rows,
    * where the parquet key predicate skips row groups by stats);
    * `get` + filter would list and scan every bucket. The executed
    * plan's base scan touches exactly one `_b=` directory -
    * spec-pinned (BucketedSinkSpec).
    */
  def getKey(spark: SparkSession, name: String,
             keyVals: Seq[Any]): DataFrame = {
    require(keyVals.length == keys.length,
      s"sink keys are $keys, got ${keyVals.length} value(s)")
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"BucketedSnapshotCacheSink: '$name' has never been published " +
          s"under $root"))
    val st = readState(spark, name, v)
    // schema from one base bucket's footer (base is never empty after
    // a publish: empty states don't flip the manifest)
    val (b0, (bv0, _)) = st.base.head
    val schema =
      spark.read.parquet(s"${vdir(name, bv0)}/base/$B=$b0").schema
    val bucket = bucketForKey(schema, keyVals)
    val keyFilter = keys.zip(keyVals).map { case (k, value) =>
      col(k) === lit(value)
    }.reduce(_ && _)
    val base = st.base.get(bucket) match {
      case Some((bv, _)) =>
        spark.read.schema(schema)
          .parquet(s"${vdir(name, bv)}/base/$B=$bucket")
          .where(keyFilter)
      case None => // bucket empty in base: key can only live in deltas
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    if (st.deltas.isEmpty) base
    else applyDeltas(base, st.deltas.map { case (dv, _) =>
      dv -> spark.read.parquet(s"${vdir(name, dv)}/delta").where(keyFilter)
    })
  }

  /** Batched point lookup - the serving-path MULTIGET: one pruned
    * read for a SET of keys. Buckets are computed driver-side exactly
    * as in `getKey`; the plan lists only the distinct home buckets of
    * the requested keys (≤ |keys| of numBuckets) plus the key-filtered
    * pending deltas, and runs as ONE job instead of |keys| round
    * trips - the difference between 20 × (footer + scan + collect)
    * and one scan when a dashboard asks for a key list.
    */
  def getKeys(spark: SparkSession, name: String,
              keyRows: Seq[Seq[Any]]): DataFrame = {
    require(keyRows.nonEmpty && keyRows.forall(_.length == keys.length),
      s"sink keys are $keys; every key row must match")
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"BucketedSnapshotCacheSink: '$name' has never been published " +
          s"under $root"))
    val st = readState(spark, name, v)
    val (b0, (bv0, _)) = st.base.head
    val schema =
      spark.read.parquet(s"${vdir(name, bv0)}/base/$B=$b0").schema
    val buckets = keyRows.map(bucketForKey(schema, _)).distinct
    val keyFilter = keyRows.map { r =>
      keys.zip(r).map { case (k, value) => col(k) === lit(value) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val paths = buckets.flatMap(b => st.base.get(b).map {
      case (bv, _) => s"${vdir(name, bv)}/base/$B=$b"
    })
    val base =
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(paths: _*).where(keyFilter)
    if (st.deltas.isEmpty) base
    else applyDeltas(base, st.deltas.map { case (dv, _) =>
      dv -> spark.read.parquet(s"${vdir(name, dv)}/delta").where(keyFilter)
    })
  }

  /** Delete version dirs neither inside the retention window nor
    * referenced (as a carried-forward bucket's home or a pending
    * delta) by any retained version's state.
    */
  private def retention(spark: SparkSession, name: String,
                        next: Long): Unit = {
    val fs = Manifest.rawFs(Manifest.fsFor(spark, manifest(name)))
    val windowLo = next - keepVersions + 1
    val referenced = (windowLo to next).flatMap { v =>
      if (!fs.exists(new Path(s"${vdir(name, v)}/_STATE"))) Seq.empty
      else {
        val st = readState(spark, name, v)
        st.base.values.toSeq.map(_._1) ++ st.deltas.map(_._1) ++ Seq(v)
      }
    }.toSet
    fs.listStatus(new Path(s"$root/$name")).foreach { s =>
      val nm = s.getPath.getName
      if (nm.startsWith("v=")) {
        val v = nm.stripPrefix("v=").toLong
        if (v < windowLo && !referenced(v)) fs.delete(s.getPath, true)
      }
    }
  }

  override def reset(spark: SparkSession, name: String): Unit = {
    val p = new Path(s"$root/$name")
    val fs = Manifest.fsFor(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
