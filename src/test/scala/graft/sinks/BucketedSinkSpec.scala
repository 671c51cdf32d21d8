package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O(delta) publish contract of [[BucketedSnapshotCacheSink]]: delta
  * appends are delta-sized, compaction rewrites only touched buckets,
  * untouched bucket files carry forward BY REFERENCE (byte-identical),
  * and the read-time merged snapshot always equals the one-shot
  * key-replacement fold.
  */
class BucketedSinkSpec extends SparkSpec {

  private def df(rows: (Long, String)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("k", "v")
  }

  /** The sink's own bucket function, recomputed for assertions. */
  private def bucketOf(k: Long, n: Int): Int = {
    val s = spark; import s.implicits._
    Seq(k).toDF("k").select(pmod(hash(col("k")), lit(n)))
      .head().getInt(0)
  }

  private def rowSet(d: DataFrame): Set[(Long, String)] =
    d.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  /** All parquet data files under a cache dir, path -> content hash. */
  private def files(root: String, name: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(s"$root/$name")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      f.getPath -> md.digest(bytes).map("%02x".format(_)).mkString
    }.toMap
  }

  test("bucketed sink: put/get round trip and full replace") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_rt").toString
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"), numBuckets = 8)
    sink.put("c", df(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(sink.currentVersion(spark, "c").contains(1L))
    assert(rowSet(sink.get(spark, "c")) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // put is a FULL replace: absent keys vanish
    sink.put("c", df(1L -> "z"))
    assert(rowSet(sink.get(spark, "c")) == Set(1L -> "z"))
    intercept[IllegalStateException] { sink.get(spark, "nope") }
  }

  test("bucketed sink: delta append is delta-sized and leaves every " +
       "base file byte-identical; merged read equals one-shot fold") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_app").toString
    // compactFrac huge: never compact, always the O(delta) append path
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 8, compactFrac = 1e9)
    sink.mergeDelta("c", df((1L to 40L).map(i => i -> s"v$i"): _*), Seq("k"))
    val baseFiles = files(root, "c")
    // delta replaces key 1, adds key 100
    sink.mergeDelta("c", df(1L -> "NEW", 100L -> "add"), Seq("k"))
    val after = files(root, "c")
    // every original base file still present, byte-identical
    baseFiles.foreach { case (p, h) =>
      assert(after.get(p).contains(h), s"base file changed: $p")
    }
    // the append wrote ONE delta dir, no new base buckets
    val newPaths = (after.keySet -- baseFiles.keySet).toSeq
    assert(newPaths.nonEmpty && newPaths.forall(_.contains("/delta/")),
      s"append must only add delta files, got $newPaths")
    // read-time merge: key replacement, later delta wins
    val got = rowSet(sink.get(spark, "c"))
    assert(got.size == 41 && got(1L -> "NEW") && got(100L -> "add") &&
      !got(1L -> "v1"))
    // a second delta stacking on the first: latest version wins per key
    sink.mergeDelta("c", df(1L -> "NEWER", 2L -> "two"), Seq("k"))
    val got2 = rowSet(sink.get(spark, "c"))
    assert(got2(1L -> "NEWER") && got2(2L -> "two") && !got2(1L -> "NEW"))
  }

  test("bucketed sink: compaction rewrites ONLY touched buckets; " +
       "untouched buckets carry forward by reference across versions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_cmp").toString
    val nb = 8
    // compactFrac tiny: every merge compacts
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = nb, keepVersions = 2, compactFrac = 1e-9)
    val keys = (1L to 200L)
    sink.put("c", df(keys.map(i => i -> s"v$i"): _*))
    val baseFiles = files(root, "c")
    // single-key delta: touches exactly one bucket
    val touchedBucket = bucketOf(7L, nb)
    sink.mergeDelta("c", df(7L -> "NEW"), Seq("k"))
    val after = files(root, "c")
    // untouched buckets: identical files at their ORIGINAL v=1 paths
    val untouchedBefore = baseFiles.filterNot(_._1
      .contains(s"_b=$touchedBucket"))
    untouchedBefore.foreach { case (p, h) =>
      assert(after.get(p).contains(h),
        s"untouched bucket file rewritten or moved: $p")
    }
    // the touched bucket was rewritten under v=2
    assert(after.keys.exists(p =>
      p.contains("/v=2/") && p.contains(s"_b=$touchedBucket")))
    // correctness of the fold
    val got = rowSet(sink.get(spark, "c"))
    assert(got.size == 200 && got(7L -> "NEW") && !got(7L -> "v7"))
    // retention keeps v=1 alive while v=2 references its buckets, even
    // after more publishes age v=1 past the keepVersions window
    sink.mergeDelta("c", df(7L -> "NEWER"), Seq("k"))
    sink.mergeDelta("c", df(7L -> "NEWEST"), Seq("k"))
    val dirs = new java.io.File(s"$root/c").listFiles()
      .map(_.getName).filter(_.startsWith("v=")).toSet
    assert(dirs.contains("v=1"),
      s"carried-forward buckets' home version must survive: $dirs")
    untouchedBefore.foreach { case (p, h) =>
      assert(files(root, "c").get(p).contains(h)) }
    assert(rowSet(sink.get(spark, "c"))(7L -> "NEWEST"))
  }

  /** The base `_b=` dirs a plan's file scans actually list. */
  private def baseBuckets(d: DataFrame): Set[String] =
    d.inputFiles.filter(_.contains("/base/"))
      .map(_.split("_b=")(1).split("/")(0)).toSet

  test("getKey: point read lists exactly ONE base bucket dir, merges " +
       "pending deltas by key, and equals get().filter on every key") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_pt").toString
    // compactFrac huge: deltas stay pending, so reads must merge them
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 8, compactFrac = 1e9)
    sink.put("c", df((1L to 200L).map(i => i -> s"v$i"): _*))
    sink.mergeDelta("c", df(7L -> "NEW", 300L -> "add"), Seq("k"))

    // delta-replaced key: delta wins over the base row
    val hit = sink.getKey(spark, "c", Seq(7L))
    assert(rowSet(hit) == Set(7L -> "NEW"))
    // plan pin: the base scan lists the key's hash bucket and NO other
    assert(baseBuckets(hit) == Set(bucketOf(7L, 8).toString),
      s"point read listed base buckets ${baseBuckets(hit)}")
    // control: the full read lists many buckets
    assert(baseBuckets(sink.get(spark, "c")).size > 1)

    // delta-only, base-only and absent keys
    assert(rowSet(sink.getKey(spark, "c", Seq(300L))) == Set(300L -> "add"))
    assert(rowSet(sink.getKey(spark, "c", Seq(42L))) == Set(42L -> "v42"))
    assert(sink.getKey(spark, "c", Seq(9999L)).count() == 0)

    // getKey == get().filter across a key sample (incl. post-compaction:
    // drop compactFrac so the next merge folds the pending deltas)
    val sink2 = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 8, compactFrac = 1e-9)
    sink2.mergeDelta("c", df(8L -> "NEW8"), Seq("k"))
    val full = rowSet(sink2.get(spark, "c"))
    for (k <- Seq(1L, 7L, 8L, 100L, 300L, 9999L))
      assert(rowSet(sink2.getKey(spark, "c", Seq(k))) ==
        full.filter(_._1 == k),
        s"getKey($k) diverged from the snapshot")
    // after compaction there are no deltas: still one bucket listed
    assert(baseBuckets(sink2.getKey(spark, "c", Seq(8L))) ==
      Set(bucketOf(8L, 8).toString))
  }

  test("getKeys multiget: one plan listing only the requested keys' " +
       "home buckets; equals the per-key getKey union") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_mget").toString
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 8, compactFrac = 1e9)
    sink.put("c", df((1L to 200L).map(i => i -> s"v$i"): _*))
    sink.mergeDelta("c", df(7L -> "NEW", 300L -> "add"), Seq("k"))
    val ks = Seq(7L, 42L, 300L, 9999L)
    val got = sink.getKeys(spark, "c", ks.map(Seq[Any](_)))
    assert(rowSet(got) ==
      ks.flatMap(k => rowSet(sink.getKey(spark, "c", Seq(k)))).toSet)
    // plan pin: listed base buckets ⊆ the keys' distinct home buckets
    val wanted = ks.map(bucketOf(_, 8)).map(_.toString).toSet
    val listed = baseBuckets(got)
    assert(listed.nonEmpty && listed.subsetOf(wanted),
      s"multiget listed $listed, wanted ⊆ $wanted")
  }

  test("bucketed sink: torn publish stays invisible and a replay " +
       "rewrites the orphan (idempotent)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_torn").toString
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 4, compactFrac = 1e9)
    sink.mergeDelta("c", df(1L -> "a", 2L -> "b"), Seq("k"))
    // simulate a crash between the delta write and the manifest flip:
    // an orphan v=2 with data but no committed _LATEST bump
    df(9L -> "x").write.parquet(s"$root/c/v=2/delta")
    assert(sink.currentVersion(spark, "c").contains(1L))
    assert(rowSet(sink.get(spark, "c")) == Set(1L -> "a", 2L -> "b"),
      "torn delta became visible")
    // the replayed batch rewrites the orphan and commits
    sink.mergeDelta("c", df(2L -> "B2"), Seq("k"))
    assert(sink.currentVersion(spark, "c").contains(2L))
    assert(rowSet(sink.get(spark, "c")) == Set(1L -> "a", 2L -> "B2"))
  }

  test("bucketed sink: empty delta publishes nothing (no version bump)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_empty").toString
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"), numBuckets = 4)
    sink.mergeDelta("c", df(1L -> "a"), Seq("k"))
    sink.mergeDelta("c", df(1L -> "a").limit(0), Seq("k"))
    assert(sink.currentVersion(spark, "c").contains(1L))
    assert(rowSet(sink.get(spark, "c")) == Set(1L -> "a"))
  }

  test("bucketed sink: a reader racing delta publishes and compactions " +
       "never sees a torn snapshot and observes monotone versions") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_bsink_race").toString
    // small compactFrac: the publish sequence alternates append/compact
    val sink = new BucketedSnapshotCacheSink(root, Seq("k"),
      numBuckets = 4, keepVersions = 4, compactFrac = 0.5)
    val rows = 40
    // snapshot i: every key carries value i - a torn read mixes values
    def snap(i: Int) = (1 to rows).map(k => k.toLong -> s"$i").toSeq
    sink.put("c", df(snap(0): _*))
    @volatile var stop = false
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val vals = sink.get(spark, "c").collect()
            .map(_.getString(1).toInt).toSeq
          if (vals.length != rows || vals.distinct.length != 1)
            errs.add(s"torn snapshot: n=${vals.length}, " +
              s"values=${vals.distinct.sorted}")
          else seen.add(vals.head)
        } catch { case e: Throwable => errs.add(e.toString) }
      }
    })
    reader.start()
    try for (i <- 1 to 6) sink.mergeDelta("c", df(snap(i): _*), Seq("k"))
    finally { stop = true; reader.join() }
    assert(errs.isEmpty, s"racing reader observed: $errs")
    assert(!seen.isEmpty, "reader must complete at least one read")
    val vs = seen.toArray(Array.empty[Integer]).map(_.toInt).toSeq
    assert(vs.forall(v => v >= 0 && v <= 6))
    assert(vs == vs.sorted, s"versions must be monotone: $vs")
  }

  test("update-mode count publish through the bucketed sink equals the " +
       "one-shot batch state and replays idempotently") {
    val s = spark; import s.implicits._
    val watch = java.nio.file.Files
      .createTempDirectory("graft_bupd_watch").toString
    val root = java.nio.file.Files
      .createTempDirectory("graft_bupd_sink").toString
    val cp = java.nio.file.Files
      .createTempDirectory("graft_bupd_cp").toString
    val ev = graft.core.Graft.table(spark, sfDir, "events")
    def land(d: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$watch/_t"
      d.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, name))
    }
    // compactFrac tiny so the second catch-up exercises the bucketed
    // compaction, not just the append
    val sink = new BucketedSnapshotCacheSink(root,
      graft.streaming.StreamSum.countSinkKeys, numBuckets = 8,
      compactFrac = 1e-9)
    land(ev.filter(pmod(col("event_id"), lit(2)) === 0), "a1.parquet")
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    land(ev.filter(pmod(col("event_id"), lit(2)) === 1), "a2.parquet")
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    def key(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.select(concat_ws("|", col("cache"), col("s"), col("a"), col("o"),
        col("cnt"), col("last_t"))).collect().map(_.getString(0)).toSet
    val full = graft.core.Caches.countState(
      graft.core.Transform(graft.core.Transform.extractFrom(
        spark.read.option("pathGlobFilter", "*.parquet").parquet(watch))))
    assert(key(sink.get(spark, "counts")) == key(full),
      "incrementally merged bucketed snapshot must equal one-shot state")
    // no-op catch-up leaves the state equal
    graft.streaming.StreamSum.streamCountsToSinkUpdate(
      spark, watch, sink, "counts", Some(cp), glob = "*.parquet")
    assert(key(sink.get(spark, "counts")) == key(full))
  }
}
