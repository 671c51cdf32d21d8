package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Session-memo and idle-state contracts of the SignatureStore. */
class SignatureStoreSpec extends SparkSpec {

  test("bands memo keys on the banding identity: two configs don't alias") {
    // a deliberately different banding over the same corpus dir: one
    // band whose hash is the doc's first shingle hash
    val coarse: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      sh => sh.filter(size(col("hs")) >= 1)
        .select(col("doc_id"), lit(0).as("b"),
          element_at(col("hs"), 1).cast("string").as("h"))
    val std = SignatureStore.bands(spark, sfDir, "minhash-b8r4",
      Dedup.bandsFrom)
    val alt = SignatureStore.bands(spark, sfDir, "first-shingle",
      coarse)
    // before the fix the second call silently received the first
    // relation; the two bandings must differ structurally
    assert(std.select("b").distinct().count() == Dedup.numBands.toLong)
    assert(alt.select("b").distinct().count() == 1L)
    // and a repeat call with the same id must hit the memo (same ref)
    assert(SignatureStore.bands(spark, sfDir, "first-shingle", coarse)
      eq alt)
    SignatureStore.release(spark, sfDir)
  }

  test("idle store: empty watch dir is a no-op, empty store reads as 0 rows") {
    val watch = Files.createTempDirectory("graft_idle_watch").toString
    val store = Files.createTempDirectory("graft_idle_store").toString
    // first poll before any arrival: must not throw
    SignatureStore.catchUp(spark, watch, store)
    SignatureStore.catchUpEmbeddings(spark, watch, store)
    // a store with no committed batch answers with zero rows
    assert(SignatureStore.storedShingles(spark, store).count() == 0)
    assert(SignatureStore.storedBands(spark, store).count() == 0)
    assert(SignatureStore.storedCells(spark, store).count() == 0)
    assert(SignatureStore.storedCandidates(spark, store).count() == 0)
    assert(SignatureStore.storedAnnCandidates(spark, store).count() == 0)
  }

  test("store dirs as URIs: file: scheme probes and reads like a local path") {
    // the emptiness probe must go through the Hadoop FileSystem API -
    // with a java.io.File probe a URI-form store dir (file:, hdfs:,
    // s3a:) silently read as EMPTY even when it held data
    val watch = Files.createTempDirectory("graft_uri_watch").toString
    val store = Files.createTempDirectory("graft_uri_store").toString
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    docs.limit(8).coalesce(1).write.mode("append").parquet(watch)
    // catch up addressing BOTH dirs by file: URI, then read back by URI
    SignatureStore.catchUp(spark, s"file:$watch", s"file:$store")
    assert(SignatureStore.storedShingles(spark, s"file:$store").count() == 8)
    assert(SignatureStore.storedBands(spark, s"file:$store").count() > 0)
    // and an idle URI-form watch dir is still a clean no-op
    val idle = Files.createTempDirectory("graft_uri_idle").toString
    SignatureStore.catchUp(spark, s"file:$idle", s"file:$store")
    assert(SignatureStore.storedShingles(spark, s"file:$store").count() == 8)
  }

  test("stored source cap: early docs re-rank under the evolved LM, " +
       "caught-up store == one-shot cap") {
    val watch = Files.createTempDirectory("graft_scap_watch").toString
    val store = Files.createTempDirectory("graft_scap_store").toString
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$watch/_stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watch, name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def capSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    land(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "a1.parquet")
    SignatureStore.catchUpLm(spark, watch, store)
    val afterFirst = capSet(SignatureStore.storedSourceCap(spark, store))
    land(docs.filter(pmod(col("doc_id"), lit(2)) === 1), "a2.parquet")
    SignatureStore.catchUpLm(spark, watch, store)
    val full = capSet(SignatureStore.storedSourceCap(spark, store))
    val oneShot = capSet(CorpusOps.sourceCap(spark, sfDir))
    assert(full == oneShot,
      "caught-up store must equal the one-shot per-source cap")
    // the evolving-answer contract: batch-1 docs' nll (and therefore
    // their within-source ranking) is NOT frozen at arrival - the
    // final relation scores them under the grown vocabulary
    val b1Early = afterFirst.map(r => r._2 -> r._3).toMap
    val b1Final = full.filter(r => r._2 % 2 == 0).map(r => r._2 -> r._3)
    assert(b1Final.exists { case (id, nll) =>
      b1Early.get(id).exists(_ != nll) },
      "batch-1 docs should re-score once batch 2 grows the LM")
  }

  test("three faces agree: incremental store == streaming emission == batch") {
    // the streaming face consumes sfDir's documents.parquet in place;
    // the store face replays the same corpus as two appends - both
    // must land on the batch relation's pair set
    val stream = graft.streaming.StreamSum.streamLshCandidates(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = SignatureStore.gatedCandidates(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stream == batch)
    assert(stored == batch)
  }
}
