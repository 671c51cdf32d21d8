package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental SignatureStore maintenance: appending a file to the
  * corpus updates the persistent signature store without recomputing
  * existing documents, and the store's candidate pairs match the batch
  * oracle once caught up.
  */
class IncrementalSignatureSpec extends SparkSpec {

  /** Land `df` as a single flat parquet file `$dir/$name` (the shape a
    * corpus-append drops: one new file in the watched directory).
    */
  private def land(df: org.apache.spark.sql.DataFrame, dir: String,
                   name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_inc_tmp").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(dir, name))
  }

  test("catchUp appends only new files' signatures; candidates == batch") {
    val watch = Files.createTempDirectory("graft_inc_watch").toString
    val store = Files.createTempDirectory("graft_inc_store").toString
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val mid = 250L

    // corpus state 1: first half arrives
    land(docs.filter(col("doc_id") < mid), watch, "docs1.parquet")
    SignatureStore.catchUp(spark, watch, store)
    val bandsAfter1 = SignatureStore.storedBands(spark, store).count()
    val docsAfter1 = SignatureStore.storedShingles(spark, store)
      .select("doc_id").distinct().count()
    // the store keeps every tokenizable doc (>= 1 token): sub-3-token
    // docs have empty shingle arrays but real token hashes (SimHash)
    assert(docsAfter1 == docs.filter(col("doc_id") < mid)
      .filter(size(expr("regexp_extract_all(text, '\\\\S+', 0)")) >= 1)
      .count())

    // corpus state 2: second half appended → ONLY the new docs are
    // signed (store grows by exactly the new docs' bands; the first
    // half's rows are byte-identical, not recomputed)
    land(docs.filter(col("doc_id") >= mid), watch, "docs2.parquet")
    SignatureStore.catchUp(spark, watch, store)
    val stored = SignatureStore.storedBands(spark, store)
    val newDocBands = Dedup.bandsFrom(Dedup.shinglesFrom(
      docs.filter(col("doc_id") >= mid))).count()
    assert(stored.count() == bandsAfter1 + newDocBands,
      "second catch-up must append exactly the new docs' bands")
    assert(stored.filter(col("doc_id") < mid).count() == bandsAfter1)

    // idempotent: nothing new → nothing appended (checkpointed file log)
    SignatureStore.catchUp(spark, watch, store)
    assert(SignatureStore.storedBands(spark, store).count()
      == bandsAfter1 + newDocBands)

    // crash-replay idempotence: simulate a failure AFTER the batch's
    // writes but BEFORE its checkpoint commit by deleting the newest
    // commit marker - the restarted stream re-executes that batch from
    // its recorded offsets, and the batch=<id> partition overwrite must
    // leave the store unchanged (a blind append would duplicate it)
    val commits = new java.io.File(s"$store/_checkpoint/commits")
      .listFiles().filter(_.getName.forall(_.isDigit)).sortBy(_.getName)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete() // local ChecksumFs sidecar
    SignatureStore.catchUp(spark, watch, store)
    assert(SignatureStore.storedBands(spark, store).count()
      == bandsAfter1 + newDocBands,
      "replayed batch must overwrite its partition, not append duplicates")
    assert(SignatureStore.storedShingles(spark, store)
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count() == 0,
      "no doc may hold duplicate shingle rows after replay")

    // caught-up store == the batch candidate oracle over the full corpus
    val inc = SignatureStore.storedCandidates(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == batch)
  }

  test("catchUpSpans: cross-batch repeats caught by summed partials") {
    val watch = Files.createTempDirectory("graft_span_watch").toString
    val store = Files.createTempDirectory("graft_span_store").toString
    val s = spark; import s.implicits._
    val boiler = "all rights reserved by the publisher"
    // each batch alone holds NO repeated 5-gram (per-batch partial
    // counts are all 1); only the store-wide sum reveals the repeat -
    // exactly the property a per-batch-local dup check would miss
    val batchA = Seq((1L, s"a1 a2 a3 $boiler a4")).toDF("doc_id", "text")
    val batchB = Seq((2L, s"b1 b2 $boiler b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6")).toDF("doc_id", "text")

    land(batchA, watch, "arrival1.parquet")
    SignatureStore.catchUpSpans(spark, watch, store)
    val cov1 = SignatureStore.storedDupSpans(spark, store)
    assert(cov1.filter(col("covered_tokens") > 0).count() == 0,
      "a single arrival with unique grams must show zero coverage")

    land(batchB, watch, "arrival2.parquet")
    SignatureStore.catchUpSpans(spark, watch, store)
    val cov2 = SignatureStore.storedDupSpans(spark, store)
      .select("doc_id", "covered_tokens")
      .as[(Long, Long)].collect().toMap
    assert(cov2 == Map(1L -> 6L, 2L -> 6L, 3L -> 0L),
      s"cross-batch boilerplate must be fully covered, got $cov2")

    // caught-up store == the one-shot batch relation on the union
    val batch = Dedup.dupSpansFrom(batchA.union(batchB))
      .select("doc_id", "covered_tokens")
      .as[(Long, Long)].collect().toMap
    assert(cov2 == batch)

    // idempotent: nothing new -> nothing changes
    SignatureStore.catchUpSpans(spark, watch, store)
    assert(SignatureStore.storedDupSpans(spark, store)
      .filter(col("covered_tokens") > 0).count() == 2)

    // third-face parity: the streaming admission scrub over the same
    // corpus (landed as documents.parquet) must agree with the store's
    // coverage - the covered token count per doc is face-independent
    val corpusDir = Files.createTempDirectory("graft_span_corpus").toString
    land(batchA.union(batchB), corpusDir, "documents.parquet")
    val streamed = graft.streaming.StreamSum
      .streamSpanScrub(spark, corpusDir)
      .select("doc_id", "n_removed")
      .as[(Long, Long)].collect().toMap
    assert(streamed == cov2,
      s"streaming face disagrees with the incremental store: $streamed")
  }

  test("catchUpLm: earlier batches are re-scored under the evolved LM") {
    val watch = Files.createTempDirectory("graft_lm_watch").toString
    val store = Files.createTempDirectory("graft_lm_store").toString
    val s = spark; import s.implicits._
    // batch A's doc uses the term "zq" that is globally rare until
    // batch B floods the vocabulary with OTHER terms: the denominator
    // (n_total + v_size) grows, so doc 1's NLL must CHANGE after the
    // second append even though doc 1 itself never re-arrives - the
    // property a score-at-append-time store would get wrong
    val batchA = Seq((1L, ("zq " * 40).trim)).toDF("doc_id", "text")
    val batchB = (2L to 4L).map(i =>
      (i, (s"w$i " * 40).trim)).toDF("doc_id", "text")

    land(batchA, watch, "arrival1.parquet")
    SignatureStore.catchUpLm(spark, watch, store)
    val nll1 = SignatureStore.storedQualityGate(spark, store)
      .filter(col("doc_id") === 1L).collect()(0).getDouble(6)

    land(batchB, watch, "arrival2.parquet")
    SignatureStore.catchUpLm(spark, watch, store)
    val after = SignatureStore.storedQualityGate(spark, store)
    val nll1After = after.filter(col("doc_id") === 1L)
      .collect()(0).getDouble(6)
    assert(nll1After != nll1,
      "batch-1 doc's NLL must reflect the LM grown by batch 2")

    // caught-up store == the one-shot gate over the union, column for
    // column (signals, nll, verdict)
    val stored = after.collect().map(_.toSeq).toSeq
    val oneShot = {
      val dir = Files.createTempDirectory("graft_lm_corpus").toString
      land(batchA.union(batchB), dir, "documents.parquet")
      QualityGate(spark, dir).collect().map(_.toSeq).toSeq
    }
    assert(stored == oneShot)

    // idempotent: nothing new -> nothing changes
    SignatureStore.catchUpLm(spark, watch, store)
    assert(SignatureStore.storedQualityGate(spark, store)
      .collect().map(_.toSeq).toSeq == stored)
  }

  test("catchUpLm2: earlier batches re-scored under the evolved bigram LM") {
    val watch = Files.createTempDirectory("graft_lm2_watch").toString
    val store = Files.createTempDirectory("graft_lm2_store").toString
    val s = spark; import s.implicits._
    // batch A's doc repeats one PAIR; batch B floods the pair
    // vocabulary with unrelated pairs - c(w1,w2) for doc 1 is
    // unchanged but V (unigram vocab) grows, so doc 1's bigram NLL
    // must change without doc 1 re-arriving
    val batchA = Seq((1L, ("zq yx " * 20).trim)).toDF("doc_id", "text")
    val batchB = (2L to 4L).map(i =>
      (i, (s"u$i v$i " * 20).trim)).toDF("doc_id", "text")

    land(batchA, watch, "arrival1.parquet")
    SignatureStore.admitLm2(spark, watch, store)
    val nll1 = SignatureStore.storedBigramNll(spark, store)
      .filter(col("doc_id") === 1L).collect()(0).getDouble(2)

    land(batchB, watch, "arrival2.parquet")
    SignatureStore.admitLm2(spark, watch, store)
    val after = SignatureStore.storedBigramNll(spark, store)
    val nll1After = after.filter(col("doc_id") === 1L)
      .collect()(0).getDouble(2)
    assert(nll1After != nll1,
      "batch-1 doc's bigram NLL must reflect the LM grown by batch 2")

    // the arrival-time admission record is immutable: batch 0's
    // persisted score is the score OF ITS MOMENT (== nll1), even
    // though the doc's current score has since evolved
    val admitted = spark.read
      .parquet(s"$store/lm2_admissions/batch=0")
      .filter(col("doc_id") === 1L).collect()(0).getDouble(2)
    assert(admitted == nll1 && admitted != nll1After,
      s"admission must keep the arrival-time score: $admitted vs $nll1")

    // caught-up store == the one-shot batch face over the union
    val stored = after.collect().map(_.toSeq).toSeq
    val oneShot = TextAnalysis.bigramNllFrom(batchA.union(batchB))
      .collect().map(_.toSeq).toSeq
    assert(stored == oneShot)

    // idempotent: nothing new -> nothing changes
    SignatureStore.catchUpLm2(spark, watch, store)
    assert(SignatureStore.storedBigramNll(spark, store)
      .collect().map(_.toSeq).toSeq == stored)
  }

  test("admitLm: admission verdicts use the LM of their moment; " +
       "a vocabulary-growing batch changes an earlier doc's score") {
    val watch = Files.createTempDirectory("graft_adm_watch").toString
    val store = Files.createTempDirectory("graft_adm_store").toString
    val s = spark; import s.implicits._
    def gateOver(dfs: org.apache.spark.sql.DataFrame*): Map[Long, Double] = {
      val dir = Files.createTempDirectory("graft_adm_corpus").toString
      land(dfs.reduce(_ union _), dir, "documents.parquet")
      QualityGate(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    }
    val batchA = Seq((1L, ("zq " * 40).trim)).toDF("doc_id", "text")
    val batchB = (2L to 4L).map(i =>
      (i, (s"w$i " * 40).trim)).toDF("doc_id", "text")

    land(batchA, watch, "arrival1.parquet")
    SignatureStore.admitLm(spark, watch, store)
    def admitted(batch: Long): Map[Long, Double] =
      spark.read.parquet(s"$store/lm_admissions/batch=$batch")
        .select("doc_id", "nll").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch 0's admission == the one-shot gate over what had arrived
    val adm0 = admitted(0L)
    assert(adm0 == gateOver(batchA))

    land(batchB, watch, "arrival2.parquet")
    SignatureStore.admitLm(spark, watch, store)
    // batch 1 docs are admitted under the LM INCLUDING their own batch
    val unionGate = gateOver(batchA, batchB)
    assert(admitted(1L) == unionGate.view.filterKeys(_ >= 2L).toMap)
    // the earlier doc's admission record is immutable history...
    assert(admitted(0L) == adm0)
    // ...but its CURRENT score evolved with the vocabulary, and the
    // re-scoring matches the one-shot union gate exactly
    val now = SignatureStore.storedQualityGate(spark, store).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(now(1L) != adm0(1L),
      "doc 1 must re-score under the grown vocabulary")
    assert(now == unionGate)
  }

  test("catchUpEventSketches: partials merge to the one-shot sketch") {
    import graft.analytics.Sketches
    val watch = Files.createTempDirectory("graft_sk_watch").toString
    val store = Files.createTempDirectory("graft_sk_store").toString
    val ev = graft.core.Graft.table(spark, sfDir, "events")
    land(ev.filter(col("event_id") % 2 === 0), watch, "a1.parquet")
    SignatureStore.catchUpEventSketches(spark, watch, store)
    land(ev.filter(col("event_id") % 2 === 1), watch, "a2.parquet")
    SignatureStore.catchUpEventSketches(spark, watch, store)
    // CMS: summed partials == the one-shot counter matrix (additive)
    val merged = spark.read.parquet(s"$store/cms_part").drop("batch")
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("c"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val oneShot = Sketches.cmsCounters(ev.select(col("user_id")))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(merged == oneShot)
    // KMV: re-minimized union of per-batch buffers == one-shot buffer
    val kMerged = Sketches.kmvSets(
        spark.read.parquet(s"$store/kmv_part").drop("batch")
          .select(col("event_type"), explode(col("ks")).as("h")).distinct())
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val kOne = Sketches.kmvSets(Sketches.kmvHashes(ev))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(kMerged == kOne)
    // idempotent: nothing new -> nothing changes
    SignatureStore.catchUpEventSketches(spark, watch, store)
    assert(spark.read.parquet(s"$store/cms_part").drop("batch")
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("c"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap == oneShot)
  }

  test("catchUpEmbeddings: incremental cells match batch ANN blocking") {
    val watch = Files.createTempDirectory("graft_emb_watch").toString
    val store = Files.createTempDirectory("graft_emb_store").toString
    val embs = graft.core.Graft.table(spark, sfDir, "embeddings")
    val mid = 250L

    land(embs.filter(col("vec_id") < mid), watch, "emb1.parquet")
    SignatureStore.catchUpEmbeddings(spark, watch, store)
    val cells1 = SignatureStore.storedCells(spark, store).count()
    assert(cells1 == embs.filter(col("vec_id") < mid).count())

    land(embs.filter(col("vec_id") >= mid), watch, "emb2.parquet")
    SignatureStore.catchUpEmbeddings(spark, watch, store)
    assert(SignatureStore.storedCells(spark, store).count() == embs.count(),
      "second catch-up must add exactly the new vectors' cells")

    // caught-up same-cell pairs == the batch (label, bucket) blocking
    val inc = SignatureStore.storedAnnCandidates(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = embs.withColumn("bucket",
      expr(Similarity.bucketSpark("embedding")))
    val batch = e.as("x").join(e.as("y"),
        col("x.label") === col("y.label") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        col("x.label").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == batch)
  }
}
