package graft.core

import graft.SparkSpec
import graft.pipeline.{Dedup, SignatureStore}

/** Lifecycle of the per-(session, corpus) memoized relations: a session
  * that walks many corpora must be able to release what it cached, and
  * iterative operators must not leak their per-round intermediates.
  */
class MemoLifecycleSpec extends SparkSpec {

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("Transform.release drops the memoized relation for a corpus") {
    Transform.releaseAll(spark)
    SignatureStore.releaseAll(spark)
    val before = persistedCount
    Transform.transformed(spark, sfDir).count()
    assert(persistedCount > before, "transformed must persist its memo")
    Transform.release(spark, sfDir)
    assert(persistedCount == before,
      "release must unpersist the corpus's memoized relation")
    // releasing again is a no-op; re-deriving re-populates
    Transform.release(spark, sfDir)
    Transform.transformed(spark, sfDir).count()
    assert(persistedCount > before)
    Transform.releaseAll(spark)
    assert(persistedCount == before)
  }

  test("SignatureStore.releaseAll drops shingles and bands") {
    SignatureStore.releaseAll(spark)
    val before = persistedCount
    Dedup.minhashLsh(spark, sfDir).count()
    assert(persistedCount >= before + 2,
      "lsh must populate the shingle + band memos")
    SignatureStore.releaseAll(spark)
    assert(persistedCount == before)
  }

  test("centroid memo canonicalizes corpus-dir spellings to one entry") {
    graft.pipeline.Similarity.releaseAll(spark)
    val canonical = graft.pipeline.Similarity.trainedCentroidsFor(spark, sfDir)
    // trailing slash, dot segment, relative-style round trip: all must
    // resolve to the SAME memo entry - reference identity proves no
    // second training ran
    for (spelling <- Seq(s"$sfDir/", s"$sfDir/./",
        s"${new java.io.File(sfDir).getParent}/../testdata/sf0.001")) {
      val again = graft.pipeline.Similarity.trainedCentroidsFor(spark, spelling)
      assert(again eq canonical,
        s"'$spelling' trained a second centroid matrix instead of " +
          "hitting the canonical memo entry")
    }
    graft.pipeline.Similarity.releaseAll(spark)
  }

  test("dupClusters releases its per-round intermediates") {
    SignatureStore.release(spark, sfDir)
    Dedup.dupClusters(spark, sfDir).count()
    val afterFirst = persistedCount
    // a second run may add its own (small, GC-managed) checkpointed
    // result, but none of the per-round label/sym persists may survive
    Dedup.dupClusters(spark, sfDir).count()
    assert(persistedCount <= afterFirst + 1,
      "iteration intermediates leaked across dupClusters calls")
    SignatureStore.release(spark, sfDir)
  }
}
