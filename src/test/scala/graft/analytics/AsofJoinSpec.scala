package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("as-of picks the latest right row at or before each left time") {
    val r = AsofJoin.qAsof(spark, sfDir)
    assert(r.count() == 1000) // every event row survives (left join)
    // matched order date never exceeds the event time
    assert(r.filter(col("matched_rt") > col("t")).count() == 0)
    // users with any order history must match (orders span 1995-2001,
    // events 2024)
    val matched = r.filter(col("matched_order").isNotNull)
    assert(matched.count() > 0)
  }

  test("attribution: lookback boundary is inclusive, staleness nulls out") {
    val s = spark; import s.implicits._
    val tol = AsofJoin.attributionLookbackUs
    // user 1: view exactly at the lookback edge (inclusive -> credited)
    // user 2: view one µs past the edge (stale -> not credited)
    // user 3: view AFTER the purchase (no candidate at all)
    // user 4: two views in window - the LATEST one is credited
    val ev = Seq(
      (1L, 0L, 10L, "view"), (1L, tol, 11L, "purchase"),
      (2L, 0L, 20L, "view"), (2L, tol + 1L, 21L, "purchase"),
      (3L, 5L, 31L, "purchase"), (3L, 6L, 30L, "view"),
      (4L, 100L, 40L, "view"), (4L, 200L, 41L, "view"),
      (4L, 250L, 42L, "purchase")
    ).toDF("k", "rt", "event_id", "event_type")
    val got = AsofJoin.attributionFrom(ev).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toMap
    assert(got(11L) == (Some(10L), true), "edge view must be credited")
    assert(got(21L) == (None, false), "stale view must null out")
    assert(got(31L) == (None, false), "future view is no candidate")
    assert(got(42L) == (Some(41L), true), "latest in-window view wins")
  }

  test("corpus clean output is a quality-gated subset of canonical docs") {
    import graft.pipeline.{CorpusClean, Dedup}
    val cleaned = CorpusClean(spark, sfDir)
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    val canonical = Dedup.exact(spark, sfDir)
      .filter(col("is_canonical")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(canonical))
    assert(cleaned.filter(col("quality") < CorpusClean.minQuality).count() == 0)
    assert(cleaned.filter(col("n_tokens") < CorpusClean.minTokens).count() == 0)
    // near-dup losers are gone
    val losers = Dedup.ngramJaccard(spark, sfDir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(ids.intersect(losers).isEmpty)
  }
}
