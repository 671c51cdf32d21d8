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
