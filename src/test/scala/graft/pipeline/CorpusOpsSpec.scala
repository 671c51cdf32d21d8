package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  test("vocab: top-k terms, plan is TakeOrdered not a global sort") {
    val df = CorpusOps.vocab(spark, sfDir)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= CorpusOps.vocabK)
    // descending frequency, ties by term
    assert(rows.sliding(2).forall { case Array((t1, f1), (t2, f2)) =>
      f1 > f2 || (f1 == f2 && t1 < t2) })
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must plan as TakeOrdered:\n$plan")
  }

  test("decontaminate: planted overlaps flagged; benchmark set broadcasts") {
    val df = CorpusOps.decontaminate(spark, "/root/testdata/sf0.01")
    val rows = df.collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(rows.forall(_._1 >= CorpusOps.benchmarkDocs))
    val contaminated = rows.filter(_._2).map(_._1)
    assert(contaminated.nonEmpty,
      "planted near-dups must contaminate against the benchmark half")
    assert(contaminated.length < rows.length / 2,
      "most of the corpus should be clean")
    // a contaminated doc genuinely shares a 5-gram with a benchmark doc
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.01",
        "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String): Set[String] =
      s.split("\\s+").sliding(CorpusOps.decontamN)
        .map(_.mkString(" ")).toSet
    val benchGrams = docs.filter(_._1 < CorpusOps.benchmarkDocs)
      .values.flatMap(grams).toSet
    assert(grams(docs(contaminated.head)).exists(benchGrams.contains))
    // plan: the benchmark hash set broadcasts; no corpus-wide SMJ
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark set must broadcast:\n$plan")
  }

  test("pack: bins respect the token budget up to one spill doc") {
    val r = CorpusOps.pack(spark, sfDir).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3))))
    val docs = graft.core.Graft.table(spark, sfDir, "documents").count()
    assert(r.map(_._2._1).distinct.length.toLong == docs,
      "every doc packed exactly once")
    r.groupBy(_._1).foreach { case ((shard, bin), rows) =>
      val toks = rows.map(_._2._2)
      // a bin's exclusive-prefix start is inside [bin*B, (bin+1)*B), so
      // its token sum is < budget + its largest (spilling) doc
      assert(toks.sum < CorpusOps.packBudget + toks.max,
        s"bin ($shard,$bin) overfilled: ${toks.sum}")
    }
    // deterministic rerun
    val r2 = CorpusOps.pack(spark, sfDir).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3))))
    assert(r.toSeq == r2.toSeq)
  }

  test("shuffle: every doc exactly once, deterministic, shards used") {
    val r1 = CorpusOps.shuffle(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val r2 = CorpusOps.shuffle(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r1.toSeq == r2.toSeq, "shuffle must be reproducible")
    val docs = graft.core.Graft.table(spark, sfDir, "documents").count()
    assert(r1.map(_._3).distinct.length.toLong == docs)
    assert(r1.map(_._1).distinct.length == CorpusOps.shardsFor(spark))
    // positions are dense 1..n within each shard
    r1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // and the order within a shard is not the doc_id order (it shuffles)
    val shard0 = r1.filter(_._1 == r1.head._1).sortBy(_._2).map(_._3)
    assert(shard0.toSeq != shard0.sorted.toSeq)
  }

  test("mix: sqrt-temperature flattens source shares, deterministically") {
    val sel = CorpusOps.mix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(sel.toSet.subsetOf(docs.toSet))
    // roughly mixFraction of the corpus survives (hash-threshold is
    // approximate; floor-quotas bias slightly low)
    assert(sel.length > docs.length * 0.3 && sel.length < docs.length * 0.6)
    // temperature flattening: the LARGEST source's share of the mix
    // must be below its share of the corpus (big population → sampling
    // noise can't mask the effect), and every source's realized count
    // must sit within sampling noise of its sqrt-temperature quota
    val corpusShare = docs.groupBy(_._2).view.mapValues(
      _.length.toDouble / docs.length).toMap
    val mixShare = sel.groupBy(_._2).view.mapValues(
      _.length.toDouble / sel.length).toMap
    val biggest = corpusShare.maxBy(_._2)._1
    assert(mixShare(biggest) < corpusShare(biggest),
      s"biggest source must shrink: ${mixShare(biggest)} vs ${corpusShare(biggest)}")
    val n = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val denom = n.keys.toSeq.sorted
      .map(s => math.sqrt(n(s).toDouble)).sum
    val tgt = math.floor(docs.length * CorpusOps.mixFraction)
    val selCounts = sel.groupBy(_._2).view.mapValues(_.length).toMap
    n.foreach { case (s, ns) =>
      val quota = math.floor(math.sqrt(ns.toDouble) / denom * tgt)
      val tol = 5 * math.sqrt(quota.max(1.0))
      assert(math.abs(selCounts.getOrElse(s, 0) - quota) <= tol,
        s"source $s: selected ${selCounts.getOrElse(s, 0)} vs quota $quota")
    }
    // deterministic rerun
    val again = CorpusOps.mix(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(sel.toSeq == again.toSeq)
  }

  test("shuffle/pack shard count scales with the session's parallelism") {
    // default tracks defaultParallelism (a constant would leave
    // corpus/8 rows per reducer at 100 TB)
    assert(CorpusOps.shardsFor(spark) ==
      spark.sparkContext.defaultParallelism)
    // conf override wins - the production knob
    spark.conf.set("graft.shuffle.shards", "3")
    try {
      assert(CorpusOps.shardsFor(spark) == 3)
      val shards = CorpusOps.shuffle(spark, sfDir).collect()
        .map(_.getLong(0)).distinct
      assert(shards.length == 3)
      // explicit shard argument (the parity path) beats both
      val fixed = CorpusOps.shuffle(spark, sfDir, CorpusOps.oracleShards)
        .collect().map(_.getLong(0)).distinct
      assert(fixed.length == CorpusOps.oracleShards)
    } finally spark.conf.unset("graft.shuffle.shards")
  }
}
