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

  test("packTokens: segments tile every pack exactly, reconstruct " +
       "every document exactly, and stats agree") {
    val segs = CorpusOps.packTokens(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val L = CorpusOps.packLen
    val nWs = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT)")
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 >= 1L).toMap

    // per pack: segments tile [0, L) with no gap or overlap (the tail
    // pack tiles a prefix)
    val byPack = segs.groupBy(_._1)
    val lastPack = byPack.keys.max
    byPack.foreach { case (p, rows) =>
      val sorted = rows.sortBy(_._3)
      var at = 0L
      sorted.foreach { case (_, _, off, _, len) =>
        assert(off == at, s"pack $p: gap/overlap at $off vs $at")
        at = off + len
      }
      if (p != lastPack) assert(at == L, s"pack $p not full: $at")
    }

    // per doc: segments cover [0, n_ws) contiguously and appear in
    // consecutive packs
    val byDoc = segs.groupBy(_._2)
    assert(byDoc.keySet == nWs.keySet, "every sized doc packed")
    byDoc.foreach { case (d, rows) =>
      val sorted = rows.sortBy(_._4)
      var at = 0L
      sorted.foreach { case (_, _, _, offDoc, len) =>
        assert(offDoc == at, s"doc $d: segment gap at $offDoc vs $at")
        at = offDoc + len
      }
      assert(at == nWs(d), s"doc $d: packed $at of ${nWs(d)} tokens")
      val packs = sorted.map(_._1)
      assert(packs.zip(packs.tail).forall { case (a, b) => b == a + 1 },
        s"doc $d spans non-consecutive packs: ${packs.toSeq}")
    }

    // the stats view agrees with the manifest
    val stats = CorpusOps.packStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(stats.keySet == byPack.keySet)
    byPack.foreach { case (p, rows) =>
      val (nSegs, nToks, full) = stats(p)
      assert(nSegs == rows.length && nToks == rows.map(_._5).sum
        && full == (nToks == L))
    }
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

  test("repeat upsample: per-source epochs replay the quota math; " +
       "epochs are dense; output exceeds the corpus; rerun-stable") {
    val out = CorpusOps.repeatUpsample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // epochs dense 1..copies per doc
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // factor 2.0 redistributes ~2N slots, so the mixture must REPEAT:
    // more output rows than corpus docs, and some doc at epoch >= 2
    assert(out.length > docs.length)
    assert(out.exists(_._3 >= 2L))
    // driver replay of the plan: per-source realized copies within
    // hash-noise of the quota; full epochs are exact (hash-free), so
    // tolerance only covers the fractional cutoff
    val n = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val denom = n.keys.toSeq.sorted
      .map(s => math.sqrt(n(s).toDouble)).sum
    val tgt = math.floor(docs.length * CorpusOps.upsampleFactor)
    val outCounts = out.groupBy(_._2).view.mapValues(_.length).toMap
    n.foreach { case (s, ns) =>
      val quota = math.floor(math.sqrt(ns.toDouble) / denom * tgt).toLong
      val full = quota / ns
      val rem = quota % ns
      val tol = 5 * math.sqrt(rem.max(1L).toDouble)
      val got = outCounts.getOrElse(s, 0).toLong
      assert(got >= full * ns && math.abs(got - quota) <= tol,
        s"source $s: emitted $got vs quota $quota (full $full x $ns)")
      // a source smaller than its sqrt-share must genuinely upsample
      if (quota >= 2L * ns) assert(full >= 2L, s"source $s must repeat")
    }
    val again = CorpusOps.repeatUpsample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("ss_stream_upsample == pipe_repeat_upsample (stateless admission " +
       "under the broadcast plan)") {
    val batch = CorpusOps.repeatUpsample(spark, sfDir).collect()
      .map(_.toString).toSeq
    val streamed = graft.streaming.StreamSum
      .streamUpsample(spark, sfDir).collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("weighted sample: inclusion tracks weight; top-K plan; rerun-stable") {
    val s = spark; import s.implicits._
    // planted two-class corpus: heavy docs carry 50 tokens, light docs
    // 1 token - under Efraimidis-Spirakis, heavy docs must win seats
    // at a far higher rate when only half the corpus fits
    val n = 400
    val docs = (0L until n.toLong).map { i =>
      val txt = if (i % 2 == 0) Seq.fill(50)("w").mkString(" ") else "w"
      (i, txt)
    }.toDF("doc_id", "text")
    val keyed = CorpusOps.sampleWeightedFrom(docs)
      .orderBy(col("skey").desc, col("doc_id")).limit(n / 2)
      .collect().map(_.getLong(0))
    val heavy = keyed.count(_ % 2 == 0)
    val light = keyed.length - heavy
    assert(heavy > light * 2,
      s"50x-weight docs should dominate the sample: heavy=$heavy light=$light")
    // real corpus: exactly K rows, deterministic rerun, ranked output
    val r1 = CorpusOps.sampleWeighted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.length == CorpusOps.wsampleK)
    assert(r1.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
    val r2 = CorpusOps.sampleWeighted(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r1.toSeq == r2.toSeq, "sample must be reproducible")
    // the global top-K must never plan as a full sort
    val plan = CorpusOps.sampleWeighted(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must plan as TakeOrdered:\n$plan")
  }

  test("weighted sample: streaming top-K state merges across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 300 docs with hash-spread weights, delivered in 3 batches: the
    // per-shard buffers must carry earlier batches' winners forward,
    // so the final snapshot equals the one-shot batch selection
    val all = (0L until 300L).map { i =>
      (i, Seq.fill((i % 37 + 1).toInt)("w").mkString(" "))
    }
    val mem = MemoryStream[(Long, String)]
    val agg = graft.functions.TopKSampleAgg(50)
    val perShard = CorpusOps.sampleWeightedFrom(
        mem.toDF().toDF("doc_id", "text"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1 % 8)
      .agg(agg.toColumn.name("topk"))
    val q = perShard.toDF("shard", "topk").writeStream.format("memory")
      .queryName("wsample_mb").outputMode(OutputMode.Complete()).start()
    all.grouped(100).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("wsample_mb")
      .select(explode(col("topk")).as("r"))
      .select(col("r._1").as("doc_id"), col("r._3").as("skey"))
      .orderBy(col("skey").desc, col("doc_id")).limit(50)
      .collect().map(_.getLong(0)).toSeq
    val batch = CorpusOps.sampleWeightedFrom(all.toDF("doc_id", "text"))
      .orderBy(col("skey").desc, col("doc_id")).limit(50)
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == batch,
      "multi-batch streaming top-K must equal the one-shot batch top-K")
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

  test("split: deterministic, append-stable, content-independent, " +
       "shuffle-free") {
    val full = CorpusOps.split(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.values.toSet == Set("train", "val"),
      "both splits must be populated on the fixture")
    // append-stability: the same docs in a half-sized corpus keep
    // their assignment (the split is a pure function of doc_id)
    val dir = java.nio.file.Files.createTempDirectory("graft_split").toString
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val half = CorpusOps.split(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s },
      "an append must never move an existing doc across the split")
    // shuffle-free: a narrow projection, no Exchange except the
    // presentation sort
    val plan = CorpusOps.split(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"split must not shuffle:\n$plan")
  }

  test("source cap: per-source best-k by nll, runs on the bounded heap") {
    val df = CorpusOps.sourceCap(spark, sfDir)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every source capped at k, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.length <= CorpusOps.sourceCapK, s"$src over cap")
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq)
    }
    // equals the window formulation on the same scored relation
    val nll = TextAnalysis.unigramNll(spark, sfDir)
      .select(col("doc_id"), col("nll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("nll"), col("doc_id"))
    val expect = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).join(nll, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CorpusOps.sourceCapK)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("nll"), r.getAs[Int]("rk").toLong)).toSet
    assert(rows.toSet == expect)
    // the custom operator (map-side partial + final heap), not a sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"source cap must run on the custom bounded-heap operator:\n$plan")
  }

  test("token budget: kept set is the exact budget-bounded prefix of " +
       "the per-source quality order; pretrim loses nothing") {
    val df = CorpusOps.tokenBudgetPack(spark, sfDir)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // budget respected, cum is the running sum of the kept prefix
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._5).max <= CorpusOps.tokenBudget, s"$src over budget")
      val ordered = g.sortBy(r => (r._3, r._2))
      assert(ordered.map(_._4).scanLeft(0L)(_ + _).tail.toSeq ==
        ordered.map(_._5).toSeq, s"$src cum not a prefix sum")
    }
    // equals the pure window formulation (no TopKPerKey pretrim):
    // proves the map-side trim admits exactly the same prefix
    val nll = TextAnalysis.unigramNll(spark, sfDir)
      .select(col("doc_id"), col("nll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("nll"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val expect = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), expr(
        "CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT)")
        .as("n_ws"))
      .filter(col("n_ws") >= 1L)
      .join(nll, Seq("doc_id"))
      .withColumn("cum", sum(col("n_ws")).over(w))
      .filter(col("cum") <= CorpusOps.tokenBudget)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("nll"), r.getAs[Long]("n_ws"),
        r.getAs[Long]("cum"))).toSet
    assert(rows.toSet == expect)
  }

  test("curriculum: ord is a permutation, stages are equal-mass and " +
       "monotone easy-to-hard, and within-stage order is the salted " +
       "shuffle, not corpus order") {
    val rows = CorpusOps.curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._1).sorted.toSeq == (1L to n.toLong),
      "ord must be a 1..n permutation")
    assert(rows.map(_._2).distinct.length == n, "every doc exactly once")
    // equal-mass stages from the exact integer rank cut
    val byStage = rows.groupBy(_._3).toSeq.sortBy(_._1)
    assert(byStage.map(_._1) == (0L until CorpusOps.curriculumStages),
      "all stages populated")
    assert(byStage.map(_._2.length).distinct.length <= 2,
      "stage masses differ by at most the remainder")
    // reading in ord order, the stage never decreases and mean
    // difficulty rises stage over stage (easy first)
    assert(rows.sortBy(_._1).map(_._3).sliding(2)
      .forall(p => p(0) <= p(1)), "stage must be monotone in ord")
    val means = byStage.map { case (_, g) =>
      g.map(_._4).sum / g.length }
    assert(means.sliding(2).forall(p => p(0) < p(1)),
      "mean NLL must rise across stages")
    // within a stage the read order is the salted shuffle: it must not
    // replay doc_id order (the anti-clustering property)
    val s0 = rows.filter(_._3 == 0L).sortBy(_._1).map(_._2).toSeq
    assert(s0 != s0.sorted, "stage 0 must not read in corpus order")
  }

  test("adaptive bloom fpp holds the per-document false-flag target") {
    // a p95-length doc's false-flag chance is ~grams x fpp: the
    // adaptive fpp must keep that product at the target across length
    // regimes, within the clamp range
    for (grams <- Seq(10.0, 56.0, 500.0, 5000.0)) {
      val fpp = CorpusOps.adaptiveFpp(grams)
      assert(grams * fpp <= CorpusOps.bloomDocFpTarget * 1.0001,
        s"doc false-flag rate ${grams * fpp} above target at $grams grams")
    }
    assert(CorpusOps.adaptiveFpp(1.0) == 0.001)        // cap
    assert(CorpusOps.adaptiveFpp(1e9) == 1e-8)         // floor
  }
}
