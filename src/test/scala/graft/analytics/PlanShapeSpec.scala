package graft.analytics

import graft.SparkSpec

/** Plan-shape guarantees the 100 TB posture depends on, asserted so a
  * refactor can't silently regress them (complements PLANS.md).
  */
class PlanShapeSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q1: filter and projection reach the parquet scan") {
    val plan = executed(Tpch.q1(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!plan.contains("l_orderkey"), "column pruning failed: read a column q1 never uses")
  }

  test("q3/q5: every dimension joins as a broadcast") {
    val p3 = executed(Tpch.q3(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"))
    assert(!p3.contains("SortMergeJoin"))
    val p5 = executed(Tpch.q5(spark, sfDir))
    // AQE's final-plan rendering repeats join nodes; require at least
    // the five dimension joins and no sort-merge anywhere
    assert(p5.linesIterator.count(_.contains("BroadcastHashJoin")) >= 5)
    assert(!p5.contains("SortMergeJoin"))
  }

  test("ann brute force: corpus side is never shuffled before scoring") {
    val plan = executed(graft.pipeline.Similarity.annTopKBrute(spark, sfDir))
    // the only hash exchanges are the rank window (q_id) + final sort;
    // the corpus reaches the join via scan (+ round-robin spread), not
    // a keyed shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastHashJoin"))
  }

  test("ann_range: probe join broadcasts, and no rank-window exchange " +
       "exists at all") {
    val plan = executed(graft.pipeline.Similarity.annRange(spark, sfDir))
    // the range face's whole point: same probe join as ann_ivf but the
    // per-query top-k window (its q_id hash exchange) is GONE - the
    // only exchange left is the final output sort
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastNestedLoopJoin"),
      s"probes must broadcast onto the assignment scan:\n$plan")
    // no per-query ranking over the CANDIDATE stream: the only ranking
    // operators (Window / the TopKPerKey pair the window rewrite
    // lowers them to) are the tiny probe-set ranking, which the top-k
    // control ALSO carries - so the control must show strictly more
    // ranking nodes (its candidate top-k) than the range face
    def ranks(p: String) = p.linesIterator.count(l =>
      l.contains("Window") || l.contains("TopK"))
    val topk = executed(graft.pipeline.Similarity.annIvf(spark, sfDir))
    assert(ranks(topk) > ranks(plan),
      s"range face must rank strictly less than top-k: " +
        s"${ranks(plan)} vs ${ranks(topk)}\n$plan")
  }

  test("xcorr: lag alignment is a hash/merge equi-join, never a " +
       "nested-loop (the r11 19x regression shape)") {
    val plan = executed(graft.analytics.TimeSeries.qXcorr(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"lag join degenerated to a nested loop:\n$plan")
  }

  test("q4: EXISTS plans as a semi join with both filters pushed") {
    val plan = executed(Tpch.q4SemiJoin(spark, sfDir))
    assert(plan.contains("LeftSemi") || plan.contains("Semi"),
      s"expected a semi join:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"),
      s"returned-flag filter must reach the lineitem scan:\n$plan")
    assert(plan.contains("IsNotNull(o_orderdate)"),
      s"date filter must reach the orders scan:\n$plan")
  }

  test("ivf assignment: zero exchange between scan and argmax") {
    import org.apache.spark.sql.functions.col
    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val plan = executed(graft.pipeline.Similarity.ivfAssign(e))
    assert(!plan.contains("Exchange"),
      s"centroid assignment must be a narrow scan:\n$plan")
  }

  test("ivf scoring: no corpus re-shuffle on vec_id after assignment") {
    val plan = executed(graft.pipeline.Similarity.annIvf(spark, sfDir))
    // assignment carries the embedding, probes broadcast onto the
    // corpus side: the only hash exchanges are the bounded per-query
    // top-k window (q_id) + final sort - never a corpus-wide join
    // keyed on vec_id to re-fetch the embedding
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus must not be re-shuffled on vec_id to re-attach columns:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastNestedLoopJoin"),
      s"probes must broadcast onto the assignment scan:\n$plan")
  }

  test("column pruning pushes through the custom TopKPerKey node") {
    import org.apache.spark.sql.functions.col
    val li = graft.core.Graft.table(spark, sfDir, "lineitem")
    val r = graft.plans.TopK.perKey(li, Seq("l_returnflag"),
        Seq(("l_quantity", false), ("l_orderkey", true)), 2)
      .select(col("l_returnflag"), col("rk"))
    val plan = executed(r)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
           readSchema.contains("l_quantity") &&
           readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads columns the top-k never uses:\n$readSchema")
  }

  test("dedup verification join runs on candidates, not all pairs") {
    val plan = executed(graft.pipeline.Dedup.ngramJaccard(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      "jaccard must join LSH candidates, never cross the corpus")
  }

  test("bloom decontamination: codegen'd prune, verify join broadcasts") {
    // judge the FINAL plan only: the barrier'd relations have no
    // static stats, so AQE's initial plan legitimately starts
    // sort-merge and converts to broadcast at runtime
    val plan = executed(
      graft.pipeline.CorpusOps.decontaminateBloom(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(plan.contains("graft_bloom_any"),
      s"bloom prune missing from the plan:\n$plan")
    // the exact verification must join the (tiny) maybe set against the
    // broadcast bench relation - a sort-merge join would mean the
    // corpus-sized gram stream is being shuffled for the check
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams shuffled for the verification join:\n$plan")
  }

  test("repetition: fully narrow - no keyed shuffle at all") {
    val plan = executed(
      graft.pipeline.TextAnalysis.repetition(spark, sfDir))
    assert(plan.contains("graft_dup_ngrams"),
      s"in-row dup-trigram computation missing:\n$plan")
    assert(plan.contains("graft_top_bigram"),
      s"in-row bigram mode missing:\n$plan")
    // the only allowed exchanges are the parallelism spread
    // (round-robin) and the presentation sort (range); a
    // hashpartitioning would mean the mode went relational again
    assert(!plan.contains("hashpartitioning"),
      s"per-doc computation shuffled on a key:\n$plan")
  }

  test("range join: banding plans a hash join, never a nested loop") {
    val plan = executed(RangeJoin(spark, sfDir))
    // the banding rewrite must give Catalyst an equi-key; a
    // BroadcastNestedLoopJoin or cartesian product means the rewrite
    // regressed to the O(n*m) inequality-join plan
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join planned as a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"range join planned as a cartesian product:\n$plan")
  }

  test("range join: banding == the naive inequality join") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Graft.table(spark, sfDir, "events")
      .select(col("event_id"), expr("graft_ts_us(ts)").as("t"))
    val naive = e.as("a")
      .join(e.as("b"), col("b.t") > col("a.t") &&
        col("b.t") <= col("a.t") + RangeJoin.deltaUs)
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_next"))
    val expected = e.join(naive, Seq("event_id"), "left")
      .select(col("event_id"), col("t"),
        coalesce(col("n_next"), lit(0L)).as("n_next"))
    val got = RangeJoin(spark, sfDir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.filter(col("n_next") > 0).count() > 0,
      "degenerate fixture: no event pairs inside the window")
  }

  test("quality gate: in-row signals + broadcast LM, no nested loop") {
    val plan = executed(graft.pipeline.QualityGate(spark, sfDir))
    assert(plan.contains("graft_dup_ngrams") &&
      plan.contains("graft_top_bigram"),
      s"in-row repetition signals missing:\n$plan")
    // term-frequency lookup must broadcast the vocab-sized relation;
    // the one-row totals are plan-time literals, so no nested loop
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast LM join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"totals must be literals, not a cross join:\n$plan")
  }

  test("quality prune: sketch threshold, broadcast cut, ~quantile keep") {
    val df = graft.pipeline.QualityGate.prune(spark, sfDir)
    val rows = df.collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getBoolean(3)))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val kept = g.count(_._3).toDouble / g.length
      // exact invariant: the threshold bin is the first whose cum
      // reaches ceil(0.75 n), so the keep rate is NEVER below 0.75;
      // the overshoot above it is bin-granular (large on tiny sources)
      assert(kept >= 0.749999, s"$src keep rate $kept below the quantile")
      if (g.exists(!_._3)) {
        // every kept doc scores at most one bin above every dropped doc
        val maxKept = g.filter(_._3).map(_._2).max
        val minDropped = g.filter(!_._3).map(_._2).min
        assert(maxKept < minDropped + 1.0 / graft.pipeline.QualityGate.pruneBinInv,
          s"$src: kept nll $maxKept not below dropped $minDropped + bin")
      }
    }
    assert(rows.exists(!_._3), "the prune must actually drop documents")
    // the per-source cutoffs must broadcast back onto the doc relation
    // (never a rank-within-source window over the corpus)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"cutoffs must broadcast:\n${plan.take(3000)}")
  }

  test("dedup apply: drop list joins the corpus without a corpus shuffle") {
    val plan = executed(
      graft.pipeline.Dedup.dedupApply(spark, sfDir))
      .split("== Initial Plan ==").head
    // AQE should broadcast the (clusters-only) drop list; the corpus
    // must not sort-merge against it
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled to apply the drop list:\n$plan")
  }

  test("cms: counter probe broadcasts, top-k is a bounded TakeOrdered") {
    val plan = executed(Sketches.qCmsTopk(spark, sfDir))
      .split("== Initial Plan ==").head
    // the d x w counter matrix must reach the probe as a broadcast
    // and the final top-k must never be a global sort
    assert(plan.contains("BroadcastHashJoin"),
      s"counter matrix must broadcast onto the probe side:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe join shuffled:\n$plan")
  }

  test("kmv: per-group top-k plans as the bounded heap, not a sort") {
    // the sketch-build relation (qKmvJaccard collects it as a local
    // pair table, so it's not in the query's returned plan)
    graft.core.Graft.ensureConf(spark)
    val plan = executed(Sketches.kmvSets(Sketches.kmvHashes(
      graft.core.Graft.table(spark, sfDir, "events"))))
    // the k-minima selection must be the TopKPerKey heap operator
    // (TopKWindowRewrite engages on the row_number formulation); a
    // per-group Window sort would be O(n log n) per group at scale
    assert(plan.contains("TopKPerKey"),
      s"k-minima must plan as the bounded heap:\n${plan.take(3000)}")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window\n"),
      s"no window sort may survive the rewrite:\n${plan.take(3000)}")
  }

  test("dup spans: repeated-gram set broadcasts onto the gram stream") {
    val plan = executed(graft.pipeline.Dedup.dupSpans(spark, sfDir))
      .split("== Initial Plan ==").head
    // the positional gram stream must not shuffle for the probe; the
    // only sort-merge-free joins are broadcast (dup set + base outer)
    assert(plan.contains("BroadcastHashJoin"),
      s"repeated-gram set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"gram stream shuffled against the dup set:\n$plan")
  }

  test("pivot: explicit value list keeps it to ONE scan and one shuffle") {
    val plan = executed(Tpch.qPivot(spark, sfDir))
      .split("== Initial Plan ==").head
    // pivot without values runs a distinct-discovery pass first; the
    // explicit list must leave exactly one parquet scan of orders
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"pivot must not re-scan to discover values:\n$plan")
    // the standard two-level pivot agg: data shuffles once on
    // (group, year); the second exchange carries groups x years rows
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.size <= 2, s"unexpected extra shuffles:\n$plan")
  }

  test("quantile sketch: one keyed exchange for the bin counts") {
    val plan = executed(Sketches.qQtileSketch(spark, sfDir))
      .split("== Initial Plan ==").head
    // exactly one hash exchange keyed on the group: the (group, bin)
    // count (with partial agg); windows/estimator reuse it. The
    // 4-row quantile-target join must broadcast.
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.nonEmpty && keyed.forall(_.contains("l_returnflag")),
      s"unexpected exchange keys:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastHashJoin"),
      s"quantile targets must broadcast:\n$plan")
  }

  test("semantic dedup: cell-blocked compare, no all-pairs, no corpus " +
       "shuffle beyond the cell join") {
    val plan = executed(graft.pipeline.Similarity.ddSemantic(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"within-cell compare must never be an unblocked all-pairs:\n$plan")
    // every keyed exchange is on the cell id or the per-vector verdict
    // key - nothing shuffles the corpus on any other key
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.forall(l => l.contains("cid") || l.contains("vec_id")),
      s"unexpected exchange keys:\n$plan")
  }

  test("bigram NLL: vocab-side scoring joins, no nested loop") {
    val plan = executed(
      graft.pipeline.TextAnalysis.bigramNll(spark, sfDir))
      .split("== Initial Plan ==").head
    // the only non-keyed join allowed is the 1-row totals cross join
    assert(!plan.contains("CartesianProduct"),
      s"bigram scoring must stay keyed:\n$plan")
    // exchanges key only on the LM vocab ((w1[, w2]) / term) or the
    // per-doc sum - the corpus bigram stream pays one keyed join and
    // one doc-keyed aggregate, nothing else
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.forall(l => l.contains("w1") || l.contains("term") ||
             l.contains("doc_id")),
      s"unexpected exchange keys:\n$plan")
  }

  test("resample: spine explodes out of the span aggregate, not raw events") {
    val plan = executed(TimeSeries.qResample(spark, sfDir))
      .split("== Initial Plan ==").head
    // the Generate (sequence explode) must sit above an Aggregate -
    // fan bounded by keys x span, never a per-event explode
    val genIdx = plan.linesIterator.indexWhere(_.contains("Generate"))
    assert(genIdx >= 0, s"expected a spine explode:\n$plan")
    val above = plan.linesIterator.slice(genIdx, genIdx + 8).mkString("\n")
    assert(above.contains("HashAggregate"),
      s"spine must explode out of the per-key span aggregate:\n$above")
    // keyed exchanges only on the resample key (and key+bucket)
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.nonEmpty && keyed.forall(_.contains("user_id")),
      s"unexpected exchange keys:\n$plan")
  }

  test("corr: one keyed aggregation, six numbers per group shuffle") {
    val plan = executed(Tpch.qCorr(spark, sfDir))
      .split("== Initial Plan ==").head
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.nonEmpty && keyed.forall(_.contains("l_returnflag")),
      s"unexpected exchange keys:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"sums must combine map-side:\n$plan")
  }

  test("stream-asof book: arriving side plans zero keyed exchanges") {
    import org.apache.spark.sql.functions.col
    // the batch replica of the streaming micro-batch plan: events
    // joined to the broadcast book + the in-row ordered lookup
    val idx = graft.core.Graft.table(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"),
        org.apache.spark.sql.functions.unix_micros(
          col("o_orderdate").cast("timestamp")).as("rt"),
        col("o_orderkey"))
      .groupBy(col("k"), col("rt"))
      .agg(org.apache.spark.sql.functions.max(col("o_orderkey"))
        .as("o_orderkey"))
      .groupBy(col("k"))
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct(
            col("rt"), col("o_orderkey")))).as("book"))
    val ev = graft.core.Graft.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.expr(
          "graft_ts_us(ts)").as("t"))
    val joined = ev.join(
        org.apache.spark.sql.functions.broadcast(idx),
        ev("user_id") === idx("k"), "left")
      .withColumn("m", org.apache.spark.sql.functions.expr(
        "element_at(filter(book, x -> x.rt <= t), -1)"))
    val plan = executed(joined).split("== Initial Plan ==").head
    // the event side reaches the broadcast join straight from its scan:
    // every keyed exchange in the plan belongs to the book build (k)
    val keyed = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(keyed.forall(l => l.contains("k#") || l.contains("(k,")),
      s"event side must not shuffle:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"book must broadcast onto the event scan:\n$plan")
  }

  test("entropy: fully narrow - the distribution never leaves the row") {
    val plan = executed(
      graft.pipeline.TextAnalysis.entropy(spark, sfDir))
    assert(!plan.contains("hashpartitioning"),
      s"per-doc entropy shuffled on a key:\n$plan")
  }

  test("zipf: totals and top-R heap ride the shared token tier - " +
       "zero corpus re-scans") {
    val plan = executed(graft.pipeline.TextAnalysis.zipf(spark, sfDir))
      .split("== Initial Plan ==").head
    // r17: the tokenization is the session-shared lm-toks tier (one
    // regexp pass per corpus family-wide), so the face's own plan
    // must not scan documents at all
    assert(plan.linesIterator.count(l =>
        l.contains("FileScan parquet") &&
          l.contains("documents.parquet")) == 0,
      s"vocab totals and ranks must come off the shared token tier:\n$plan")
  }

  test("pagerank: iterations run over the checkpointed edges, zero " +
       "re-scans") {
    val plan = executed(Graph.qPagerank(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(!plan.contains("FileScan parquet"),
      s"an iteration re-derived the events scan:\n$plan")
  }

  test("cooccur: in-row pair fan-out, no event-log self-join") {
    val plan = executed(Graph.qCooccur(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("events.parquet")) == 1,
      s"pair generation must not re-scan or self-join events:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"pairs must explode in-row, not join:\n$plan")
  }

  test("triangles: wedge+closure run over the materialized edge " +
       "relation - no event re-scan, no product join") {
    val plan = executed(Graph.qTriangles(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(!plan.contains("FileScan parquet"),
      s"orientation/wedge/closure must read the checkpointed edges, " +
        s"not re-derive the pair explode:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle counting must stay on keyed/broadcast joins:\n$plan")
  }

  test("backoff nll: train n-grams derive from one materialized " +
       "tokenization; held-out side reads the shared token tier") {
    val plan = executed(
      graft.pipeline.TextAnalysis.backoffNll(spark, sfDir))
      .split("== Initial Plan ==").head
    // r17: BOTH halves read the session-shared lm-toks tier, so the
    // face's own plan never scans documents (the tokenize pass is
    // paid once per corpus, family-wide)
    assert(plan.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents")) == 0,
      s"both halves must read the materialized token tier:\n$plan")
    // (the 1-row totals relation rides the house BNLJ-broadcast cross
    // join; the pin is that the three n-gram joins stay keyed and no
    // unkeyed product of corpus-sized relations appears)
    assert(!plan.contains("CartesianProduct"),
      s"the three backoff joins must stay keyed:\n$plan")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3,
      s"trigram/bigram/unigram lookups should be keyed joins:\n$plan")
  }

  test("retrieval eval: lists land via bounded TakeOrdered, nothing " +
       "sorts the corpus") {
    val plan = executed(
      graft.pipeline.TextAnalysis.retrievalEval(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"every list must be a bounded top-k, not a global sort:\n$plan")
    // (the RRF fusion's 50-row full-outer join legitimately plans as
    // SortMergeJoin - broadcast hash doesn't support full outer - so
    // the pin here is only that no corpus-sized product appears)
    assert(!plan.contains("CartesianProduct"),
      s"no unkeyed corpus product anywhere in the eval:\n$plan")
  }

  test("session overlap: pair-free interval stabbing - no product " +
       "join, no pair self-join, one range shuffle") {
    val plan = executed(Tpch.qSessionOverlap(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the overlap count must never drive a product join:\n$plan")
    // the prefix-difference rewrite: cumulative counts ride the
    // tagged RANGE shuffle (GlobalRank.withPrefixSum); the only
    // remaining join is the sessions-sized f0/f1 zip - a tile-keyed
    // pair self-join (hashpartitioning on a bin column) would mean
    // the rewrite regressed to materializing overlap pairs
    assert(plan.contains("rangepartitioning"),
      s"the stabbing cumulatives must ride a range shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("bin#"),
      s"no tile bin key may appear - pairs must never materialize:\n$plan")
  }

  test("hashfeat: one scan, one (doc, bucket)-keyed exchange") {
    val plan = executed(
      graft.pipeline.TextAnalysis.hashfeat(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.count(
        _.contains("Exchange hashpartitioning")) == 1,
      s"hashing-trick features need exactly one keyed exchange:\n$plan")
    assert(plan.contains("partial_sum"),
      s"signed counts must combine map-side:\n$plan")
  }

  test("paths: TopKPerKey's output partitioning feeds the per-user " +
       "aggregation - no re-exchange after the group limit") {
    val plan = executed(Behavior.qPaths(spark, sfDir))
      .split("== Initial Plan ==").head
    val lines = plan.linesIterator.toSeq
    val ti = lines.indexWhere(_.contains("TopKPerKey"))
    assert(ti >= 0,
      s"prefix trim must run on the bounded-heap operator:\n$plan")
    // the per-user aggregation (the trim's consumer, printed above it)
    // must sit directly on TopKPerKey's user-keyed output — an Exchange
    // between them would mean the group limit forgot its partitioning
    // and the trimmed rows re-shuffled. (Asserting the relation, not a
    // global exchange COUNT, so unrelated planner changes - AQE reuse,
    // broadcast threshold - can't flip the test without a real
    // regression.)
    val ai = lines.slice(0, ti).lastIndexWhere(_.contains("HashAggregate"))
    assert(ai >= 0, s"per-user aggregate must consume the trim:\n$plan")
    assert(!lines.slice(ai, ti).exists(_.contains("Exchange ")),
      s"paths must not re-exchange after the group limit:\n$plan")
  }

  test("token budget: the cumsum window runs directly on the trimmed " +
       "partitioning - no exchange between TopKPerKey and Window") {
    val plan = executed(
      graft.pipeline.CorpusOps.tokenBudgetPack(spark, sfDir))
      .split("== Initial Plan ==").head
    val lines = plan.linesIterator.toSeq
    val wi = lines.indexWhere(_.contains("Window"))
    val ti = lines.indexWhere(_.contains("TopKPerKey"))
    assert(wi >= 0 && ti > wi,
      s"window must sit above the group limit:\n$plan")
    assert(!lines.slice(wi, ti).exists(_.contains("Exchange ")),
      s"trimmed rows are already source-partitioned; the window must " +
        s"not re-shuffle them:\n$plan")
  }

  test("ivf-pq: the probe scan reads codes; vectors re-fetched only " +
       "for the shortlist refine") {
    val plan = executed(
      graft.pipeline.Similarity.annIvfPq(spark, sfDir))
      .split("== Initial Plan ==").head
    // the ADC phase must not carry the float vectors: `embedding`
    // may appear in the index build (assignment/encode) and in the
    // refine join, but the shortlist window ranks on (adc, vec_id)
    assert(plan.contains("adc"), s"ADC score column missing:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probes must broadcast onto the code relation:\n$plan")
  }

  test("rfm: no single-task global window anywhere in the ranking " +
       "(the three ranks are range-partitioned partition-offset ranks)") {
    val plan = executed(Segmentation.qRfm(spark, sfDir))
    // the old shape ranked via four Window.partitionBy() (empty)
    // windows — at 100 TB that funnels the ~10⁹-row per-customer state
    // through ONE task, three times. The GlobalRank rewrite leaves NO
    // window operator at all: ranks arrive via rangepartitioning +
    // per-partition offsets, so a reappearing Window is a regression.
    assert(!plan.contains("Window"),
      s"rfm ranking must not plan a window:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"ranks must come from range-partitioned sorts:\n$plan")
  }

  test("qclf scoring: narrow feature fan-out, keyed aggregations only " +
       "(no window, no nested-loop join), columns pruned to the scan") {
    val plan = executed(
      graft.pipeline.QualityClassifier.score(spark, sfDir))
    assert(!plan.contains("Window"),
      s"scoring must not plan a window:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the weight lookup is a literal array, never a join:\n$plan")
    // the documents scan feeds only (doc_id, text) — reading any other
    // column for a 2-input featurization is a pruning regression
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall { l =>
      l.contains("doc_id") && l.contains("text") && !l.contains("source")
    }, s"feature scan must read only doc_id+text:\n$plan")
  }

  test("qclf eval: the score-domain cumulative runs on the range-" +
       "shuffle prefix sum, never a global-order window") {
    // the last empty-partition window in the codebase lived here (the
    // `below` cumsum over the per-score matrix); GlobalRank
    // .withPrefixSum replaced it - a reappearing Window is a regression
    val plan = executed(
      graft.pipeline.QualityClassifier.eval(spark, sfDir))
    assert(!plan.contains("Window"),
      s"eval must not plan a window:\n$plan")
    // the range shuffle itself lives behind the GraftBridge RDD
    // boundary (GlobalRankSpec pins its correctness); the SQL plan
    // must consume that bridge, not re-derive the cumsum
    assert(plan.contains("Scan ExistingRDD"),
      s"the below-cumsum must come off the GlobalRank bridge:\n$plan")
  }

  test("skyline: partition-local frontiers, no global window, and the " +
       "merge input is the tiny local-frontier relation") {
    val plan = executed(Segmentation.qSkyline(spark, sfDir))
    assert(!plan.contains("Window"),
      s"skyline must not plan a global window:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"local frontiers must run on a range-partitioned sort:\n$plan")
    // the single-partition merge exists (SinglePartition exchange) but
    // only AFTER the local pass has shrunk the relation
    assert(plan.contains("SinglePartition"),
      s"frontier merge step missing:\n$plan")
  }

  test("embed prune: broadcast centroid join, no global-order window, " +
       "rank off the GlobalRank bridge") {
    // the affinity side (pre-rank): k-row centroid relation broadcasts,
    // the corpus never shuffles on a key for it
    val aff = executed(
      graft.pipeline.Similarity.embedAffinity(spark, sfDir))
    assert(aff.contains("BroadcastHashJoin"),
      s"the k-row centroid relation must broadcast:\n$aff")
    assert(!aff.contains("SortMergeJoin") &&
      !aff.contains("Exchange hashpartitioning"),
      s"the corpus must never key-shuffle for the affinity join:\n$aff")
    // the prune query: the decile cut comes off the GlobalRank range
    // shuffle (behind the bridge), never a global-order window
    val plan = executed(
      graft.pipeline.Similarity.pipeEmbedPrune(spark, sfDir))
    assert(!plan.contains("Window"),
      s"the decile cut must not plan a global-order window:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"the rank must come off the GlobalRank range shuffle:\n$plan")
  }

  test("bpe encode: the apply is a narrow replace chain - no exchange " +
       "before the presentation sort") {
    val plan = executed(
      graft.pipeline.TextAnalysis.bpeEncode(spark, sfDir))
    // the learn rounds run (and aggregate) inside bpeLearnFrom before
    // this plan exists; the ENCODE plan itself must be scan -> project
    // -> sort, with the merge table folded in as literals: no keyed
    // shuffle anywhere (the only exchanges are tableParallel's
    // round-robin spread and the presentation range sort)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"encode must not shuffle on a key:\n$plan")
    assert(!plan.contains("Join"),
      s"the merge table must fold in as literals, not a join:\n$plan")
    assert(plan.contains("replace(replace("),
      s"the merge chain must fold into one projection:\n$plan")
  }

  test("pmi: the report never re-touches the corpus and the top-k is " +
       "a bounded TakeOrdered, not a full sort") {
    val plan = executed(
      graft.pipeline.TextAnalysis.pmi(spark, sfDir))
    // the bigram relation materializes ONCE (localCheckpoint) before
    // this plan exists; marginals/N/ranking all read that vocab-sized
    // relation - a FileScan here would be a second corpus pass
    assert(!plan.contains("FileScan"),
      s"pmi report must run off the materialized bigram relation:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded TakeOrdered:\n$plan")
  }

  test("mad: user-keyed exchanges only - no single-partition window " +
       "anywhere in the robust baseline") {
    val plan = executed(TimeSeries.qMad(spark, sfDir))
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange SinglePartition"),
      s"median/MAD rank selection must never funnel to one task:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning") ||
      plan.indexOf("Exchange rangepartitioning") ==
        plan.lastIndexOf("Exchange rangepartitioning"),
      s"only the presentation sort may range-partition:\n$plan")
  }

  test("gif/sobel/histeq: the codec features are narrow - no keyed " +
       "exchange anywhere before the presentation sort") {
    for (df <- Seq(graft.pipeline.Gif.gifE2e(spark, sfDir),
        graft.pipeline.Multimodal.sobelE2e(spark, sfDir),
        graft.pipeline.Multimodal.histeqE2e(spark, sfDir))) {
      val plan = executed(df)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"codec features must not shuffle on a key:\n$plan")
    }
  }
}
