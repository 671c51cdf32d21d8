package graft.analytics

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Semantics of the mergeable-sketch family and the dup-span coverage
  * measure (the driver oracle pins cross-engine parity; these pin the
  * mathematical contracts the oracle can't see).
  */
class SketchesSpec extends SparkSpec {

  test("CMS: est >= exact for every item, per-row counter sums == N") {
    val ev = graft.core.Graft.table(spark, sfDir, "events")
      .select(col("user_id"))
    val n = ev.count()
    val counters = Sketches.cmsCounters(ev)
    // each hash row sees every event exactly once
    val rowSums = counters.groupBy(col("r"))
      .agg(sum(col("c")).as("s")).collect()
    assert(rowSums.length == Sketches.cmsD)
    assert(rowSums.forall(_.getLong(1) == n))
    // one-sided error: the sketch can only overcount
    val under = Sketches.cmsEstimateAll(counters, ev)
      .filter(col("est_cnt") < col("exact_cnt")).count()
    assert(under == 0)
  }

  test("ddsketch: every quantile estimate is within the gamma relative " +
       "bound of the exact quantile, and the bin counters merge " +
       "across any split") {
    val s2 = spark; import s2.implicits._
    // two cohorts by user parity: A log-uniform-ish, B shifted 20% up
    // at the top half - known positive values across 4 magnitudes
    val rows = (1 to 4000).map { j =>
      val uid = j.toLong % 100
      val base = math.pow(10.0, 1.0 + (j % 400) / 100.0) // 10..~1e5
      val v = if (uid % 2 == 1 && j % 400 >= 200) base * 1.2 else base
      (uid, v)
    }
    val ev = rows.toDF("user_id", "value")
    val drift = Sketches.ddsketchDriftFromBinCounts(
      Sketches.ddBinCounts(ev)).collect()
    assert(drift.length == 4, s"one row per quantile: ${drift.length}")
    // exact per-cohort quantiles (discrete, rank = ceil(q*n)) to
    // check the DDSketch guarantee: mid-bin estimate within one bin
    // width, i.e. est/exact in [e^-0.02, e^0.02] up to quantization
    val byG = rows.groupBy(_._1 % 2).map { case (g, rs) =>
      g -> rs.map(r => math.floor(r._2 * 1e6 + 0.5) / 1e6).sorted
    }
    val gBound = math.exp(Sketches.ddBinWidthMu / 1e6)
    drift.foreach { r =>
      val q = r.getDouble(0)
      for ((g, est) <- Seq((0L, r.getDouble(6)), (1L, r.getDouble(7)))) {
        val vs = byG(g)
        val exact = vs((math.ceil(q * vs.length) - 1).toInt.max(0))
        assert(est / exact > 1.0 / gBound && est / exact < gBound,
          s"q=$q grp=$g est=$est exact=$exact outside the " +
            s"relative bound $gBound")
      }
    }
    // the planted 20% top-half shift reads out as positive bin drift
    // at the upper quantiles on the SHIFTED side (B above A -> bin_a
    // - bin_b negative)
    val p95 = drift.find(_.getDouble(0) == 0.95).get
    assert(p95.getLong(4) > p95.getLong(3),
      s"planted upper-tail shift must move B's p95 bin up: $p95")
    // mergeability: counters from any split re-aggregate to the batch
    val full = Sketches.ddBinCounts(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val h1 = Sketches.ddBinCounts(ev.filter(col("value") < 1000.0))
    val h2 = Sketches.ddBinCounts(ev.filter(col("value") >= 1000.0))
    val merged = h1.unionByName(h2)
      .groupBy(col("grp"), col("bin")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(merged == full, "split counters must merge to the batch fact")
  }

  test("CMS: collisions produce strict overestimates at the test width") {
    // 600 distinct single-occurrence items in 256 buckets: most items
    // share every row's bucket with someone, so strict overestimates
    // are certain (deterministic given the md5 bucketing and the ids)
    val s = spark; import s.implicits._
    val ev = (1L to 600L).toDF("user_id")
    val est = Sketches.cmsEstimateAll(Sketches.cmsCounters(ev), ev)
    assert(est.filter(col("est_cnt") < col("exact_cnt")).count() == 0)
    assert(est.filter(col("est_cnt") > col("exact_cnt")).count() > 0)
  }

  test("CMS inner product: one-sided join-size estimate within bound") {
    val s = spark; import s.implicits._
    // planted frequencies: user u has (u%5+1) purchases, (u%3+1) errors
    val pu = (1L to 50L).flatMap(u => Seq.fill((u % 5 + 1).toInt)(u))
    val er = (1L to 50L).flatMap(u => Seq.fill((u % 3 + 1).toInt)(u))
    val exact = (1L to 50L).map(u => (u % 5 + 1) * (u % 3 + 1)).sum
    val ca = Sketches.cmsCounters(pu.toDF("user_id")).toDF("r", "bkt", "ca")
    val cb = Sketches.cmsCounters(er.toDF("user_id")).toDF("r", "bkt", "cb")
    val est = ca.join(cb, Seq("r", "bkt"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip"))).collect()(0).getLong(0)
    // one-sided: collisions only ADD products, so est >= exact always
    assert(est >= exact, s"inner product must not undercount: $est < $exact")
    // and the additive error is bounded by ~|A||B|/w per row (min of 4)
    assert(est <= exact + 3L * pu.length * er.length / Sketches.cmsW,
      s"est $est too far above exact $exact")
  }

  test("F2 sketch: one-sided, and the skew ratio separates hot from flat") {
    val s = spark; import s.implicits._
    def f2est(xs: Seq[Long]): Long =
      Sketches.cmsCounters(xs.toDF("user_id"))
        .groupBy(col("r")).agg(sum(col("c") * col("c")).as("ip"))
        .agg(min(col("ip"))).collect()(0).getLong(0)
    // flat: 100 keys x 10 each -> F2 = 10k, uniform floor N^2/keys = 10k
    val flat = (1L to 100L).flatMap(u => Seq.fill(10)(u))
    // hot: one key holds half the events
    val hot = Seq.fill(500)(7L) ++ (1L to 100L).flatMap(u => Seq.fill(5)(u))
    val (fFlat, fHot) = (f2est(flat), f2est(hot))
    val exactFlat = 100L * 10 * 10
    val exactHot = 500L * 500 + 100L * 25 + 2L * 500 * 5 // key 7 overlaps
    assert(fFlat >= exactFlat && fHot >= 250000L, "F2 must not undercount")
    // the decision signal: skew ratio = F2 / (N^2 / #keys)
    val rFlat = fFlat.toDouble / (1000.0 * 1000 / 100)
    val rHot = fHot.toDouble / (1000.0 * 1000 / 100)
    assert(rFlat < 2.0, s"flat distribution must read ~1, got $rFlat")
    assert(rHot > 10.0, s"hot distribution must read >>1, got $rHot")
  }

  test("sliding HLL: merged bucket sketches == rebuilt window sketch") {
    val s = spark; import s.implicits._
    val r = Sketches.qHllSliding(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.nonEmpty)
    // every window's estimate lands within a few RSE of exact
    r.foreach { case (wb, exact, est) =>
      assert(math.abs(est - exact) / math.max(exact, 1L) < 0.2,
        s"window $wb: est $est vs exact $exact")
    }
    // merge == rebuild: the max-merged registers of a 6-bucket window
    // must equal registers built directly from the window's raw rows
    // (the property that makes the merge a valid substitute for the
    // 6x re-scan)
    val ev = graft.core.Graft.table(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(expr(s"(graft_ts_us(ts)) DIV ${Sketches.slideBucketUs}L").as("b"),
        col("user_id"))
    val wb = r(r.length / 2)._1
    val direct = Sketches.hashRho(
        ev.filter(col("b").between(wb - Sketches.slideSpan, wb))
          .select(lit(wb).as("l_returnflag"), col("user_id").as("l_orderkey")))
      .groupBy(col("reg")).agg(max(col("rho")).as("mj"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    val regs = Sketches.hashRho(ev.select(col("b").as("l_returnflag"),
        col("user_id").as("l_orderkey")))
      .select(col("l_returnflag").as("b"), col("reg"), col("rho"))
      .groupBy(col("b"), col("reg")).agg(max(col("rho")).as("mj"))
    val merged = regs.filter(col("b").between(wb - Sketches.slideSpan, wb))
      .groupBy(col("reg")).agg(max(col("mj")).as("mj"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(merged == direct)
  }

  test("KMV: pairwise estimates within sketch error of planted truth") {
    val s = spark; import s.implicits._
    // two types over ranges [0,1000) and [500,1500): true Jaccard
    // 500/1500, union 1500 - both beyond k=256, so the ESTIMATION path
    // runs (never the small-set exact fallback)
    val ev = ((0L until 1000L).map(u => ("A", u)) ++
      (500L until 1500L).map(u => ("B", u)))
      .toDF("event_type", "user_id")
    val hs = Sketches.kmvHashes(ev)
    val r = Sketches.kmvExact(hs)
      .join(Sketches.kmvEstimates(Sketches.kmvSets(hs)),
        Seq("type_a", "type_b")).collect()(0)
    assert(r.getLong(2) == 500L && r.getDouble(3) == 0.333333) // q6 exact
    // RSE ~ 1/sqrt(256) ~ 6%; generous deterministic bounds
    assert(math.abs(r.getDouble(4) - 1.0 / 3) < 0.1,
      s"KMV Jaccard ${r.getDouble(4)} far from 1/3")
    assert(math.abs(r.getDouble(5) - 1500.0) < 300.0,
      s"KMV union estimate ${r.getDouble(5)} far from 1500")
    // small sets: the exact fallback reports the true union size
    val tiny = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("event_type", "user_id")
    val ths = Sketches.kmvHashes(tiny)
    val t = Sketches.kmvExact(ths)
      .join(Sketches.kmvEstimates(Sketches.kmvSets(ths)),
        Seq("type_a", "type_b")).collect()(0)
    assert(t.getDouble(4) == 0.333333 && t.getDouble(5) == 3.0)
  }

  test("KMV: streaming min-k state dedups and merges across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // duplicates across batches (i % 400) force the in-buffer dedup:
    // a value re-arriving in a later batch must not occupy two slots
    val all = (0L until 1200L).map(i => ("A", i % 400))
    val mem = MemoryStream[(String, Long)]
    val agg = graft.functions.MinKAgg(Sketches.kmvK)
    val perType = mem.toDS()
      .groupByKey(_._1).mapValues(r => java.lang.Long.parseLong(
        graft.pipeline.HashParity.md5Hex(r._2.toString).take(12), 16))
      .agg(agg.toColumn.name("ks"))
    val q = perType.toDF("event_type", "ks").writeStream.format("memory")
      .queryName("kmv_mb").outputMode(OutputMode.Complete()).start()
    all.grouped(400).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("kmv_mb").collect()(0)
      .getSeq[Long](1)
    val batch = Sketches.kmvSets(Sketches.kmvHashes(
        all.toDF("event_type", "user_id")))
      .collect()(0).getSeq[Long](1)
    assert(streamed == batch,
      "streamed KMV buffer must equal the one-shot batch buffer")
    assert(streamed.length == math.min(400, Sketches.kmvK))
  }

  test("sketch states merge across micro-batches == one-shot batch") {
    // the driver-gate streaming faces read the corpus file as a single
    // micro-batch; this pins the actually-incremental case - the same
    // counter/register/bin state built across 3 AddData batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val all = (1L to 900L).map(i => i % 97)
    val mem = MemoryStream[Long]
    val counters = Sketches.cmsCounters(mem.toDF().toDF("user_id"))
    val q = counters.writeStream.format("memory").queryName("cms_mb")
      .outputMode(OutputMode.Complete()).start()
    all.grouped(300).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("cms_mb").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = Sketches.cmsCounters(all.toDF("user_id")).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("HLL emits a live estimate per micro-batch, monotone as data grows") {
    // the gate faces estimate over the FINAL register snapshot; this is
    // the living-dashboard form - foreachBatch re-runs the shared
    // estimator on each micro-batch's register state. Distinct count
    // only grows, so successive estimates must be non-decreasing (the
    // register maxima are monotone and the estimator is monotone in
    // them), ending at the one-shot batch estimate.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Long]
    val regs = Sketches.hashRho(
        mem.toDF().select(lit("A").as("l_returnflag"),
          col("value").as("l_orderkey")))
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rho")).as("mj"))
    val live = scala.collection.mutable.ArrayBuffer.empty[Double]
    val q = regs.writeStream
      .outputMode(OutputMode.Complete())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val est = Sketches.estimate(batch).collect()
        if (est.nonEmpty) live += est(0).getDouble(1)
        ()
      }.start()
    (1L to 3000L).grouped(1000).foreach { chunk =>
      mem.addData(chunk: _*); q.processAllAvailable()
    }
    q.stop()
    assert(live.size == 3)
    assert(live.sameElements(live.sorted), s"estimates not monotone: $live")
    val oneShot = Sketches.estimate(
        Sketches.hashRho((1L to 3000L).toDF("l_orderkey")
            .select(lit("A").as("l_returnflag"), col("l_orderkey")))
          .groupBy(col("l_returnflag"), col("reg"))
          .agg(max(col("rho")).as("mj")))
      .collect()(0).getDouble(1)
    assert(live.last == oneShot)
  }

  test("quantile sketch: every estimate within one bin width of exact") {
    import org.apache.spark.sql.expressions.Window
    val li = graft.core.Graft.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val est = Sketches.qQtileSketch(spark, sfDir)
    // exact rank-r value (r = ceil(q*n), same rank convention)
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"))
    val ranked = li.withColumn("rk", row_number().over(w))
    val exact = est.select(col("l_returnflag"), col("q"), col("n"),
        col("qtile_est"))
      .join(ranked,
        col("rk") === ceil(col("q") * col("n")) &&
          ranked("l_returnflag") === est("l_returnflag"))
      .select(est("l_returnflag"), col("q"), col("qtile_est"),
        col("l_extendedprice").as("exact_v"))
    val bad = exact.filter(
      abs(col("qtile_est") - col("exact_v")) > Sketches.qtileBinW)
    assert(bad.count() == 0)
    assert(exact.count() == 12) // 3 groups x 4 quantiles at this SF
  }

  test("exact quantiles: rank-selection picks the planted values; the " +
       "sketch twin stays within its bin bound of them") {
    val s = spark; import s.implicits._
    // flag A: 1..10 (q25→3, q50→5, q75→8, q95→10); B: 100,200 (ceil
    // picks 100/100/200/200)
    val li = ((1 to 10).map(v => ("A", v * 1.0)) ++
      Seq(("B", 100.0), ("B", 200.0)))
      .toDF("l_returnflag", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_qex").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Sketches.qQuantileExact(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("A", 0.25, 10L, 3.0), ("A", 0.5, 10L, 5.0),
      ("A", 0.75, 10L, 8.0), ("A", 0.95, 10L, 10.0),
      ("B", 0.25, 2L, 100.0), ("B", 0.5, 2L, 100.0),
      ("B", 0.75, 2L, 200.0), ("B", 0.95, 2L, 200.0)),
      s"exact quantiles wrong: $got")
    // the sketch face on the same data respects its error contract
    // against these exact values
    val est = Sketches.qQtileSketch(spark, dir).collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    got.foreach { case (f, q, _, v) =>
      assert(math.abs(est((f, q)) - v) <= Sketches.qtileBinW,
        s"sketch est ${est((f, q))} too far from exact $v at ($f, $q)")
    }
  }

  test("dup spans / scrub: null and empty text flow through, no crash") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "only three tokens here x"),
      (4L, "only three tokens here x")).toDF("doc_id", "text")
    val spans = Dedup.dupSpansFrom(docs)
      .select("doc_id", "covered_tokens").as[(Long, Long)].collect().toMap
    // docs 3/4 are exact dups -> fully covered; null/empty -> 0 covered
    assert(spans == Map(1L -> 0L, 2L -> 0L, 3L -> 5L, 4L -> 5L))
    val scrub = Dedup.spanScrubFrom(docs)
      .select("doc_id", "text_scrubbed").as[(Long, String)].collect().toMap
    assert(scrub(2L) == "" && scrub(3L) == "" && scrub(4L) == "")
  }

  test("dup spans: planted boilerplate, interval merge, clean doc") {
    val s = spark; import s.implicits._
    val n = Dedup.spanN // 5
    val boiler = "all rights reserved by the publisher" // 6 tokens
    val docs = Seq(
      // 1: 6-token shared span inside unique text: two overlapping
      // duplicated 5-grams must merge to 6 covered tokens, not 10
      (1L, s"u1 u2 u3 $boiler u4 u5 u6"),
      (2L, s"v1 v2 $boiler v3 v4 v5 v6"),
      // 3: within-document repeat: "w1 w2 w3 w4 w5" twice (adjacent),
      // one contiguous covered run of all 10 tokens
      (3L, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"),
      // 4: nothing duplicated
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      // 5: shorter than the span width -> no grams at all
      (5L, "y1 y2 y3")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpansFrom(docs)
      .select("doc_id", "n_tokens", "covered_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 12L, 6L)))
    assert(got(1) == ((2L, 12L, 6L)))
    assert(got(2) == ((3L, 10L, 10L)))
    assert(got(3) == ((4L, 8L, 0L)))
    assert(got(4) == ((5L, 3L, 0L)))
    assert(n == 5) // fixture geometry assumes the 5-gram span width
    // the scrub action removes exactly the covered tokens in place
    val scrubbed = Dedup.spanScrubFrom(docs)
      .select("doc_id", "n_removed", "text_scrubbed")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(scrubbed(0) == ((1L, 6L, "u1 u2 u3 u4 u5 u6")))
    assert(scrubbed(1) == ((2L, 6L, "v1 v2 v3 v4 v5 v6")))
    assert(scrubbed(2) == ((3L, 10L, ""))) // fully-duplicated doc
    assert(scrubbed(3) == ((4L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8")))
    assert(scrubbed(4) == ((5L, 0L, "y1 y2 y3")))
  }

  test("prod faces equal the estimate columns of their adjunct twins") {
    // the _prod deployment faces share state-building and estimator
    // helpers with the adjunct-bearing oracle faces; this pins the
    // shared-function contract end to end: estimates NEVER drift
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    assert(rows(Sketches.qHllDistinctProd(spark, sfDir)) ==
      rows(Sketches.qHllDistinct(spark, sfDir)
        .select(col("l_returnflag"), col("hll_est"))
        .orderBy(col("l_returnflag"))))
    assert(rows(Sketches.qHllSlidingProd(spark, sfDir)) ==
      rows(Sketches.qHllSliding(spark, sfDir)
        .select(col("wb"), col("hll_est")).orderBy(col("wb"))))
    assert(rows(Sketches.qCmsTopkProd(spark, sfDir)) ==
      rows(Sketches.qCmsTopk(spark, sfDir)
        .select(col("user_id"), col("est_cnt"))
        .orderBy(col("est_cnt").desc, col("user_id"))))
    assert(rows(Sketches.qCmsSlidingProd(spark, sfDir)) ==
      rows(Sketches.qCmsSliding(spark, sfDir)
        .select(col("wb"), col("user_id"), col("est_cnt"))
        .orderBy(col("wb"), col("est_cnt").desc, col("user_id"))))
    assert(rows(Sketches.qCmsJoinCardProd(spark, sfDir)) ==
      rows(Sketches.qCmsJoinCard(spark, sfDir).select(col("est_pairs"))))
    assert(rows(Sketches.qCmsF2Prod(spark, sfDir)) ==
      rows(Sketches.qCmsF2(spark, sfDir).select(col("est_f2"))))
    assert(rows(Sketches.qKmvJaccardProd(spark, sfDir)) ==
      rows(Sketches.qKmvJaccard(spark, sfDir)
        .select(col("type_a"), col("type_b"),
          col("kmv_jaccard"), col("kmv_union_est"))
        .orderBy(col("type_a"), col("type_b"))))
    assert(rows(Sketches.qKmvRetentionProd(spark, sfDir)) ==
      rows(Sketches.qKmvRetention(spark, sfDir)
        .select(col("b_prev"), col("b_next"),
          col("kmv_jaccard"), col("kmv_union_est"))
        .orderBy(col("b_prev"))))
  }

  test("equidepth: bin populations are exactly the DIV-cut sizes even " +
       "when one tie group spans multiple bins, and boundaries are " +
       "ordered") {
    val s2 = spark; import s2.implicits._
    // planted skew: value 42 holds 60% of the mass (spans ~9 of the
    // 16 bins), the rest spread over 400 distinct values
    val n = 10000
    val rows = (0 until n).map { j =>
      if (j < 6000) 42L else 100L + (j % 400).toLong
    }
    val out = Sketches.equidepthOf(spark, rows.toDF("v")).collect()
    val bCnt = Sketches.edBins
    assert(out.length == bCnt, s"all $bCnt bins occupied: ${out.length}")
    // exact interval arithmetic: bin b holds ranks
    // (b*n DIV B, (b+1)*n DIV B] - population is a pure function of
    // (n, B), independent of the tie structure
    out.foreach { r =>
      val b = r.getLong(0)
      val want = (b + 1) * n / bCnt - b * n / bCnt
      assert(r.getLong(1) == want,
        s"bin $b population ${r.getLong(1)} != DIV-cut size $want")
      assert(r.getLong(2) <= r.getLong(3), s"lo <= hi in $r")
    }
    assert(out.map(_.getLong(1)).sum == n)
    // boundaries ordered under the total order; a tie group split
    // across a cut shares the boundary value (>=, not >)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) >= a.getLong(3),
        s"bin ${b.getLong(0)} lo ${b.getLong(2)} below prior hi " +
          s"${a.getLong(3)}")
      case _ =>
    }
    // the planted 60% tie group must cover every bin whose rank range
    // sits inside its interval: bins 0..9 all report lo=hi=42
    val tied = out.filter(r => r.getLong(2) == 42L && r.getLong(3) == 42L)
    assert(tied.length >= 8,
      s"the 60% tie group must span multiple whole bins: ${tied.length}")
  }

  test("equidepth map: equal values share a bin, duplicate cuts " +
       "collapse, and the assignment is the comparison count against " +
       "the fitted cut values") {
    val s2 = spark; import s2.implicits._
    // same planted skew as the histogram test: 42 holds 60% of the
    // mass; under the qcut contract it must land WHOLE in bin 0 (the
    // rank-interval face splits it across 9 bins - the documented
    // semantic contrast between the two faces)
    val rows = (0 until 10000).map { j =>
      if (j < 6000) 42L else 100L + (j % 400).toLong
    }
    val out = Sketches.equidepthMapOf(spark, rows.toDF("v")).collect()
    assert(out.length == 401, s"one row per distinct value: ${out.length}")
    val byV = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byV(42L) == ((6000L, 0L)),
      s"the tie group lands whole in bin 0: ${byV(42L)}")
    // cut ranks b*625 for b=1..15; ranks <= 6000 all resolve to v=42,
    // so the 15 raw cuts collapse to 7 distinct values -> bins 0..7
    assert(out.map(_.getLong(2)).max == 7L,
      s"collapsed cuts renumber to 8 bins: ${out.map(_.getLong(2)).max}")
    // monotone assignment in v
    out.sortBy(_.getLong(0)).sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) <= b.getLong(2), s"monotone: $a -> $b")
      case _ =>
    }
    // hand-checked cut: rank 6250 falls in v=124's interval, so
    // values in (42, 124] are bin 1 - 25 values x 10 rows
    assert(byV(124L)._2 == 1L && byV(125L)._2 == 2L,
      s"cut at 124 right-closed: ${byV(124L)} ${byV(125L)}")
    val bin1Pop = out.filter(_.getLong(2) == 1L).map(_.getLong(1)).sum
    assert(bin1Pop == 250L, s"bin 1 realized population: $bin1Pop")
    // populations sum to n under any tie structure
    assert(out.map(_.getLong(1)).sum == 10000L)
  }

  test("cms sliding prod: the pre-distinct cuts the window fan volume " +
       "on a corpus with real key repetition") {
    // the crossover claim (PLANS.md r6): prod beats the exact-adjunct
    // twin exactly when events / distinct(bucket, user) >> 1 - the
    // fixture's near-unique pairs (ratio 1.05) are the documented
    // worst case, the generated corpus has the production ratio. This
    // pins the VOLUME mechanism deterministically (the bench pins the
    // wall-clock inequality at the generated anchor, sf3 check).
    val ev = spark.read.format("graft-events")
      .option("rows", "20000").option("users", "50").load()
      .select(expr(s"(graft_ts_us(ts)) DIV ${Sketches.slideBucketUs}L").as("b"),
        col("user_id"))
    val raw = ev.count()
    val distinctPairs = ev.distinct().count()
    assert(raw.toDouble / distinctPairs > 5.0,
      s"generated corpus must repeat keys: $raw raw / $distinctPairs distinct")
    // fan volume = rows entering the per-window candidate join
    val wins = ev.select(col("b").as("wb")).distinct()
    def fan(rel: org.apache.spark.sql.DataFrame): Long =
      rel.join(wins, col("b").between(col("wb") - Sketches.slideSpan,
        col("wb"))).count()
    val adjunctFan = fan(ev)
    val prodFan = fan(ev.distinct())
    assert(prodFan.toDouble / adjunctFan < 0.25,
      s"pre-distinct must cut the fan: prod=$prodFan adjunct=$adjunctFan")
  }
}
