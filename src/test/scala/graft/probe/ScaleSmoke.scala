package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.ensureConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val t0 = System.nanoTime()
    val ev = spark.read.format("graft-events")
      .option("rows", rows.toString)
      .option("users", "100000")
      .option("numPartitions", "64").load()
    val xf = graft.core.Transform(graft.core.Transform.extractFrom(ev))
    val counts = graft.core.Caches.countState(xf)
    val n = counts.count()
    val t1 = System.nanoTime()
    val top = graft.core.CountQueries.topKPerSubjFrom(
      counts.drop("cache"), 3).count()
    val t2 = System.nanoTime()
    // round-3 re-planned ops at generator scale: all six global sort
    // rankings over the count state (3 physical sorts, InternalRow
    // end-to-end) and the bounded-heap custom operator
    val sv = graft.core.CountQueries.sortedVariantsFrom(
      counts.drop("cache")).count()
    val t3 = System.nanoTime()
    val topCustom = graft.plans.TopK.perKey(counts.drop("cache"),
      Seq("s"), Seq(("cnt", false), ("last_t", false), ("a", true),
        ("o", true)), 3).count()
    val t4 = System.nanoTime()
    println(f"SMOKE rows=$rows countState_groups=$n topk_rows=$top " +
      f"pipeline_sec=${(t1 - t0) / 1e9}%.1f topk_sec=${(t2 - t1) / 1e9}%.1f " +
      f"events_per_sec=${rows / ((t1 - t0) / 1e9)}%.0f " +
      f"sort_variants_rows=$sv sort_variants_sec=${(t3 - t2) / 1e9}%.1f " +
      f"topk_custom_rows=$topCustom topk_custom_sec=${(t4 - t3) / 1e9}%.1f")
    // banded range join at generator scale: events are exactly 1s
    // apart, so with a 60s window every event except the last 60 has
    // exactly 60 successors - the total pair count is checkable in
    // closed form while the join itself exercises the full
    // explode + bucket-shuffle + residual-filter path over `rows`^2
    // candidate space
    val delta = graft.analytics.RangeJoin.deltaUs
    val evT = ev.select(col("event_id"), expr("graft_ts_us(ts)").as("t"))
    val rj = graft.analytics.RangeJoin.fromEvents(evT, delta)
      .agg(sum(col("n_next")).as("pairs"), count(lit(1)).as("n"))
      .collect()(0)
    val t5 = System.nanoTime()
    val expectPairs = 60L * (rows - 60) + (59L * 60 / 2)
    require(rj.getLong(1) == rows,
      s"range join lost rows: ${rj.getLong(1)} vs $rows")
    require(rj.getLong(0) == expectPairs,
      s"range join pair count ${rj.getLong(0)} != closed-form $expectPairs")
    println(f"SMOKE range_join rows=$rows pairs=${rj.getLong(0)} " +
      f"sec=${(t5 - t4) / 1e9}%.1f")
    // mergeable-sketch family at generator scale: every sketch is one
    // narrow pass + one bounded keyed agg, so throughput should track
    // the event rate. Contracts assertable without an oracle: CMS can
    // only overcount and each hash row sees every event once; HLL's
    // 512-register estimate lands within a few RSE of the true
    // distinct count; histogram quantiles are monotone in q.
    import graft.analytics.Sketches
    val evU = ev.select(col("user_id"))
    val counters = Sketches.cmsCounters(evU).persist()
    val rowSums = counters.groupBy(col("r")).agg(sum(col("c")).as("s"))
      .collect()
    require(rowSums.forall(_.getLong(1) == rows),
      "CMS row sums must equal the event count")
    val under = Sketches.cmsEstimateAll(counters, evU)
      .filter(col("est_cnt") < col("exact_cnt")).count()
    require(under == 0, "CMS must never undercount")
    counters.unpersist()
    val t6 = System.nanoTime()
    val evH = ev.select(lit("A").as("l_returnflag"),
      col("user_id").as("l_orderkey"))
    val hll = Sketches.estimate(
        Sketches.hashRho(evH).groupBy(col("l_returnflag"), col("reg"))
          .agg(max(col("rho")).as("mj")))
      .collect()(0).getDouble(1)
    val exactU = evU.distinct().count()
    require(math.abs(hll - exactU) / exactU < 0.15,
      f"HLL estimate $hll%.0f vs exact $exactU (>15%% off)")
    val t7 = System.nanoTime()
    val qt = Sketches.qtileEstimate(
        ev.select(lit("A").as("l_returnflag"),
            col("value").as("l_extendedprice"))
          .transform(Sketches.qtileBins)
          .groupBy(col("l_returnflag"), col("bin"))
          .agg(count(lit(1)).as("c")))
      .orderBy(col("q")).collect().map(_.getDouble(3))
    require(qt.length == 4 && qt.sameElements(qt.sorted),
      s"quantile estimates must be monotone in q: ${qt.mkString(",")}")
    val t8 = System.nanoTime()
    println(f"SMOKE sketches rows=$rows cms_sec=${(t6 - t5) / 1e9}%.1f " +
      f"hll_est=$hll%.0f hll_exact=$exactU hll_sec=${(t7 - t6) / 1e9}%.1f " +
      f"qtile_sec=${(t8 - t7) / 1e9}%.1f")
    // KMV set-operations sketch at scale, closed-form truth: type A =
    // users [0, 1M), type B = [500k, 1.5M) - true Jaccard 1/3, union
    // 1.5M, both far past k=256 so the estimation path runs. One
    // narrow hash pass + the bounded per-group heap; pair math on two
    // 256-long buffers.
    val nk = 1000000L
    val kmvIn = spark.range(nk).selectExpr("'A' AS event_type", "id AS user_id")
      .unionAll(spark.range(nk / 2, 3 * nk / 2)
        .selectExpr("'B' AS event_type", "id AS user_id"))
    val kmvR = Sketches.kmvEstimates(
        Sketches.kmvSets(Sketches.kmvHashes(kmvIn)))
      .collect()(0)
    val t9 = System.nanoTime()
    require(math.abs(kmvR.getDouble(2) - 1.0 / 3) < 0.1,
      s"KMV Jaccard ${kmvR.getDouble(2)} far from 1/3")
    require(math.abs(kmvR.getDouble(3) - 1.5e6) / 1.5e6 < 0.15,
      s"KMV union estimate ${kmvR.getDouble(3)} far from 1.5M")
    println(f"SMOKE kmv rows=${2 * nk} jaccard_est=${kmvR.getDouble(2)}%.4f " +
      f"union_est=${kmvR.getDouble(3)}%.0f sec=${(t9 - t8) / 1e9}%.1f")
    // sliding distinct at scale: the register-merge answer vs the
    // 6x re-scan it replaces, on the same windows - the merge must
    // agree within sketch error and cost less
    val evB = ev.select(
      expr(s"(graft_ts_us(ts)) DIV ${Sketches.slideBucketUs}L").as("b"),
      col("user_id"))
    val winsB = evB.select(col("b").as("wb")).distinct()
    val estsW = Sketches.estimate(
        Sketches.hashRho(evB.select(col("b").as("l_returnflag"),
            col("user_id").as("l_orderkey")))
          .select(col("l_returnflag").as("b"), col("reg"), col("rho"))
          .groupBy(col("b"), col("reg")).agg(max(col("rho")).as("mj"))
          .join(broadcast(winsB),
            col("b").between(col("wb") - Sketches.slideSpan, col("wb")))
          .groupBy(col("wb"), col("reg")).agg(max(col("mj")).as("mj")),
        "wb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val t10 = System.nanoTime()
    val exactW = evB.join(broadcast(winsB),
        col("b").between(col("wb") - Sketches.slideSpan, col("wb")))
      .groupBy(col("wb")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t11 = System.nanoTime()
    // 4.6% RSE per window, ~200 correlated windows: demand the
    // DISTRIBUTION (90% within 3 RSE), cap the worst at 6 RSE
    val errs = exactW.map { case (wb, ex) =>
      math.abs(estsW(wb) - ex) / ex.toDouble }
    require(errs.count(_ < 0.14).toDouble / errs.size >= 0.9,
      f"too many windows beyond 3 RSE: ${errs.count(_ >= 0.14)}/${errs.size}")
    require(errs.max < 0.28, f"worst window error ${errs.max}%.3f")
    println(f"SMOKE sliding windows=${exactW.size} " +
      f"merge_sec=${(t10 - t9) / 1e9}%.1f rescan_sec=${(t11 - t10) / 1e9}%.1f")
    // z-order layout at scale: one narrow pass assigns every event a
    // shard; shards stay balanced (no hot shard) and a time box's
    // candidate set from the library enumeration is lossless
    import graft.pipeline.Layout
    val zo = Layout.zorderFrom(ev.withColumn("value",
        (col("value") % 490.0))) // keep vb in the bucket domain
      .groupBy(col("shard"), col("tb")).agg(count(lit(1)).as("n"))
      .persist()
    val byShard = zo.groupBy(col("shard")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t12 = System.nanoTime()
    val mean = byShard.values.sum.toDouble / byShard.size
    require(byShard.values.max < 8 * mean,
      s"hot shard: max ${byShard.values.max} vs mean $mean")
    val tbs = zo.select(col("tb")).distinct().collect().map(_.getLong(0))
    val (lo, hi) = (tbs.min + 2, tbs.min + 21)
    val cand = Layout.candidateShards((tb, _) => tb >= lo && tb <= hi)
    val inBox = zo.filter(col("tb").between(lo, hi))
    val missed = inBox.filter(!col("shard").isin(cand.toSeq: _*)).count()
    require(missed == 0, s"prune lost $missed rows")
    zo.unpersist()
    println(f"SMOKE zorder rows=$rows shards=${byShard.size} " +
      f"cand=${cand.size} sec=${(t12 - t11) / 1e9}%.1f")

    // resample: hash-assigned users make each per-user series SPARSE
    // (~100 occupied of ~700 span buckets at 10M rows x 100k users),
    // so the spine fan is the gap-dominated worst case - bounded by
    // keys x span buckets, never by raw events. Closed forms: no
    // event is lost or invented (sum n_events == rows), and gaps are
    // exactly spine minus occupied cells.
    val t13 = System.nanoTime()
    val base = graft.analytics.TimeSeries.resampleBase(ev).persist()
    val baseCells = base.count()
    val rs = graft.analytics.TimeSeries.resampleFill(base).persist()
    val agg = rs.agg(count(lit(1)), sum(col("n_events")),
      sum(when(col("is_gap"), 1L).otherwise(0L))).collect()(0)
    val (rsRows, rsEvents, rsGaps) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val t14 = System.nanoTime()
    rs.unpersist(); base.unpersist()
    require(rsEvents == rows,
      s"resample lost/invented events: $rsEvents vs $rows")
    require(rsGaps == rsRows - baseCells,
      s"gaps must be spine minus occupied: $rsGaps vs $rsRows-$baseCells")
    println(f"SMOKE resample rows=$rows series_rows=$rsRows " +
      f"occupied=$baseCells gaps=$rsGaps sec=${(t14 - t13) / 1e9}%.1f")
    spark.stop()
  }
}
