package graft.analytics

import graft.core.{Graft, Transform}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the event log: PageRank on the
  * user↔object interaction graph (the co-visitation walk behind
  * "importance" features and popularity-debiased recommenders — and,
  * in a training-data pipeline, the quality-propagation signal over a
  * doc↔domain link graph). The dedup family already resolves
  * connected components (`resolveComponents`); this adds the
  * fixed-point-iteration family member.
  *
  * Determinism scheme: ranks live in integer MICRO-units. Each
  * iteration is r'(v) = 150000 + (17·Σ_{u→v} (r(u) DIV d(u))) DIV 20
  * — teleport 0.15, damping 17/20 = 0.85, all floor divisions on
  * non-negative integers — so both engines compute identical ranks
  * with no float anywhere. (The per-edge floor loses < 1 micro-unit
  * per in-edge vs exact rationals — a quantization choice, like the
  * micro-nat ln elsewhere, NOT a correctness hazard: both engines
  * quantize identically.)
  *
  * 100 TB shape: the edge relation (distinct user↔object pairs,
  * undirected as two directed arcs) is partitioned once; each
  * iteration is one src-keyed join against the node-sized rank
  * relation (broadcast while ranks fit, hash join on src beyond) and
  * one map-combinable dst-keyed sum — the standard Pregel-as-joins
  * plan. Iteration depth is session-tunable
  * (`graft.pagerank.iterations`, default 3), and deep runs can
  * checkpoint the rank relation between supersteps
  * (`graft.pagerank.checkpoint=true`) to cut the unrolled lineage —
  * which changes no result (spec-pinned).
  *
  * Reference: extends the event-rollup family (caches.clj summarizes
  * per-key; this propagates across keys).
  */
object Graph {

  val iterations = 3

  /** Iteration count, retunable per session via
    * `graft.pagerank.iterations` (default `iterations` — the oracle
    * replays the default, so gated runs leave the conf unset).
    */
  def iterationsOf(spark: SparkSession): Int =
    spark.conf.getOption("graft.pagerank.iterations").map { v =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft.pagerank.iterations must be a positive int, got '$v'"))
      require(n >= 1, s"graft.pagerank.iterations must be >= 1, got $n")
      n
    }.getOrElse(iterations)

  /** Production posture for deep runs: checkpoint the rank relation
    * between supersteps (`graft.pagerank.checkpoint=true`), truncating
    * the unrolled join lineage the same way the edge relation already
    * is. Changes no result (spec-pinned) — at 3 iterations the lineage
    * is shallow enough that the extra materialization isn't worth it,
    * which is why the default is off.
    */
  def checkpointRanksOf(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.pagerank.checkpoint").exists { v =>
      v.toBooleanOption.getOrElse(throw new IllegalArgumentException(
        s"graft.pagerank.checkpoint must be true/false, got '$v'"))
    }

  /** The interaction pair relation (users even ids 2s, objects odd
    * 2o+1 — the two id spaces cannot collide) from any extracted
    * tuple stream.
    */
  private[graft] def fwdPairs(tuples: DataFrame): DataFrame =
    tuples.select((col("s") * 2).as("src"), (col("o") * 2 + 1).as("dst"))
      .distinct()

  /** Node encoding: users ride even ids (2s), objects odd (2o+1) —
    * the two id spaces cannot collide.
    */
  def qPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    pagerankFrom(fwdPairs(Transform.extract(spark, sfDir)),
      iters = iterationsOf(spark),
      checkpointRanks = checkpointRanksOf(spark))
  }

  /** The rank iteration over any distinct (src, dst) pair relation -
    * shared by the batch face and the incremental store face.
    */
  private[graft] def pagerankFrom(
      fwdPairs: DataFrame, iters: Int = iterations,
      checkpointRanks: Boolean = false): DataFrame = {
    // materialize the distinct pair relation ONCE (localCheckpoint
    // truncates lineage, ≙ the reliable checkpoint an iterative graph
    // job takes between supersteps) - without it every iteration's
    // unrolled plan re-derives the scan + distinct
    val fwd = fwdPairs.localCheckpoint()
    // undirected walk: each interaction pair contributes both arcs;
    // even→odd and odd→even cannot duplicate, so unionAll is exact
    val edges = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("v"), col("d"))
    var ranks = deg.select(col("v"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val share = ranks.join(deg, "v")
        .select(col("v").as("src"), expr("r DIV d").as("c"))
      val contribs = edges.join(share, "src")
        .groupBy(col("dst").as("v")).agg(sum(col("c")).as("S"))
      ranks = deg.select(col("v"))
        .join(contribs, Seq("v"), "left")
        .select(col("v"), expr(
          "150000L + (17L * coalesce(S, 0L)) DIV 20L").as("r"))
      if (checkpointRanks) ranks = ranks.localCheckpoint()
    }
    ranks.select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("r").as("rank_mu"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  val qPagerankSql: String = {
    val iters = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS v, sum(r.r // g.d) AS S
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.v
         |  JOIN deg g ON e.src = g.v
         |  GROUP BY 1
         |), r$i AS (
         |  SELECT g.v,
         |    CAST(150000 + (17 * COALESCE(c.S, 0)) // 20 AS BIGINT) AS r
         |  FROM deg g LEFT JOIN c$i c ON g.v = c.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |edges AS (
       |  SELECT src, dst FROM fwd
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM fwd
       |),
       |deg AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY 1),
       |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(v // 2 AS BIGINT) AS node_id,
       |  CAST(r AS BIGINT) AS rank_mu
       |FROM r$iterations ORDER BY node_kind, node_id""".stripMargin
  }

  // ---- q_cooccur: item co-occurrence ---------------------------------

  /** Per-user degree cap and the minimum support for an emitted pair. */
  val cooccurMaxDeg = 128
  val cooccurMinCnt = 2L

  /** Item-item co-occurrence: object pairs interacted with by ≥ 2
    * common users — the co-visitation matrix behind "users who touched
    * X also touched Y" and the similarity prior recommenders start
    * from. The pair fan-out is quadratic in per-user degree, so users
    * above `cooccurMaxDeg` distinct objects are EXCLUDED outright (the
    * standard bot/power-user mitigation: their pairs are pure noise
    * and their deg² dominates the join) — a deterministic rule both
    * engines apply identically, not a sample.
    *
    * 100 TB shape: one (user)-keyed distinct+collect (map-combinable),
    * pair explode IN-ROW from each user's ≤ cap-sized sorted array
    * (fan bounded at ~8k per user by the cap), one (o1, o2)-keyed
    * map-combinable count. No self-join of the event log — the oracle
    * uses one (it has no array explode), which is exactly the plan
    * this formulation avoids.
    */
  def qCooccur(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    cooccurFrom(Transform.extract(spark, sfDir))
  }

  private[graft] def cooccurFrom(tuples: DataFrame): DataFrame =
    tuples.select(col("s"), col("o")).distinct()
      .groupBy(col("s"))
      .agg(sort_array(collect_set(col("o"))).as("os"))
      .filter(size(col("os")).between(2, cooccurMaxDeg))
      .select(explode(expr(
        """flatten(transform(os, (x, i) ->
          |  transform(slice(os, i + 2, size(os) - i - 1),
          |    y -> named_struct('o1', x, 'o2', y))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.o1").as("o1"), col("p.o2").as("o2"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= cooccurMinCnt)
      .orderBy(col("o1"), col("o2"))

  val qCooccurSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg USING (s)
       |  WHERE deg.d BETWEEN 2 AND $cooccurMaxDeg
       |)
       |SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |ORDER BY o1, o2""".stripMargin
}
