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

  /** The distinct interaction pair relation memoized per (session,
    * corpus) with the SignatureStore discipline: all seven batch graph
    * faces that walk the SAME encoded pair relation (pagerank, PPR,
    * HITS, concomp, BFS, degree distribution, assortativity) used to
    * pay the extract + distinct scan independently — the shared floor
    * of the r12 100× probes (concomp 15.3 s / assortativity 18.2 s at
    * 10M events, each mostly re-deriving this relation). At 100 TB
    * this is the edge table a deployment materializes once between
    * the log and every graph consumer. Stream/store faces keep their
    * own snapshot-derived relations (their state IS the edge store).
    */
  private val pairCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def fwdPairsFor(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    // sweep entries pinned to stopped sessions (the centCache pattern)
    val it = pairCache.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    pairCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      // localCheckpoint, not persist: every consumer face re-ran its
      // own defensive localCheckpoint() on the memoized relation (one
      // materialization job per graph query); storing the flat
      // LogicalRDD leaf makes `materialized` a no-op for all of them
      fwdPairs(Transform.extract(s, dir)).localCheckpoint()
    })
  }

  /** Materialize an iteration input once — but not twice: relations
    * already landed as a LogicalRDD leaf (the memoized pair/projection
    * relations, anything out of `localCheckpoint`) pass through.
    */
  private[graft] def materialized(df: DataFrame): DataFrame =
    if (org.apache.spark.sql.GraftBridge.isMaterializedLeaf(df)) df
    else df.localCheckpoint()

  /** The lift-filtered co-visitation projection, session-shared: all
    * cohesion faces (triangles, transitivity, k-core, k-truss, LPA,
    * modularity, LCC) walk the SAME (o1 < o2) edge relation, and each
    * used to re-run the capped set-build + in-row pair explode + lift
    * joins + its own checkpoint. At 100 TB this projection is the
    * object-graph table a deployment materializes once between the
    * event log and every graph consumer (the `fwdPairsFor` argument,
    * one level up the cohesion stack). Stream/store faces keep their
    * snapshot-derived relations.
    */
  private val projCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def projEdgesFor(spark: SparkSession,
                                  sfDir: String): DataFrame = {
    val it = projCache.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    projCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      val act = capActive(Transform.extract(s, dir)).localCheckpoint()
      val nu = act.agg(count(lit(1)).as("n"))
      val od = act.select(explode(col("os")).as("o"))
        .groupBy(col("o")).agg(count(lit(1)).as("c"))
      liftEdges(pairCounts(act).filter(col("cnt") >= cooccurMinCnt),
        od, nu).localCheckpoint()
    })
  }

  def releaseAll(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    pairCache.keySet.asScala.filter(_._1 eq spark).toSeq
      .foreach(k => Option(pairCache.remove(k)).foreach(
        org.apache.spark.sql.GraftBridge.unpersistMaterialized))
    projCache.keySet.asScala.filter(_._1 eq spark).toSeq
      .foreach(k => Option(projCache.remove(k)).foreach(
        org.apache.spark.sql.GraftBridge.unpersistMaterialized))
  }

  /** The memo build PRICED ON ITS OWN BENCH LINE (VERDICT r13 #5):
    * r13's q_pagerank regression (1.49× min) was pure attribution —
    * whichever graph query runs first pays the one-time
    * `fwdPairsFor` extract + distinct + persist for the whole block.
    * This face builds the memo and emits its summary (count + node
    * cardinalities — forcing full materialization), so in the bench
    * (where it runs BEFORE the graph block) per-query graph numbers
    * price their own plan, and a regression in the memo itself is
    * visible on this line instead of smeared into pagerank's.
    */
  def graphMemoBuild(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    fwdPairsFor(spark, sfDir)
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("src")).as("n_src"),
        countDistinct(col("dst")).as("n_dst"))
  }

  val graphMemoBuildSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |p AS (SELECT DISTINCT s * 2 AS src, o * 2 + 1 AS dst FROM tuples)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT src) AS BIGINT) AS n_src,
       |  CAST(count(DISTINCT dst) AS BIGINT) AS n_dst
       |FROM p""".stripMargin

  /** Node encoding: users ride even ids (2s), objects odd (2o+1) —
    * the two id spaces cannot collide.
    */
  def qPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    pagerankFrom(fwdPairsFor(spark, sfDir),
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
    val fwd = materialized(fwdPairs)
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

  // ---- q_ppr: personalized PageRank ----------------------------------

  /** Seed cohort rule: user nodes whose subject id is a multiple of
    * this (a deterministic stand-in for "the segment we personalize
    * for" — the cohort is a parameter; what's gated is the restart
    * math).
    */
  val pprSeedMod = 10L

  /** PERSONALIZED PageRank: the same integer micro-unit walk as
    * `q_pagerank`, with teleport mass restricted to a SEED cohort —
    * the recommender staple ("importance as seen from this segment"):
    * r'(v) = [v ∈ S]·150000 + (17·Σ_{u→v} r(u) DIV d(u)) DIV 20,
    * seeds initialized at 1e6 and everything else at 0, so after k
    * iterations exactly the ≤ k-hop neighborhood of the cohort
    * carries mass (emitted rows are the r > 0 support — on a
    * bipartite graph the reach alternates sides, which the spec
    * pins). Same 100 TB shape as the global walk: one materialized
    * edge relation, per-iteration one src-keyed join + one
    * map-combinable dst-keyed sum; the seed flag is a node-sized
    * broadcast.
    */
  def qPpr(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    pprFrom(fwdPairsFor(spark, sfDir))
  }

  private[graft] def pprFrom(fwdPairs: DataFrame,
                             iters: Int = iterations): DataFrame = {
    val fwd = materialized(fwdPairs)
    val edges = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("v"), col("d"))
      .withColumn("seed",
        (pmod(col("v"), lit(2)) === 0 &&
          pmod(expr("v DIV 2"), lit(pprSeedMod)) === 0).cast("int"))
    var ranks = deg.select(col("v"),
      (col("seed") * lit(1000000L)).as("r"))
    for (_ <- 1 to iters) {
      val share = ranks.join(deg.select(col("v"), col("d")), "v")
        .select(col("v").as("src"), expr("r DIV d").as("c"))
      val contribs = edges.join(share, "src")
        .groupBy(col("dst").as("v")).agg(sum(col("c")).as("S"))
      ranks = deg.select(col("v"), col("seed"))
        .join(contribs, Seq("v"), "left")
        .select(col("v"), expr(
          "CAST(seed AS BIGINT) * 150000L" +
            " + (17L * coalesce(S, 0L)) DIV 20L").as("r"))
    }
    ranks.filter(col("r") > 0)
      .select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("r").as("rank_mu"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  val qPprSql: String = {
    val iters = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS v, sum(r.r // g.d) AS S
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.v
         |  JOIN deg g ON e.src = g.v
         |  GROUP BY 1
         |), r$i AS (
         |  SELECT g.v,
         |    CAST(g.seed * 150000 + (17 * COALESCE(c.S, 0)) // 20
         |      AS BIGINT) AS r
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
       |deg AS (
       |  SELECT src AS v, count(*) AS d,
       |    CAST(src % 2 = 0 AND (src // 2) % $pprSeedMod = 0 AS INT)
       |      AS seed
       |  FROM edges GROUP BY src
       |),
       |r0 AS (SELECT v, CAST(seed * 1000000 AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(v // 2 AS BIGINT) AS node_id,
       |  CAST(r AS BIGINT) AS rank_mu
       |FROM r$iterations WHERE r > 0
       |ORDER BY node_kind, node_id""".stripMargin
  }

  // ---- q_katz: Katz centrality ----------------------------------------

  /** Katz attenuation 1/katzAlphaDen per hop — 1/8 keeps the series
    * contraction safe for any degree the gate graphs carry (the walk
    * is truncated at `iterations` anyway, so convergence is a
    * well-conditioning choice, not a requirement).
    */
  val katzAlphaDen = 8L

  /** KATZ centrality: x(v) = Σ_k α^k · (# walks of length k ending at
    * v), truncated at `iterations` — the centrality member that counts
    * WALKS instead of PageRank's degree-normalized mass (a node
    * adjacent to hubs scores high even when the hubs' attention is
    * divided; the classic complement in the centrality family:
    * pagerank = random surfer, PPR = seeded surfer, HITS = mutual
    * reinforcement, Katz = attenuated walk counting). Integer
    * micro-units with truncating division:
    * x'(v) = (Σ_{u→v} (x(u) + 10⁶)) DIV katzAlphaDen — the +1 per
    * neighbor is Katz's β·A·1 drive term, α = 1/katzAlphaDen the
    * attenuation, both exact on both engines.
    *
    * 100 TB shape: identical to the pagerank loop on the SAME
    * memoized pair relation (`fwdPairsFor`) — per iteration one
    * src-keyed join against the node-sized score relation and one
    * map-combinable dst-keyed sum; no degree join at all (walks are
    * not normalized), so it is strictly cheaper than the pagerank
    * round.
    */
  def qKatz(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    katzFrom(fwdPairsFor(spark, sfDir), iters = iterationsOf(spark))
  }

  private[graft] def katzFrom(fwdPairs: DataFrame,
                              iters: Int = iterations): DataFrame = {
    val fwd = materialized(fwdPairs)
    val edges = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = edges.select(col("src").as("v")).distinct()
    var x = nodes.select(col("v"), lit(0L).as("x"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(x.select(col("v").as("src"), col("x")), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(col("x") + lit(1000000L)).as("S"))
      x = nodes.join(contribs, Seq("v"), "left")
        .select(col("v"), expr(
          s"coalesce(S, 0L) DIV ${katzAlphaDen}L").as("x"))
    }
    x.select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("x").as("katz_mu"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  val qKatzSql: String = {
    val iters = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS v, sum(x.x + 1000000) AS S
         |  FROM edges e
         |  JOIN x${i - 1} x ON e.src = x.v
         |  GROUP BY 1
         |), x$i AS (
         |  SELECT n.v,
         |    CAST(COALESCE(c.S, 0) // $katzAlphaDen AS BIGINT) AS x
         |  FROM nodes n LEFT JOIN c$i c ON n.v = c.v
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
       |nodes AS (SELECT DISTINCT src AS v FROM edges),
       |x0 AS (SELECT v, CAST(0 AS BIGINT) AS x FROM nodes),
       |$iters
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(v // 2 AS BIGINT) AS node_id,
       |  CAST(x AS BIGINT) AS katz_mu
       |FROM x$iterations ORDER BY node_kind, node_id""".stripMargin
  }

  // ---- q_hits: hubs and authorities -----------------------------------

  /** HITS (Kleinberg 1999) over the DIRECTED user→object arcs — the
    * mutual-reinforcement member next to the random-walk ranks: a
    * hub is a user whose interactions point at strong objects, an
    * authority an object pointed at by strong hubs. On the bipartite
    * interaction graph the two roles separate exactly by side, which
    * is why this face keeps the fwd arcs directed (PageRank walks
    * both ways; HITS must not, or hubs and authorities collapse).
    *
    * Determinism scheme: scores in integer MICRO-shares. Each
    * half-step sums the opposite side's scores along arcs, then
    * normalizes to shares of 10⁶ with ONE floor division —
    * a'(o) = (10⁶·Σ_{u→o} h(u)) DIV Σ_o Σ_{u→o} h(u) — so both
    * engines see identical integers and the usual L2 normalization's
    * irrational sqrt never appears (L1 vs L2 changes only the scale
    * of the fixpoint, not its direction — the standard HITS
    * invariance). Overflow bound: the 10⁶·raw numerator stays under
    * 2⁶³ while #arcs < 9·10⁶ × maxdeg-adjusted bounds at gate scale;
    * post-normalization iterations are bounded by 10⁶·maxdeg.
    *
    * 100 TB shape: per half-iteration ONE key-partitioned join of the
    * arc relation against the node-sized score relation and one
    * map-combinable keyed sum; the normalizer is a 1-row broadcast.
    * Same Pregel-as-joins plan as the walk family, same session
    * iteration knob.
    */
  def qHits(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    hitsFrom(fwdPairsFor(spark, sfDir),
      iters = iterationsOf(spark))
  }

  /** The mutual-reinforcement iteration over any distinct directed
    * (src, dst) arc relation — shared by the batch face and the
    * 48m store's query-time view.
    */
  private[graft] def hitsFrom(fwdPairs: DataFrame,
                              iters: Int = iterations): DataFrame = {
    val fwd = materialized(fwdPairs)
    var hubs = fwd.select(col("src")).distinct()
      .withColumn("h", lit(1000000L))
    var auth = fwd.select(col("dst")).distinct()
      .withColumn("a", lit(1000000L))
    for (_ <- 1 to iters) {
      // each raw half-step sum is referenced TWICE (normalizer agg +
      // the normalized projection) and feeds the next half-step, so
      // without materialization the unrolled lineage re-evaluates
      // every upstream join 2^(2·iters) times — localCheckpoint the
      // node-sized relation once per half-step (the pagerank
      // superstep-checkpoint argument, mandatory here because the
      // recursion is mutual). Measured at sf0.1: 6.95s unmaterialized
      // → parity with the global walk (1.07x q_pagerank, same run).
      val rawA = fwd.join(hubs, "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("ra"))
        .localCheckpoint()
      auth = rawA.crossJoin(broadcast(rawA.agg(sum(col("ra")).as("at"))))
        .select(col("dst"), expr("(1000000L * ra) DIV at").as("a"))
      val rawH = fwd.join(auth, "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("rh"))
        .localCheckpoint()
      hubs = rawH.crossJoin(broadcast(rawH.agg(sum(col("rh")).as("ht"))))
        .select(col("src"), expr("(1000000L * rh) DIV ht").as("h"))
    }
    hubs.select(lit("hub").as("role"), expr("src DIV 2").as("node_id"),
        col("h").as("score_mu"))
      .unionAll(auth.select(lit("auth").as("role"),
        expr("dst DIV 2").as("node_id"), col("a").as("score_mu")))
      .orderBy(col("role"), col("node_id"))
  }

  val qHitsSql: String = {
    val steps = (1 to iterations).map { i =>
      s"""ra$i AS (
         |  SELECT f.dst, sum(h.h) AS ra
         |  FROM fwd f JOIN h${i - 1} h ON f.src = h.src GROUP BY 1
         |), a$i AS (
         |  SELECT dst, (1000000 * ra) // (SELECT sum(ra) FROM ra$i) AS a
         |  FROM ra$i
         |), rh$i AS (
         |  SELECT f.src, sum(a.a) AS rh
         |  FROM fwd f JOIN a$i a ON f.dst = a.dst GROUP BY 1
         |), h$i AS (
         |  SELECT src, (1000000 * rh) // (SELECT sum(rh) FROM rh$i) AS h
         |  FROM rh$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |h0 AS (SELECT DISTINCT src, CAST(1000000 AS BIGINT) AS h FROM fwd),
       |$steps
       |SELECT 'hub' AS role, CAST(src // 2 AS BIGINT) AS node_id,
       |  CAST(h AS BIGINT) AS score_mu
       |FROM h$iterations
       |UNION ALL
       |SELECT 'auth' AS role, CAST(dst // 2 AS BIGINT) AS node_id,
       |  CAST(a AS BIGINT) AS score_mu
       |FROM a$iterations
       |ORDER BY role, node_id""".stripMargin
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

  /** The cap-filtered per-user object-set relation (s, os sorted) —
    * the shared front half of the co-occurrence and triangle faces.
    */
  private[graft] def capActive(tuples: DataFrame): DataFrame =
    tuples.select(col("s"), col("o")).distinct()
      .groupBy(col("s"))
      .agg(sort_array(collect_set(col("o"))).as("os"))
      .filter(size(col("os")).between(2, cooccurMaxDeg))

  /** In-row pair explode + support count over the capped set relation:
    * (o1 < o2, cnt) with no self-join of the event log.
    */
  private[graft] def pairCounts(act: DataFrame): DataFrame =
    act.select(explode(expr(
        """flatten(transform(os, (x, i) ->
          |  transform(slice(os, i + 2, size(os) - i - 1),
          |    y -> named_struct('o1', x, 'o2', y))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.o1").as("o1"), col("p.o2").as("o2"))
      .agg(count(lit(1)).as("cnt"))

  private[graft] def cooccurFrom(tuples: DataFrame): DataFrame =
    pairCounts(capActive(tuples))
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

  // ---- q_triangles: degree-oriented triangle counting ----------------

  /** Lift gate for a co-visitation edge: keep (o1, o2) iff
    * cnt·n_users > (liftNum/liftDen)·deg(o1)·deg(o2) — i.e. the pair
    * co-occurs ≥ 5% more than independent popularity predicts. The
    * rule is exact integer arithmetic (`liftDen·cnt·n > liftNum·c1·c2`)
    * and SCALE-INVARIANT: an absolute count threshold that sparsifies
    * sf0.01 leaves sf0.001 empty and 100× data complete, a lift ratio
    * filters the same "surprising" fraction at any volume.
    */
  val triLiftNum = 21L
  val triLiftDen = 20L

  /** Per-node triangle participation over the lift-filtered
    * co-visitation graph — the cohesion signal behind community
    * detection and local clustering coefficients (and, in a curation
    * pipeline, the "tightly-knit near-duplicate neighborhood" smell on
    * a doc↔domain link graph). The user↔object interaction graph is
    * bipartite (triangle-free by construction), so the faces count on
    * the object-object PROJECTION: edges are co-visitation pairs with
    * support ≥ `cooccurMinCnt` AND lift above `triLiftNum/triLiftDen`.
    *
    * 100 TB shape: the classic degree-orientation plan. Each edge is
    * directed from its lexicographically smaller (degree, id) endpoint,
    * turning every triangle into exactly ONE wedge+closure — the wedge
    * self-join's volume is Σ_v outdeg(v)², bounded by O(|E|^{3/2})
    * regardless of skew (a hub of degree d orients its edges INWARD,
    * so it closes wedges rather than fanning them out). One src-keyed
    * self-join (the wedge), one (a, b)-keyed join against the edge set
    * (the closure), one map-combinable count — the projection itself
    * reuses the co-occurrence family's in-row pair explode, so nothing
    * here self-joins the event log. The edge relation is
    * localCheckpoint'd once (pagerank's discipline): both orientation
    * sides and the closure probe read the materialized relation, not
    * three re-derivations of the pair explode.
    *
    * Reference: extends the graph family (pagerank = fixed-point,
    * paths/markov = sequence, cooccur = projection; this adds the
    * motif/cohesion member).
    */
  def qTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    trianglesFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def trianglesFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    trianglesFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** The lift gate over any (o1, o2, cnt) pair relation with its
    * (o, c) object-degree relation and 1-row user count — shared by
    * the batch face and the streaming face's snapshot view. od is
    * object-cardinality-sized and nu one row → both broadcast.
    */
  private[graft] def liftEdges(pairs: DataFrame, od: DataFrame,
                               nu: DataFrame): DataFrame =
    pairs
      .join(broadcast(od.select(col("o").as("o1"), col("c").as("c1"))),
        "o1")
      .join(broadcast(od.select(col("o").as("o2"), col("c").as("c2"))),
        "o2")
      .crossJoin(broadcast(nu))
      .filter(lit(triLiftDen) * col("cnt") * col("n") >
        lit(triLiftNum) * col("c1") * col("c2"))
      .select(col("o1"), col("o2"))

  /** Degree-orientation triangle counting over any (o1 < o2) edge
    * relation — shared by both faces. The edge relation materializes
    * once (localCheckpoint): orientation sides and the closure probe
    * read it, not three re-derivations.
    */
  private[graft] def trianglesFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val deg = e.select(col("o1").as("v"))
      .unionAll(e.select(col("o2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient each edge from the smaller (degree, id) endpoint: every
    // triangle becomes exactly one wedge at its lowest-order corner
    val low = (col("d1") < col("d2")) ||
      (col("d1") === col("d2") && col("o1") < col("o2"))
    val ori = e
      .join(broadcast(deg.select(col("v").as("o1"), col("d").as("d1"))),
        "o1")
      .join(broadcast(deg.select(col("v").as("o2"), col("d").as("d2"))),
        "o2")
      .select(when(low, col("o1")).otherwise(col("o2")).as("src"),
        when(low, col("o2")).otherwise(col("o1")).as("dst"))
    val tri = ori.select(col("src"), col("dst").as("a"))
      .join(ori.select(col("src"), col("dst").as("b")), "src")
      .filter(col("a") < col("b"))
      .join(e.select(col("o1").as("a"), col("o2").as("b")),
        Seq("a", "b"))
    tri.select(explode(array(col("src"), col("a"), col("b")))
        .as("node_id"))
      .groupBy(col("node_id")).agg(count(lit(1)).as("tri_cnt"))
      .orderBy(col("node_id"))
  }

  // ---- q_transitivity: global clustering ratio -------------------------

  /** GLOBAL TRANSITIVITY of the lift-filtered projection —
    * 3·triangles / wedges, the one-number cohesion summary bracketing
    * the per-node readings (q_triangles = where the motifs are,
    * q_lcc = each node's closure rate; this is the corpus-level
    * "do acquaintances of acquaintances know each other" ratio, the
    * number small-world papers lead with). Exact: wedges as
    * Σ d(d−1) (even per term, halved by integer division), closed
    * wedges as 3·triangle-count off the same degree-oriented plan as
    * q_triangles; the ratio is one pinned double chain
    * 2·t3/w2 ≡ 3T/W, q6, NULL-guarded on wedge-free projections.
    *
    * 100 TB shape: the triangle closure join dominates (the
    * O(|E|^{3/2}) degree-orientation bound); the wedge count is one
    * map-combinable degree agg on top — no new join anywhere.
    */
  def qTransitivity(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    transitivityFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def transitivityFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    transitivityFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  private val transitivityExpr: String =
    "CAST(2 AS DOUBLE) * CAST(t3 AS DOUBLE) / CAST(w2 AS DOUBLE)"

  /** The ratio over any (o1 < o2) edge relation — shared by all three
    * faces (degrees, wedges and closures are whole-projection facts).
    */
  private[graft] def transitivityFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val deg = e.select(col("o1").as("v"))
      .unionAll(e.select(col("o2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val w2 = deg.agg(
      coalesce(sum(col("d") * (col("d") - 1)), lit(0L)).as("w2"))
    val t3 = trianglesFromEdges(e)
      .agg(coalesce(sum(col("tri_cnt")), lit(0L)).as("t3"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(w2))
      .crossJoin(broadcast(t3))
      .select(col("n_edges"),
        expr("w2 DIV 2").as("n_wedges"),
        expr("t3 DIV 3").as("n_triangles"),
        when(col("w2") > 0,
          graft.pipeline.ParityMath.q6(expr(transitivityExpr)))
          .as("transitivity"))
  }

  val qTransitivitySql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |deg AS (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT o1 AS v FROM e UNION ALL SELECT o2 AS v FROM e
       |  ) GROUP BY 1
       |),
       |ori AS (
       |  SELECT
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.o1 < e.o2)
       |         THEN e.o1 ELSE e.o2 END AS src,
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.o1 < e.o2)
       |         THEN e.o2 ELSE e.o1 END AS dst
       |  FROM e JOIN deg da ON e.o1 = da.v JOIN deg db ON e.o2 = db.v
       |),
       |tri AS (
       |  SELECT w.src, w.a, w.b FROM (
       |    SELECT e1.src, e1.dst AS a, e2.dst AS b
       |    FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
       |  ) w JOIN e ON w.a = e.o1 AND w.b = e.o2
       |),
       |wsum AS (
       |  SELECT CAST(coalesce(sum(d * (d - 1)), 0) AS BIGINT) AS w2
       |  FROM deg
       |),
       |tsum AS (SELECT CAST(count(*) * 3 AS BIGINT) AS t3 FROM tri),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
       |SELECT m.n_edges,
       |  CAST(w2 // 2 AS BIGINT) AS n_wedges,
       |  CAST(t3 // 3 AS BIGINT) AS n_triangles,
       |  CASE WHEN w2 > 0
       |  THEN ${graft.pipeline.ParityMath.q6Sql(transitivityExpr)}
       |  END AS transitivity
       |FROM m, wsum, tsum""".stripMargin

  // ---- q_kcore: bounded-round core decomposition ---------------------

  /** Core threshold and the peel-round safety budget. Spark peels to
    * the FIXPOINT (true k-core) and fails loudly past the budget; the
    * oracle unrolls the full budget — post-convergence rounds are
    * no-ops over the (tiny, materialized) converged relation, so the
    * two agree exactly whenever the Spark side's convergence assert
    * holds. Peel depth is data-dependent (a whisker chain peels one
    * layer per round — the sf0.1 projection takes 15 rounds to reveal
    * an EMPTY 3-core), which is why a small fixed budget would be
    * dishonest and an unbounded oracle impossible.
    */
  val kcoreK = 3
  val kcoreMaxRounds = 32

  /** K-CORE survivors over the lift-filtered co-visitation graph —
    * the global-cohesion twin of `q_triangles`' local motif count
    * (a node can sit on many triangles yet hang off a whisker; the
    * core demands every member keep ≥ k neighbors AFTER its weak
    * neighbors are peeled). Emits the fixpoint core with each node's
    * residual in-core degree.
    *
    * 100 TB shape: each round is one map-combinable degree count over
    * the surviving edge relation + two semi-joins against the
    * (node-sized, broadcast) survivor set — the standard
    * Pregel-as-joins peel, localCheckpoint'd between rounds (the
    * pagerank discipline), with one driver-side count() per round as
    * the convergence test (GraphX's loop shape; the count is the
    * cheapest possible action over the already-materialized edges).
    */
  def qKcore(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    kcoreFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def kcoreFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    kcoreFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** The fixpoint peel over any (o1 < o2) edge relation — shared by
    * the batch face and the streaming face's snapshot view.
    */
  private[graft] def kcoreFromEdges(edges: DataFrame): DataFrame = {
    var e = materialized(edges)
    var edgeCount = e.count()
    var stable = false
    var round = 0
    while (!stable && round < kcoreMaxRounds) {
      val deg = e.select(col("o1").as("v"))
        .unionAll(e.select(col("o2").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val live = deg.filter(col("d") >= kcoreK).select(col("v"))
      // LAZY checkpoint + count = ONE action per round: the count job
      // both materializes every checkpoint block (full consumption, so
      // no fill-in job) and delivers the convergence test - the eager
      // checkpoint paid a second, separate job per peel round
      val next = e
        .join(broadcast(live.withColumnRenamed("v", "o1")), "o1")
        .join(broadcast(live.withColumnRenamed("v", "o2")), "o2")
        .select(col("o1"), col("o2"))
        .localCheckpoint(false)
      val m = next.count()
      // peeling only removes: an unchanged edge count means no node
      // fell below k -> fixpoint
      stable = m == edgeCount
      e = next; edgeCount = m; round += 1
    }
    require(stable || edgeCount == 0L,
      s"k-core peel exceeded the $kcoreMaxRounds-round budget " +
        s"($edgeCount edges still unstable) - raise kcoreMaxRounds and the " +
        s"oracle's unroll together")
    e.select(col("o1").as("v")).unionAll(e.select(col("o2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= kcoreK)
      .select(col("v").as("node_id"), col("core_deg"))
      .orderBy(col("node_id"))
  }

  val qKcoreSql: String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    // each round references its predecessor twice - unrolled depth d
    // would otherwise re-derive the base 2^d times
    val peels = (1 to kcoreMaxRounds).map { i =>
      s"""d$i AS (
         |  SELECT v, count(*) AS d FROM (
         |    SELECT unnest([o1, o2]) AS v FROM e${i - 1}
         |  ) GROUP BY 1
         |), n$i AS (SELECT v FROM d$i WHERE d >= $kcoreK),
         |e$i AS MATERIALIZED (
         |  SELECT e.o1, e.o2 FROM e${i - 1} e
         |  JOIN n$i a ON e.o1 = a.v JOIN n$i b ON e.o2 = b.v
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e0 AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |$peels
       |SELECT v AS node_id, CAST(count(*) AS BIGINT) AS core_deg FROM (
       |  SELECT unnest([o1, o2]) AS v FROM e$kcoreMaxRounds
       |) GROUP BY 1 HAVING count(*) >= $kcoreK
       |ORDER BY node_id""".stripMargin
  }

  // ---- q_ktruss: triangle-support edge peel ----------------------------

  /** Truss order and the peel-round budget (loud past it, the kcore
    * contract).
    */
  val trussK = 4
  val trussMaxRounds = 16

  /** K-TRUSS of the lift-filtered co-visitation projection — the edge
    * member completing the cohesion ladder (25q4 counts triangles,
    * 25q6 peels NODES by degree; this peels EDGES by triangle
    * support, the strictly stronger community backbone: every edge of
    * a k-truss sits in ≥ k−2 triangles that themselves survive, so a
    * chain or a star that k-core keeps is stripped). Each round
    * enumerates triangles over the surviving canonical (o1 < o2)
    * edges (one a-keyed wedge join + one closing hash join — the
    * O(|E|^1.5) class q_triangles pays once, paid per peel round),
    * folds per-edge support, and drops edges below `trussK` − 2;
    * an unchanged edge count is the fixpoint (peeling only removes).
    * Output: the surviving edges with their FIXPOINT support.
    *
    * 100 TB shape: rounds of map-combinable joins on the TINY lifted
    * projection (the graph family's shared posture), localCheckpoint
    * between rounds; the oracle unrolls the same rounds as
    * MATERIALIZED CTEs — extra rounds past the fixpoint are no-ops,
    * so the fixed unroll and the early-exit loop agree exactly.
    */
  def qKtruss(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    trussFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def trussFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    trussFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** One round's per-edge triangle support over a canonical
    * (o1 < o2) edge relation.
    */
  private def trussSupport(e: DataFrame): DataFrame =
    e.select(col("o1").as("a"), col("o2").as("b"))
      .join(e.select(col("o1").as("a"), col("o2").as("c")), "a")
      .filter(col("b") < col("c"))
      .join(e.select(col("o1").as("b"), col("o2").as("c")),
        Seq("b", "c"))
      .select(explode(array(
        struct(col("a").as("o1"), col("b").as("o2")),
        struct(col("a").as("o1"), col("c").as("o2")),
        struct(col("b").as("o1"), col("c").as("o2")))).as("ed"))
      .select(col("ed.o1").as("o1"), col("ed.o2").as("o2"))
      .groupBy(col("o1"), col("o2"))
      .agg(count(lit(1)).as("support"))

  /** The fixpoint edge peel over any (o1 < o2) edge relation — shared
    * by the batch face and the stream/store faces' snapshot views.
    */
  private[graft] def trussFromEdges(edges: DataFrame): DataFrame = {
    val minSup = trussK - 2
    var e = materialized(edges)
    var edgeCount = e.count()
    var stable = edgeCount == 0L
    var round = 0
    while (!stable && round < trussMaxRounds) {
      val sup = trussSupport(e)
      // lazy checkpoint + count: one action per peel round (kcore's
      // fused materialize-and-count discipline)
      val next = e.join(sup, Seq("o1", "o2"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= minSup)
        .select(col("o1"), col("o2"))
        .localCheckpoint(false)
      val m = next.count()
      stable = m == edgeCount || m == 0L
      e = next; edgeCount = m; round += 1
    }
    require(stable,
      s"k-truss peel exceeded the $trussMaxRounds-round budget " +
        s"($edgeCount edges still unstable) - raise trussMaxRounds " +
        "and the oracle's unroll together")
    e.join(trussSupport(e), Seq("o1", "o2"))
      .select(col("o1"), col("o2"), col("support"))
      .orderBy(col("o1"), col("o2"))
  }

  val qKtrussSql: String = {
    val minSup = trussK - 2
    def supCte(i: Int, src: String) =
      s"""t$i AS (
         |  SELECT ed.o1, ed.o2, CAST(count(*) AS BIGINT) AS support
         |  FROM (
         |    SELECT unnest([
         |        {'o1': ab.a, 'o2': ab.b},
         |        {'o1': ab.a, 'o2': cc.c},
         |        {'o1': ab.b, 'o2': cc.c}]) AS ed
         |    FROM (SELECT o1 AS a, o2 AS b FROM $src) ab
         |    JOIN (SELECT o1 AS a, o2 AS c FROM $src) cc USING (a)
         |    JOIN (SELECT o1 AS b, o2 AS c FROM $src) bc
         |      ON bc.b = ab.b AND bc.c = cc.c
         |    WHERE ab.b < cc.c
         |  ) GROUP BY 1, 2
         |)""".stripMargin
    val peels = (1 to trussMaxRounds).map { i =>
      s"""${supCte(i, s"e${i - 1}")},
         |e$i AS MATERIALIZED (
         |  SELECT e.o1, e.o2 FROM e${i - 1} e
         |  LEFT JOIN t$i USING (o1, o2)
         |  WHERE coalesce(t$i.support, 0) >= $minSup
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e0 AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |$peels,
       |${supCte(trussMaxRounds + 1, s"e$trussMaxRounds")}
       |SELECT e.o1, e.o2, t${trussMaxRounds + 1}.support
       |FROM e$trussMaxRounds e
       |JOIN t${trussMaxRounds + 1} USING (o1, o2)
       |ORDER BY o1, o2""".stripMargin
  }

  val qTrianglesSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |deg AS (
       |  SELECT v, count(*) AS d FROM (
       |    SELECT o1 AS v FROM e UNION ALL SELECT o2 AS v FROM e
       |  ) GROUP BY 1
       |),
       |ori AS (
       |  SELECT
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.o1 < e.o2)
       |         THEN e.o1 ELSE e.o2 END AS src,
       |    CASE WHEN da.d < db.d OR (da.d = db.d AND e.o1 < e.o2)
       |         THEN e.o2 ELSE e.o1 END AS dst
       |  FROM e JOIN deg da ON e.o1 = da.v JOIN deg db ON e.o2 = db.v
       |),
       |tri AS (
       |  SELECT w.src, w.a, w.b FROM (
       |    SELECT e1.src, e1.dst AS a, e2.dst AS b
       |    FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
       |  ) w JOIN e ON w.a = e.o1 AND w.b = e.o2
       |)
       |SELECT node_id, CAST(count(*) AS BIGINT) AS tri_cnt
       |FROM (SELECT unnest([src, a, b]) AS node_id FROM tri)
       |GROUP BY 1 ORDER BY node_id""".stripMargin

  // ---- q_lcc: local clustering coefficient ----------------------------

  /** LOCAL CLUSTERING COEFFICIENT per node of the lift-filtered
    * co-visitation projection: lcc(v) = 2·tri(v) / (d(v)·(d(v)−1)) for
    * every node with projection degree ≥ 2 (nodes on no triangle
    * report 0) — the per-node "how clique-like is my neighborhood"
    * reading that q_triangles' motif counts and q_kcore's global peel
    * bracket: a node can carry many triangles yet low lcc (a hub) or
    * few yet lcc = 1 (a tight clique corner). One q6 double division
    * per node over exact integer counts.
    *
    * 100 TB shape: the same degree-oriented wedge+closure plan as
    * q_triangles (Σ outdeg² ≤ O(|E|^{3/2}) regardless of skew) plus
    * one node-keyed left join of the two node-sized relations —
    * nothing new touches the event log.
    */
  def qLcc(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    lccFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def lccFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    lccFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  private[graft] def lccFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val deg = e.select(col("o1").as("v"))
      .unionAll(e.select(col("o2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
    val tri = trianglesFromEdges(e)
      .select(col("node_id").as("v"), col("tri_cnt"))
    deg.join(tri, Seq("v"), "left")
      .filter(col("degree") >= 2)
      .select(col("v").as("node_id"), col("degree"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        graft.pipeline.ParityMath.q6(
          (lit(2L) * coalesce(col("tri_cnt"), lit(0L))).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .as("lcc"))
      .orderBy(col("node_id"))
  }

  val qLccSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |deg AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
       |    SELECT o1 AS v FROM e UNION ALL SELECT o2 AS v FROM e
       |  ) GROUP BY 1
       |),
       |ori AS (
       |  SELECT
       |    CASE WHEN da.degree < db.degree
       |           OR (da.degree = db.degree AND e.o1 < e.o2)
       |         THEN e.o1 ELSE e.o2 END AS src,
       |    CASE WHEN da.degree < db.degree
       |           OR (da.degree = db.degree AND e.o1 < e.o2)
       |         THEN e.o2 ELSE e.o1 END AS dst
       |  FROM e JOIN deg da ON e.o1 = da.v JOIN deg db ON e.o2 = db.v
       |),
       |tri AS (
       |  SELECT w.src, w.a, w.b FROM (
       |    SELECT e1.src, e1.dst AS a, e2.dst AS b
       |    FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
       |  ) w JOIN e ON w.a = e.o1 AND w.b = e.o2
       |),
       |tcnt AS (
       |  SELECT node_id, CAST(count(*) AS BIGINT) AS tri_cnt
       |  FROM (SELECT unnest([src, a, b]) AS node_id FROM tri)
       |  GROUP BY 1
       |)
       |SELECT d.v AS node_id, d.degree,
       |  CAST(COALESCE(t.tri_cnt, 0) AS BIGINT) AS tri_cnt,
       |  ${graft.pipeline.ParityMath.q6Sql(
            "CAST(2 * COALESCE(t.tri_cnt, 0) AS DOUBLE) " +
              "/ CAST(d.degree * (d.degree - 1) AS DOUBLE)")} AS lcc
       |FROM deg d LEFT JOIN tcnt t ON t.node_id = d.v
       |WHERE d.degree >= 2
       |ORDER BY node_id""".stripMargin

  // ---- q_linkpred: common-neighbor / Adamic-Adar link prediction -----

  /** Wedge centers above this degree are excluded: a hub center's
    * wedge fan is quadratic in its degree while its Adamic-Adar
    * evidence 1/ln(d) is the weakest in the graph — the standard
    * high-degree cutoff every production link predictor applies, and
    * the same OUTRIGHT-exclusion contract as `cooccurMaxDeg` (not a
    * sample of the hub's wedges, which would be volume-dependent).
    */
  val linkpredMaxDeg = 64

  /** Minimum common-neighbor support for an emitted candidate pair. */
  val linkpredMinCn = 2L

  /** LINK PREDICTION over the lift-filtered co-visitation projection —
    * the "which edge appears next" complement of `q_triangles`' "which
    * edges close now" (recommender candidate generation; in a curation
    * pipeline, the "these two near-dup clusters are about to merge"
    * early-warning on a doc↔domain graph). For every NON-adjacent pair
    * with >= `linkpredMinCn` shared neighbors, emits the
    * common-neighbor count and the Adamic-Adar score: each shared
    * neighbor z contributes 1/ln(deg(z)), quantized to integer
    * micro-units floor(1e6/ln(d) + 0.5) BEFORE the per-pair sum (the
    * NLL family's argument: integer addition commutes, so the total is
    * partition-order-independent; the one-shot ln is the accepted
    * cross-engine surface). deg(z) >= 2 for every wedge center by
    * construction, so ln is never 0.
    *
    * 100 TB shape: neighbor lists build with ONE map-combinable
    * aggregation over the (already lift-sparsified) edge relation;
    * wedge pairs explode IN-ROW from each center's sorted,
    * degree-capped list (fan bounded at cap²/2 per center); candidates
    * reduce map-combinably on (o1, o2); the known-edge removal is one
    * keyed LEFT ANTI join — no all-pairs anywhere, volume bounded by
    * Σ_z min(deg z, cap)².
    *
    * Reference: extends the graph family (pagerank = fixed point,
    * cooccur = projection, triangles/k-core = cohesion; this adds the
    * missing-edge/prediction member).
    */
  def qLinkpred(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    linkpredFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def linkpredFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    linkpredFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** The wedge-and-score core over any (o1 < o2) edge relation —
    * shared by the batch face and the store face's snapshot view. The
    * edge relation materializes once (localCheckpoint): the two
    * neighbor-list directions and the anti-join probe read it, not
    * three re-derivations of the lift gate.
    */
  private[graft] def linkpredFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val nbr = e.select(col("o1").as("v"), col("o2").as("w"))
      .unionAll(e.select(col("o2").as("v"), col("o1").as("w")))
    val ctr = nbr.groupBy(col("v"))
      .agg(sort_array(collect_list(col("w"))).as("ws"))
      .filter(size(col("ws")).between(2, linkpredMaxDeg))
      .select(col("ws"), expr(
        "CAST(floor(1000000.0 / ln(CAST(size(ws) AS DOUBLE)) + 0.5) " +
          "AS BIGINT)").as("aa"))
    val cand = ctr
      .select(col("aa"), explode(expr(
        """flatten(transform(ws, (x, i) ->
          |  transform(slice(ws, i + 2, size(ws) - i - 1),
          |    y -> named_struct('o1', x, 'o2', y))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.o1").as("o1"), col("p.o2").as("o2"))
      .agg(count(lit(1)).as("cn"), sum(col("aa")).as("aa_micro"))
    cand.join(e, Seq("o1", "o2"), "left_anti")
      .filter(col("cn") >= linkpredMinCn)
      .orderBy(col("o1"), col("o2"))
  }

  // ---- q_lpa: label-propagation community detection ------------------

  /** Synchronous LPA round count. FIXED, not a convergence budget:
    * synchronous label propagation has no fixpoint guarantee (a lone
    * edge's two labels swap forever — spec-pinned), so unlike the
    * k-core peel the contract is "the assignment after exactly N
    * rounds", and the oracle unrolls exactly N.
    */
  val lpaRounds = 4

  /** COMMUNITY DETECTION over the lift-filtered co-visitation
    * projection — the partition member of the graph family (pagerank =
    * importance, triangles/k-core = cohesion, linkpred = missing
    * edges; this assigns every node a community). Synchronous label
    * propagation (Raghavan 2007), made deterministic: every node
    * starts labeled with its own id, and each round relabels
    * SIMULTANEOUSLY to the most frequent label among its neighbors,
    * ties broken toward the SMALLEST label (no self-vote, no float
    * anywhere — counts and ids only, so both engines agree exactly).
    * Exactly `lpaRounds` rounds, by contract (see above).
    *
    * 100 TB shape: per round ONE w-keyed join of the arc relation
    * against the node-sized label relation + one map-combinable
    * (v, label) count + one map-combinable per-v `min_by` — volume
    * O(|E|) per round with no all-pairs and no window over anything
    * larger than a node's distinct neighbor labels; the arc relation
    * materializes once (localCheckpoint, the pagerank discipline).
    *
    * Reference: extends the graph family (caches.clj rolls up per-key;
    * this partitions the interaction graph).
    */
  def qLpa(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    lpaFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def lpaFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    lpaFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** The fixed-round propagation over any (o1 < o2) edge relation —
    * shared by the batch face, the streaming face's snapshot view and
    * the cohesion store's view.
    */
  private[graft] def lpaFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    // no checkpoint: a union of two projections of the flat edge leaf
    // re-derives for a block read per reference (the betweenness sym
    // argument) - the materialization job was the only cost
    val nbr = e.select(col("o1").as("v"), col("o2").as("w"))
      .unionAll(e.select(col("o2").as("v"), col("o1").as("w")))
    var lbl = nbr.select(col("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to lpaRounds) {
      lbl = nbr
        .join(lbl.select(col("v").as("w"), col("lbl").as("lw")), "w")
        .groupBy(col("v"), col("lw")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("v"))
        .agg(min_by(col("lw"), struct(negate(col("cnt")), col("lw")))
          .as("lbl"))
    }
    lbl.select(col("v").as("node_id"), col("lbl").as("community"))
      .orderBy(col("node_id"))
  }

  val qLpaSql: String = {
    val rounds = (1 to lpaRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT v, lw AS lbl FROM (
         |    SELECT n.v, l.lbl AS lw, count(*) AS cnt
         |    FROM nbr n JOIN l${i - 1} l ON n.w = l.v GROUP BY 1, 2
         |  ) QUALIFY
         |    row_number() OVER (PARTITION BY v
         |                       ORDER BY cnt DESC, lw ASC) = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |nbr AS MATERIALIZED (
       |  SELECT o1 AS v, o2 AS w FROM e
       |  UNION ALL SELECT o2 AS v, o1 AS w FROM e
       |),
       |l0 AS (SELECT DISTINCT v, v AS lbl FROM nbr),
       |$rounds
       |SELECT v AS node_id, lbl AS community FROM l$lpaRounds
       |ORDER BY node_id""".stripMargin
  }

  // ---- q_modularity: partition quality of the LPA communities ---------

  /** NEWMAN MODULARITY of the LPA partition over the lift-filtered
    * co-visitation projection — the grade on the community detector's
    * own output (q_lpa says WHICH communities; this says whether that
    * partition beats the random-graph null at all): per community c,
    * ΔQ_c = e_c/m − (deg_c/(2m))², with e_c the within-community edge
    * count, deg_c the community's degree mass, m the projection's
    * edge count; Q = Σ_c ΔQ_c. Emitted per community (size, internal
    * edges, degree mass, ΔQ) so the reader sees WHERE the structure
    * lives, not just the one number.
    *
    * Determinism: m, e_c, deg_c, n_nodes are exact integers off the
    * same deterministic LPA labels as q_lpa; ΔQ is one pinned double
    * chain over them, q6-rounded — both engines agree bitwise.
    *
    * 100 TB shape: the LPA rounds dominate (same plan as q_lpa); on
    * top of them this adds one node-keyed degree join, one
    * edge-labelling join pair for e_c and two map-combinable
    * community-keyed aggs — all on the already-materialized
    * projection, no new scan of anything event-sized.
    */
  def qModularity(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    // the lift-filtered projection is the session-shared tier
    // (`projEdgesFor`); the tuples-argument builder below stays
    // for the snapshot-derived stream/store faces
    modularityFromEdges(projEdgesFor(spark, sfDir))
  }

  private[graft] def modularityFrom(tuples: DataFrame): DataFrame = {
    val act = capActive(tuples).localCheckpoint()
    val nu = act.agg(count(lit(1)).as("n"))
    val od = act.select(explode(col("os")).as("o"))
      .groupBy(col("o")).agg(count(lit(1)).as("c"))
    modularityFromEdges(liftEdges(
      pairCounts(act).filter(col("cnt") >= cooccurMinCnt), od, nu))
  }

  /** The pinned per-community ΔQ chain, spliced into both engines. */
  private val modularityDqExpr: String =
    """CAST(e_in AS DOUBLE) / CAST(m AS DOUBLE)
      |- (CAST(deg_sum AS DOUBLE)
      |     / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE)))
      |  * (CAST(deg_sum AS DOUBLE)
      |     / (CAST(2 AS DOUBLE) * CAST(m AS DOUBLE)))""".stripMargin

  /** The per-community report over any (o1 < o2) edge relation —
    * shared by the batch face, the streaming face's snapshot view and
    * the cohesion store's view (communities, degrees and e_c are all
    * functions of the WHOLE projection: never storable state).
    */
  private[graft] def modularityFromEdges(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val lbl = lpaFromEdges(e)
      .select(col("node_id").as("v"), col("community"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("o1").as("v"))
      .unionAll(e.select(col("o2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val within = e
      .join(lbl.select(col("v").as("o1"), col("community").as("ca")),
        "o1")
      .join(lbl.select(col("v").as("o2"), col("community").as("cb")),
        "o2")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
    lbl.join(deg, "v")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("deg_sum"))
      .join(within, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("e_in"),
        col("deg_sum"),
        graft.pipeline.ParityMath.q6(expr(modularityDqExpr)).as("dq"))
      .orderBy(col("community"))
  }

  val qModularitySql: String = {
    val rounds = (1 to lpaRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT v, lw AS lbl FROM (
         |    SELECT n.v, l.lbl AS lw, count(*) AS cnt
         |    FROM nbr n JOIN l${i - 1} l ON n.w = l.v GROUP BY 1, 2
         |  ) QUALIFY
         |    row_number() OVER (PARTITION BY v
         |                       ORDER BY cnt DESC, lw ASC) = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |nbr AS MATERIALIZED (
       |  SELECT o1 AS v, o2 AS w FROM e
       |  UNION ALL SELECT o2 AS v, o1 AS w FROM e
       |),
       |l0 AS (SELECT DISTINCT v, v AS lbl FROM nbr),
       |$rounds,
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       |       FROM nbr GROUP BY 1),
       |win AS (
       |  SELECT a.lbl AS community, CAST(count(*) AS BIGINT) AS e_in
       |  FROM e JOIN l$lpaRounds a ON e.o1 = a.v
       |         JOIN l$lpaRounds b ON e.o2 = b.v
       |  WHERE a.lbl = b.lbl GROUP BY 1
       |),
       |comm AS (
       |  SELECT l.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |         CAST(sum(d.d) AS BIGINT) AS deg_sum
       |  FROM l$lpaRounds l JOIN dg d ON l.v = d.v GROUP BY 1
       |),
       |full0 AS (
       |  SELECT c.community, c.n_nodes,
       |         CAST(coalesce(w.e_in, 0) AS BIGINT) AS e_in,
       |         c.deg_sum, m.m
       |  FROM comm c LEFT JOIN win w ON c.community = w.community
       |  CROSS JOIN m
       |)
       |SELECT community, n_nodes, e_in, deg_sum,
       |  ${graft.pipeline.ParityMath.q6Sql(modularityDqExpr)} AS dq
       |FROM full0 ORDER BY community""".stripMargin
  }

  val qLinkpredSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |so AS (SELECT DISTINCT s, o FROM tuples),
       |deg0 AS (SELECT s, count(*) AS d FROM so GROUP BY 1),
       |el AS (
       |  SELECT so.s, so.o FROM so JOIN deg0 USING (s)
       |  WHERE deg0.d BETWEEN 2 AND $cooccurMaxDeg
       |),
       |nu AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM el),
       |od AS (SELECT o, CAST(count(*) AS BIGINT) AS c FROM el GROUP BY 1),
       |pairs AS (
       |  SELECT a.o AS o1, b.o AS o2, CAST(count(*) AS BIGINT) AS cnt
       |  FROM el a JOIN el b ON a.s = b.s AND a.o < b.o
       |  GROUP BY 1, 2 HAVING count(*) >= $cooccurMinCnt
       |),
       |e AS MATERIALIZED (
       |  SELECT p.o1, p.o2
       |  FROM pairs p
       |  JOIN od d1 ON p.o1 = d1.o JOIN od d2 ON p.o2 = d2.o
       |  CROSS JOIN nu
       |  WHERE $triLiftDen * p.cnt * nu.n > $triLiftNum * d1.c * d2.c
       |),
       |nbr AS (
       |  SELECT o1 AS v, o2 AS w FROM e
       |  UNION ALL SELECT o2 AS v, o1 AS w FROM e
       |),
       |degn AS (SELECT v, count(*) AS d FROM nbr GROUP BY 1),
       |ctr AS (
       |  SELECT n.v, n.w,
       |    CAST(floor(1000000.0 / ln(CAST(d.d AS DOUBLE)) + 0.5)
       |         AS BIGINT) AS aa
       |  FROM nbr n JOIN degn d USING (v)
       |  WHERE d.d BETWEEN 2 AND $linkpredMaxDeg
       |),
       |cand AS (
       |  SELECT a.w AS o1, b.w AS o2, CAST(count(*) AS BIGINT) AS cn,
       |         CAST(sum(a.aa) AS BIGINT) AS aa_micro
       |  FROM ctr a JOIN ctr b ON a.v = b.v AND a.w < b.w
       |  GROUP BY 1, 2
       |)
       |SELECT c.o1, c.o2, c.cn, c.aa_micro
       |FROM cand c LEFT JOIN e ON c.o1 = e.o1 AND c.o2 = e.o2
       |WHERE e.o1 IS NULL AND c.cn >= $linkpredMinCn
       |ORDER BY c.o1, c.o2""".stripMargin

  // ---- q_concomp: connected components --------------------------------

  /** Connected components of the interaction graph: every node labeled
    * with its component's minimum encoded node id, plus the component
    * size. The partition step every graph pipeline runs first (process
    * components independently; find the orphaned tail the giant
    * component misses). Reuses the dedup family's label-propagation +
    * path-halving fixpoint (`Dedup.resolveComponents` — O(log diameter)
    * rounds, one keyed shuffle each); the oracle recomputes the same
    * partition as a recursive reachability closure, which only has to
    * hold at gate scale — at 100 TB the Spark loop's per-round cost is
    * the edge relation's one shuffle, the textbook hash-min CC plan.
    */
  def qConcomp(spark: SparkSession, sfDir: String): DataFrame =
    concompFromPairs(spark, fwdPairsFor(spark, sfDir))

  private[graft] def concompFrom(spark: SparkSession,
                                 tuples: DataFrame): DataFrame =
    concompFromPairs(spark, fwdPairs(tuples))

  private[graft] def concompFromPairs(spark: SparkSession,
                                      fwdPairs: DataFrame): DataFrame = {
    val edges = fwdPairs
      .select(col("src").as("doc_a"), col("dst").as("doc_b"))
    val (labels, _) =
      graft.pipeline.Dedup.resolveComponents(spark, edges)
    val comp = labels.select(col("doc_id").as("v"),
      col("cluster_id").as("comp_id"))
    val sz = comp.groupBy(col("comp_id"))
      .agg(count(lit(1)).as("comp_size"))
    comp.join(sz, "comp_id")
      .select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("comp_id"), col("comp_size"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  val qConcompSql: String =
    s"""WITH RECURSIVE ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |nodes AS (SELECT DISTINCT a AS v FROM sym),
       |reach AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN sym e ON e.a = r.b
       |),
       |comp AS (
       |  SELECT n.v, CAST(least(n.v, min(r.b)) AS BIGINT) AS comp_id
       |  FROM nodes n LEFT JOIN reach r ON r.a = n.v
       |  GROUP BY n.v
       |),
       |sz AS (
       |  SELECT comp_id, CAST(count(*) AS BIGINT) AS comp_size
       |  FROM comp GROUP BY 1
       |)
       |SELECT CASE WHEN c.v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(c.v // 2 AS BIGINT) AS node_id, c.comp_id, s.comp_size
       |FROM comp c JOIN sz s USING (comp_id)
       |ORDER BY node_kind, node_id""".stripMargin

  // ---- q_bfs_hops: single-source shortest hops -------------------------

  /** Frontier-expansion depth cap: a loud contract, not a tuning knob.
    * The Spark loop THROWS past it (so a pathological chain graph can
    * never silently truncate) and the oracle's recursive walk carries
    * the same bound - both engines compute exact BFS whenever the
    * graph's eccentricity fits, and the gate corpus does (spec pins
    * convergence well under the cap).
    */
  val bfsMaxDepth = 64

  /** Single-source BFS hop counts from the minimum encoded node id
    * (deterministic source; reachable nodes only). The Pregel-as-joins
    * frontier loop: each round joins the frontier against the edge
    * relation and anti-joins the visited set - one keyed shuffle per
    * round, rounds = eccentricity of the source, the standard
    * distributed BFS plan at any scale.
    */
  def qBfsHops(spark: SparkSession, sfDir: String): DataFrame =
    bfsHopsFromPairs(fwdPairsFor(spark, sfDir))

  private[graft] def bfsHopsFrom(tuples: DataFrame): DataFrame =
    bfsHopsFromPairs(fwdPairs(tuples))

  private[graft] def bfsHopsFromPairs(fwdPairs: DataFrame): DataFrame = {
    val fwd = materialized(fwdPairs)
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    // empty pair relation: no source to expand from - return the empty
    // (node_kind, node_id, hops) frame like the sibling faces, instead
    // of NPE-ing on the null min (reachable via the stream/store faces
    // before any pairs arrive)
    val srcRow = sym.agg(min(col("src"))).collect().head
    if (srcRow.isNullAt(0))
      return fwd.sparkSession.range(0).select(
        lit("user").as("node_kind"), col("id").as("node_id"),
        col("id").as("hops"))
    val srcV = srcRow.getLong(0)
    bfsVisited(sym, srcV).select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("hops"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  /** The frontier loop from an arbitrary source over any symmetric
    * (src, dst) arc relation — shared by the single-source face and
    * the double-sweep diameter face. Returns the (v, hops) visited
    * relation; throws LOUDLY past `bfsMaxDepth` (truncating would
    * silently under-report distances).
    */
  private def bfsVisited(sym: DataFrame, srcV: Long): DataFrame = {
    var visited = sym.sparkSession.range(1)
      .select(lit(srcV).as("v"), lit(0L).as("hops")).localCheckpoint()
    var frontier = visited
    var depth = 0L
    var more = true
    while (more) {
      depth += 1
      if (depth > bfsMaxDepth)
        throw new IllegalStateException(
          s"bfs: frontier alive past depth $bfsMaxDepth - raise " +
            "the cap contract for this graph")
      // lazy checkpoint + count = one action per depth: count consumes
      // every partition, so the checkpoint blocks land in the same job
      // that answers the emptiness test (isEmpty only touched one
      // partition, leaving a fill-in materialization job behind it)
      val next = frontier.join(sym, col("v") === col("src"))
        .select(col("dst").as("v")).distinct()
        .join(visited.select(col("v")), Seq("v"), "left_anti")
        .select(col("v"), lit(depth).as("hops"))
        .localCheckpoint(false)
      if (next.count() == 0L) more = false
      else {
        // lazy union of flat checkpointed frontiers: re-checkpointing
        // the whole visited set per round copied it O(depth) times
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    visited
  }

  // ---- q_diameter: double-sweep diameter bound -------------------------

  /** DOUBLE-SWEEP DIAMETER BOUND (Magnien-Latapy-Habib): BFS from the
    * deterministic seed (min encoded node), take the FARTHEST visited
    * node (ties to the smallest id), BFS again from it — the second
    * eccentricity is the classic diameter lower bound, exact on trees
    * and within a small factor in practice, at the cost of exactly
    * TWO BFS runs instead of the all-pairs O(V·E) a true diameter
    * needs (the only honest option at 100 TB). Reported with both
    * sweep endpoints and the reached-component size so the reader
    * sees WHICH component was measured (the seed's, by the q_bfs_hops
    * convention).
    *
    * 100 TB shape: two runs of the same Pregel-as-joins frontier loop
    * as q_bfs_hops on the memoized pair relation; the two argmax
    * selections are 1-row driver folds over the node-sized visited
    * relation.
    */
  def qDiameter(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    diameterFromPairs(fwdPairsFor(spark, sfDir))
  }

  private[graft] def diameterFrom(tuples: DataFrame): DataFrame =
    diameterFromPairs(fwdPairs(tuples))

  private[graft] def diameterFromPairs(fwdPairs: DataFrame): DataFrame = {
    val spark = fwdPairs.sparkSession
    val fwd = materialized(fwdPairs)
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val srcRow = sym.agg(min(col("src"))).collect().head
    if (srcRow.isNullAt(0))
      return spark.range(0).select(
        lit("user").as("seed_kind"), col("id").as("seed_id"),
        lit("user").as("far_kind"), col("id").as("far_id"),
        col("id").as("ecc_seed"), col("id").as("diameter_lb"),
        col("id").as("n_reach"))
    val s0 = srcRow.getLong(0)
    val v1 = bfsVisited(sym, s0)
    val far1 = v1.orderBy(col("hops").desc, col("v").asc)
      .limit(1).collect().head
    val u = far1.getLong(0)
    val eccSeed = far1.getLong(1)
    val nReach = v1.count()
    val v2 = bfsVisited(sym, u)
    val diamLb = v2.agg(max(col("hops"))).collect().head.getLong(0)
    def kind(v: Long) = if (v % 2 == 0) "user" else "obj"
    spark.range(1).select(
      lit(kind(s0)).as("seed_kind"), lit(s0 / 2).as("seed_id"),
      lit(kind(u)).as("far_kind"), lit(u / 2).as("far_id"),
      lit(eccSeed).as("ecc_seed"), lit(diamLb).as("diameter_lb"),
      lit(nReach).as("n_reach"))
  }

  val qDiameterSql: String =
    s"""WITH RECURSIVE ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |walk1 AS (
       |  SELECT (SELECT min(a) FROM sym) AS v, 0 AS h
       |  UNION
       |  SELECT e.b AS v, w.h + 1 AS h
       |  FROM walk1 w JOIN sym e ON e.a = w.v
       |  WHERE w.h + 1 <= $bfsMaxDepth
       |),
       |h1 AS (SELECT v, min(h) AS h FROM walk1 GROUP BY 1),
       |far1 AS (SELECT v, h FROM h1 ORDER BY h DESC, v ASC LIMIT 1),
       |walk2 AS (
       |  SELECT (SELECT v FROM far1) AS v, 0 AS h
       |  UNION
       |  SELECT e.b AS v, w.h + 1 AS h
       |  FROM walk2 w JOIN sym e ON e.a = w.v
       |  WHERE w.h + 1 <= $bfsMaxDepth
       |),
       |h2 AS (SELECT v, min(h) AS h FROM walk2 GROUP BY 1)
       |SELECT
       |  CASE WHEN s.v % 2 = 0 THEN 'user' ELSE 'obj' END AS seed_kind,
       |  CAST(s.v // 2 AS BIGINT) AS seed_id,
       |  CASE WHEN f.v % 2 = 0 THEN 'user' ELSE 'obj' END AS far_kind,
       |  CAST(f.v // 2 AS BIGINT) AS far_id,
       |  CAST(f.h AS BIGINT) AS ecc_seed,
       |  CAST((SELECT max(h) FROM h2) AS BIGINT) AS diameter_lb,
       |  CAST((SELECT count(*) FROM h1) AS BIGINT) AS n_reach
       |FROM (SELECT min(a) AS v FROM sym) s, far1 f""".stripMargin

  val qBfsHopsSql: String =
    s"""WITH RECURSIVE ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |walk AS (
       |  SELECT (SELECT min(a) FROM sym) AS v, 0 AS h
       |  UNION
       |  SELECT e.b AS v, w.h + 1 AS h
       |  FROM walk w JOIN sym e ON e.a = w.v
       |  WHERE w.h + 1 <= $bfsMaxDepth
       |)
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(v // 2 AS BIGINT) AS node_id,
       |  CAST(min(h) AS BIGINT) AS hops
       |FROM walk GROUP BY 1, 2
       |ORDER BY node_kind, node_id""".stripMargin

  // ---- q_harmonic: landmark harmonic closeness -------------------------

  /** Landmark count for the harmonic estimate — the 4 smallest
    * encoded node ids, a deterministic pivot set (the pprSeedMod
    * philosophy: reproducible stand-in for a sampled set).
    */
  val harmonicLandmarks = 4

  /** HARMONIC CLOSENESS CENTRALITY estimated from a landmark set —
    * the distance-based centrality member (walk counts rank by flow:
    * pagerank/katz; this ranks by PROXIMITY: a node is central when
    * it sits few hops from the pivots). Exact all-pairs harmonic
    * centrality is O(V·E) — at 100 TB the only honest plan is the
    * landmark estimate (Eppstein–Wang): h(v) = Σ_lm 10⁶ DIV d(lm, v)
    * over the `harmonicLandmarks` smallest node ids, exact integer
    * micro-units (truncating division on positive hops, identical in
    * both engines). Nodes unreached by every landmark (other
    * components) are absent — distance-undefined, not zero.
    *
    * 100 TB shape: ONE multi-source labeled BFS — the q_bfs_hops
    * frontier loop with (landmark, node) state, landmark-count× the
    * state and the same O(diameter) rounds of one keyed join + one
    * distinct each — on the memoized pair relation; the final fold is
    * one map-combinable node-keyed sum.
    */
  def qHarmonic(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    harmonicFromPairs(fwdPairsFor(spark, sfDir))
  }

  private[graft] def harmonicFrom(tuples: DataFrame): DataFrame =
    harmonicFromPairs(fwdPairs(tuples))

  private[graft] def harmonicFromPairs(fwdPairs: DataFrame): DataFrame = {
    val spark = fwdPairs.sparkSession
    val fwd = materialized(fwdPairs)
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val lms = sym.select(col("src")).distinct()
      .orderBy(col("src")).limit(harmonicLandmarks)
      .collect().map(_.getLong(0)).toSeq
    if (lms.isEmpty)
      return spark.range(0).select(
        lit("user").as("node_kind"), col("id").as("node_id"),
        col("id").as("harmonic_mu"))
    import spark.implicits._
    var visited = lms.map(l => (l, l, 0L)).toDF("lm", "v", "hops")
      .localCheckpoint()
    var frontier = visited
    var depth = 0L
    var more = true
    while (more) {
      depth += 1
      if (depth > bfsMaxDepth)
        throw new IllegalStateException(
          s"qHarmonic: frontier alive past depth $bfsMaxDepth - raise " +
            "the cap contract for this graph")
      // lazy checkpoint + count: one action per depth (the bfsVisited
      // fused materialize-and-test discipline)
      val next = frontier.join(sym, col("v") === col("src"))
        .select(col("lm"), col("dst").as("v")).distinct()
        .join(visited.select(col("lm"), col("v")), Seq("lm", "v"),
          "left_anti")
        .select(col("lm"), col("v"), lit(depth).as("hops"))
        .localCheckpoint(false)
      if (next.count() == 0L) more = false
      else {
        // lazy union of flat checkpointed frontiers: re-checkpointing
        // the whole visited set per round copied it O(depth) times
        visited = visited.unionAll(next)
        frontier = next
      }
    }
    visited.filter(col("hops") > 0)
      .groupBy(col("v"))
      .agg(sum(expr("1000000L DIV hops")).as("harmonic_mu"))
      .select(
        when(pmod(col("v"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        expr("v DIV 2").as("node_id"),
        col("harmonic_mu"))
      .orderBy(col("node_kind"), col("node_id"))
  }

  // ---- q_betweenness: landmark Brandes betweenness, radius-capped ----

  /** Landmark count (the harmonic pivot discipline: the 4 smallest
    * encoded node ids, a deterministic stand-in for a sampled source
    * set) and the BFS radius cap. Exact all-pairs betweenness is
    * O(V·E) (Brandes) — at 100 TB the only honest plan is the
    * source-sampled, radius-truncated estimate, both caps part of the
    * operator CONTRACT (not a silent truncation): scores count only
    * shortest paths FROM the landmark set within `betweennessRadius`
    * hops.
    */
  val betweennessLandmarks = 4
  val betweennessRadius = 4

  /** LANDMARK BETWEENNESS CENTRALITY (Brandes 2001, source-sampled):
    * the broker member of the centrality family — pagerank/katz rank
    * by FLOW, harmonic by PROXIMITY, this by how much shortest-path
    * traffic a node CARRIES. Per landmark: a forward layered BFS
    * accumulates shortest-path counts σ (σ(v at layer d) = Σ σ(u) over
    * predecessor edges from layer d−1), then the Brandes dependency
    * sweeps backward, δ(v) = Σ_w (σ_v·(10⁶ + δ_w)) DIV σ_w over
    * successor edges into layer d+1 — integer MICRO-units with
    * truncating division per term (positive operands, so Spark DIV ≡
    * DuckDB //; term truncation is deterministic and the sum
    * order-free). Output per visited node: Σ over landmarks of its
    * dependency, leaves scoring an honest 0.
    *
    * Headroom: σ·(10⁶ + δ) must stay < 2⁶³; σ ≤ 10⁶ is enforced
    * LOUDLY (the nearestH2Top2 require discipline) — with δ bounded
    * by 10⁶·(nodes within the radius) the product then fits with
    * room to spare at any plausible within-radius neighborhood.
    *
    * 100 TB shape: the q_harmonic multi-source frontier loop with a σ
    * column (≤ `betweennessRadius` rounds of one keyed join + one
    * map-combinable sum each) plus one backward join per layer, all
    * on the memoized pair relation; the final fold is one node-keyed
    * sum.
    */
  def qBetweenness(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    betweennessFromPairs(fwdPairsFor(spark, sfDir))
  }

  private[graft] def betweennessFrom(tuples: DataFrame): DataFrame =
    betweennessFromPairs(fwdPairs(tuples))

  private[graft] def betweennessFromPairs(fwdPairs: DataFrame): DataFrame = {
    val spark = fwdPairs.sparkSession
    import spark.implicits._
    val fwd = materialized(fwdPairs)
    // no checkpoint for sym: a union of two projections of a flat
    // leaf re-derives for pennies per reference, and skipping the
    // materialization job removes one full-relation copy per query
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    // Landmarks = top-k by DEGREE (id tie-break): the landmark choice
    // is the whole error term of source-sampled Brandes, and hubs sit
    // on the most shortest paths, so degree-ranked landmarks make the
    // sample defensible at any scale where id-order would be an
    // arbitrary draw (VERDICT r14 #5). Deterministic: exact integer
    // degree, total order.
    val lms = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc)
      .limit(betweennessLandmarks)
      .collect().map(_.getLong(0)).toSeq
    if (lms.isEmpty)
      return spark.range(0).select(
        lit("user").as("node_kind"), col("id").as("node_id"),
        col("id").as("betweenness_mu"))
    // forward: per-layer (lm, v, sigma); layer 0 = the landmarks
    var layers = Vector(
      lms.map(l => (l, l, 1L)).toDF("lm", "v", "sigma").localCheckpoint())
    var visited = layers(0).select(col("lm"), col("v"))
    var d = 0
    var alive = true
    // one materialization job per depth: the old loop checkpointed a
    // distinct frontier relation, probed it for emptiness, THEN built
    // and checkpointed sigma against it (plus a third checkpoint of
    // the visited union) — 3 jobs per depth for what is one. Folding
    // the frontier into the sigma agg (sum per neighbor, anti-join
    // the visited set after) computes identical sigmas for the kept
    // rows; `visited` stays a lazy union of flat checkpointed layers,
    // re-derived per anti-join for the price of a block read.
    while (alive && d < betweennessRadius) {
      d += 1
      val prev = layers(d - 1)
      val sig = prev
        .select(col("lm"), col("v").as("u"), col("sigma").as("su"))
        .join(sym.select(col("src").as("u"), col("dst").as("v")), "u")
        .groupBy(col("lm"), col("v"))
        .agg(sum(col("su")).as("sigma"))
        .join(visited, Seq("lm", "v"), "left_anti")
        .localCheckpoint(false)
      if (sig.count() == 0L) alive = false
      else {
        layers = layers :+ sig
        visited = visited.unionAll(sig.select(col("lm"), col("v")))
      }
    }
    // one agg job over the unioned (checkpointed) layers, not one per
    // layer
    val maxSig = Option(layers.map(_.select(col("sigma")))
        .reduce(_ unionAll _).agg(max(col("sigma"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(maxSig <= 1000000L,
      s"qBetweenness: shortest-path count $maxSig exceeds the 1e6 " +
        s"headroom bound at radius $betweennessRadius - lower the " +
        "radius contract for this graph")
    // backward Brandes sweep, deepest layer first (the deepest layer's
    // dependency is 0 by construction)
    val deepest = layers.size - 1
    var deltas = Map.empty[Int, DataFrame]
    for (dd <- (deepest - 1) to 1 by -1) {
      val sw0 = layers(dd + 1)
        .select(col("lm"), col("v").as("w"), col("sigma").as("sw"))
      val wSide = deltas.get(dd + 1) match {
        case Some(del) => sw0.join(
            del.select(col("lm"), col("v").as("w"),
              col("delta_mu").as("dw")), Seq("lm", "w"), "left")
          .select(col("lm"), col("w"), col("sw"),
            coalesce(col("dw"), lit(0L)).as("dw"))
        case None => sw0.withColumn("dw", lit(0L))
      }
      val del = layers(dd)
        .select(col("lm"), col("v"), col("sigma").as("sv"))
        .join(sym.select(col("src").as("v"), col("dst").as("w")), "v")
        .join(wSide, Seq("lm", "w"))
        .groupBy(col("lm"), col("v"))
        .agg(sum(expr("(sv * (1000000L + dw)) DIV sw")).as("delta_mu"))
        // lazy: the next (shallower) layer's delta job is the first
        // full consumer and lands the checkpoint blocks as it runs -
        // the eager variant paid a dedicated job per layer
        .localCheckpoint(false)
      deltas += dd -> del
    }
    val vis1 = layers.drop(1).map(_.select(col("lm"), col("v")))
      .reduceOption(_ unionAll _)
    vis1 match {
      case None => spark.range(0).select(
        lit("user").as("node_kind"), col("id").as("node_id"),
        col("id").as("betweenness_mu"))
      case Some(vis) =>
        val withDelta = deltas.values.reduceOption(_ unionAll _) match {
          case Some(ds) => vis.join(ds, Seq("lm", "v"), "left")
            .select(col("lm"), col("v"),
              coalesce(col("delta_mu"), lit(0L)).as("delta_mu"))
          case None => vis.withColumn("delta_mu", lit(0L))
        }
        withDelta.groupBy(col("v"))
          .agg(sum(col("delta_mu")).as("betweenness_mu"))
          .select(
            when(pmod(col("v"), lit(2)) === 0, lit("user"))
              .otherwise(lit("obj")).as("node_kind"),
            expr("v DIV 2").as("node_id"),
            col("betweenness_mu"))
          .orderBy(col("node_kind"), col("node_id"))
    }
  }

  val qBetweennessSql: String = {
    val r = betweennessRadius
    val sigs = (1 to r).map { d =>
      s"""sig$d AS MATERIALIZED (
         |  SELECT p.lm, e.b AS v, CAST(sum(p.s) AS BIGINT) AS s
         |  FROM sig${d - 1} p JOIN sym e ON e.a = p.v
         |  JOIN hh ON hh.lm = p.lm AND hh.v = e.b AND hh.h = $d
         |  GROUP BY 1, 2
         |)""".stripMargin
    }
    val dels = ((r - 1) to 1 by -1).map { d =>
      val dw = if (d == r - 1) "0" else "coalesce(dl.dmu, 0)"
      val dlJoin =
        if (d == r - 1) ""
        else s"\n  LEFT JOIN del${d + 1} dl ON dl.lm = sd.lm AND dl.v = e.b"
      s"""del$d AS MATERIALIZED (
         |  SELECT sd.lm, sd.v,
         |    CAST(sum((sd.s * (1000000 + $dw)) // sw.s) AS BIGINT) AS dmu
         |  FROM sig$d sd JOIN sym e ON e.a = sd.v
         |  JOIN sig${d + 1} sw ON sw.lm = sd.lm AND sw.v = e.b$dlJoin
         |  GROUP BY 1, 2
         |)""".stripMargin
    }
    val dall = (1 to (r - 1))
      .map(d => s"SELECT lm, v, dmu FROM del$d")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |lms AS (
       |  SELECT a AS lm FROM sym GROUP BY a
       |  ORDER BY count(*) DESC, a LIMIT $betweennessLandmarks
       |),
       |walk AS (
       |  SELECT lm, lm AS v, 0 AS h FROM lms
       |  UNION
       |  SELECT w.lm, e.b AS v, w.h + 1 AS h
       |  FROM walk w JOIN sym e ON e.a = w.v
       |  WHERE w.h + 1 <= $r
       |),
       |hh AS MATERIALIZED (SELECT lm, v, min(h) AS h FROM walk
       |                    GROUP BY 1, 2),
       |sig0 AS (SELECT lm, lm AS v, CAST(1 AS BIGINT) AS s FROM lms),
       |${sigs.mkString(",\n")},
       |${dels.mkString(",\n")},
       |dall AS (
       |  $dall
       |)
       |SELECT CASE WHEN hh.v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(hh.v // 2 AS BIGINT) AS node_id,
       |  CAST(sum(coalesce(da.dmu, 0)) AS BIGINT) AS betweenness_mu
       |FROM hh LEFT JOIN dall da ON da.lm = hh.lm AND da.v = hh.v
       |WHERE hh.h >= 1
       |GROUP BY 1, 2
       |ORDER BY node_kind, node_id""".stripMargin
  }

  val qHarmonicSql: String =
    s"""WITH RECURSIVE ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |lms AS (
       |  SELECT DISTINCT a AS lm FROM sym
       |  ORDER BY lm LIMIT $harmonicLandmarks
       |),
       |walk AS (
       |  SELECT lm, lm AS v, 0 AS h FROM lms
       |  UNION
       |  SELECT w.lm, e.b AS v, w.h + 1 AS h
       |  FROM walk w JOIN sym e ON e.a = w.v
       |  WHERE w.h + 1 <= $bfsMaxDepth
       |),
       |hh AS (SELECT lm, v, min(h) AS h FROM walk GROUP BY 1, 2)
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(v // 2 AS BIGINT) AS node_id,
       |  CAST(sum(1000000 // h) AS BIGINT) AS harmonic_mu
       |FROM hh WHERE h > 0 GROUP BY 1, 2
       |ORDER BY node_kind, node_id""".stripMargin

  // ---- q_degree_dist + q_assortativity ---------------------------------

  /** Degree distribution by node kind: the first diagnostic anyone
    * plots over a link graph (and the skew evidence behind every
    * salting/broadcast decision in this file). One map-combinable agg
    * over the edge relation, then a count-of-counts - two bounded
    * shuffles at any scale.
    */
  def qDegreeDist(spark: SparkSession, sfDir: String): DataFrame =
    degreeDistFromPairs(fwdPairsFor(spark, sfDir))

  private[graft] def degreeDistFrom(tuples: DataFrame): DataFrame =
    degreeDistFromPairs(fwdPairs(tuples))

  private[graft] def degreeDistFromPairs(fwdPairs: DataFrame): DataFrame = {
    val fwd = fwdPairs
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .select(
        when(pmod(col("src"), lit(2)) === 0, lit("user"))
          .otherwise(lit("obj")).as("node_kind"),
        col("degree"))
      .groupBy(col("node_kind"), col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("node_kind"), col("degree"))
  }

  val qDegreeDistSql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |deg AS (SELECT a AS v, count(*) AS degree FROM sym GROUP BY 1)
       |SELECT CASE WHEN v % 2 = 0 THEN 'user' ELSE 'obj' END
       |    AS node_kind,
       |  CAST(degree AS BIGINT) AS degree,
       |  CAST(count(*) AS BIGINT) AS n_nodes
       |FROM deg GROUP BY 1, 2
       |ORDER BY node_kind, degree""".stripMargin

  /** Degree assortativity (Pearson correlation of endpoint degrees over
    * the directed arc list): does high-degree link to high-degree? The
    * one-number mixing diagnostic (negative on bipartite user↔object
    * graphs: heavy users touch rare objects too). All moment sums are
    * exact BIGINTs over integer degrees; only the final Pearson ratio
    * is floating point - one pinned expression, q6-rounded, identical
    * in both engines. Sums first, division once: the moments stay
    * map-combinable (one agg over the arc list after two bounded
    * degree joins), nothing iterative.
    */
  def qAssortativity(spark: SparkSession, sfDir: String): DataFrame =
    assortativityFromPairs(fwdPairsFor(spark, sfDir))

  private[graft] def assortativityFrom(tuples: DataFrame): DataFrame =
    assortativityFromPairs(fwdPairs(tuples))

  private[graft] def assortativityFromPairs(fwdPairs: DataFrame): DataFrame = {
    val fwd = fwdPairs
    val sym = fwd.unionAll(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("v"), col("d"))
    val xy = sym
      .join(deg.select(col("v").as("src"), col("d").as("dx")), "src")
      .join(deg.select(col("v").as("dst"), col("d").as("dy")), "dst")
    xy.agg(
        count(lit(1)).as("m"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(col("m"), graft.pipeline.ParityMath.q6(expr(
        """CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
          |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = CAST(0 AS DOUBLE)
          |     OR (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
          |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = CAST(0 AS DOUBLE)
          |THEN CAST(0 AS DOUBLE)
          |ELSE (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
          |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |  / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
          |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |     * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
          |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          |END""".stripMargin)).as("assortativity"))
  }

  val qAssortativitySql: String =
    s"""WITH ${graft.oracle.Sql.tuplesCte},
       |fwd AS (
       |  SELECT DISTINCT 2 * s AS src, 2 * o + 1 AS dst FROM tuples
       |),
       |sym AS (
       |  SELECT src AS a, dst AS b FROM fwd
       |  UNION ALL SELECT dst AS a, src AS b FROM fwd
       |),
       |deg AS (SELECT a AS v, count(*) AS d FROM sym GROUP BY 1),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(dx.d) AS BIGINT) AS sx,
       |    CAST(sum(dy.d) AS BIGINT) AS sy,
       |    CAST(sum(dx.d * dy.d) AS BIGINT) AS sxy,
       |    CAST(sum(dx.d * dx.d) AS BIGINT) AS sxx,
       |    CAST(sum(dy.d * dy.d) AS BIGINT) AS syy
       |  FROM sym e JOIN deg dx ON dx.v = e.a JOIN deg dy ON dy.v = e.b
       |)
       |SELECT m,
       |  CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
       |       OR (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
       |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0
       |  THEN 0.0
       |  ELSE floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |    / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |       * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |    * 1000000.0 + 0.5) / 1000000.0
       |  END AS assortativity
       |FROM mom""".stripMargin
}
