package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-family semantics: PageRank determinism/structure, the
  * co-occurrence cap rule, and store/batch parity.
  */
class GraphSpec extends SparkSpec {

  test("pagerank: ranks are deterministic, positive, and mass-plausible") {
    val a = Graph.qPagerank(spark, sfDir).collect()
    val b = Graph.qPagerank(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "two runs must land identical ranks (integer walk)")
    assert(a.nonEmpty && a.forall(_.getLong(2) >= 150000L),
      "every node keeps at least the teleport mass")
    // per-node rank stays in the same order of magnitude as the init:
    // the floor-division walk must not blow up or collapse
    assert(a.forall(r => r.getLong(2) < 100000000L))
  }

  test("pagerank knobs: iteration conf reaches the loop; checkpointing " +
       "between supersteps changes no rank") {
    val base = Graph.qPagerank(spark, sfDir).collect().map(_.toString).toSeq
    try {
      // iteration-count configurability: conf value ≙ the explicit
      // parameter, and a shallower run actually differs
      spark.conf.set("graft.pagerank.iterations", "1")
      val one = Graph.qPagerank(spark, sfDir).collect().map(_.toString).toSeq
      val oneDirect = Graph.pagerankFrom(
        Graph.fwdPairs(graft.core.Transform.extract(spark, sfDir)),
        iters = 1).collect().map(_.toString).toSeq
      assert(one == oneDirect, "conf must reach the iteration loop")
      assert(one != base, "1 iteration must differ from the default 3")
      spark.conf.unset("graft.pagerank.iterations")
      // checkpoint knob: pure lineage management, bit-identical ranks
      spark.conf.set("graft.pagerank.checkpoint", "true")
      val ck = Graph.qPagerank(spark, sfDir).collect().map(_.toString).toSeq
      assert(ck == base, "checkpointing between supersteps must not " +
        "change any rank")
    } finally {
      spark.conf.unset("graft.pagerank.iterations")
      spark.conf.unset("graft.pagerank.checkpoint")
    }
    intercept[IllegalArgumentException] {
      try {
        spark.conf.set("graft.pagerank.iterations", "0")
        Graph.qPagerank(spark, sfDir).collect()
      } finally spark.conf.unset("graft.pagerank.iterations")
    }
  }

  test("cohesion store == one-shot triangles/kcore after parity-split " +
       "ingest") {
    val tri = Graph.qTriangles(spark, sfDir).collect().map(_.toSeq).toSet
    assert(graft.pipeline.SignatureStore.gatedTriangles(spark, sfDir)
      .collect().map(_.toSeq).toSet == tri)
    val core = Graph.qKcore(spark, sfDir).collect().map(_.toSeq).toSet
    assert(graft.pipeline.SignatureStore.gatedKcore(spark, sfDir)
      .collect().map(_.toSeq).toSet == core)
  }

  test("linkpred: square's diagonals scored at exact Adamic-Adar " +
       "micro-units; adjacent pairs never emitted") {
    // 4-cycle 10-20-30-40: each side supported by its own 2 users, so
    // every side has cnt 2, every object degree 4, n_users 8 -> lift
    // 2*8/16 = 1.0 would FAIL the gate; 2 bystanders on {50,60} raise
    // n to 10 (lift 1.25). Lift-gated edges = the 4 sides + (50,60).
    // Exactly the two diagonals are non-adjacent with >= 2 common
    // neighbors; each of their 2 wedge centers has degree 2, so
    // aa = 2 * floor(1e6/ln(2) + 0.5) = 2 * 1442695.
    val sides = Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 10L))
    val rows = sides.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((100L + 2 * i, a), (100L + 2 * i, b),
        (101L + 2 * i, a), (101L + 2 * i, b))
    } ++ Seq((900L, 50L), (900L, 60L), (901L, 50L), (901L, 60L))
    val got = Graph.linkpredFrom(graft.core.Transform.extractFrom(
        eventsOf(rows)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((10L, 30L, 2L, 2885390L), (20L, 40L, 2L, 2885390L)))
  }

  test("linkpred: hub centers above the degree cap are excluded " +
       "outright") {
    // Two hubs 99,100 each joined to 65 spokes (their own 2 users per
    // hub-spoke edge -> cnt 2; no user touches both hubs, so (99,100)
    // is NOT an edge). 20 bystanders on {200,201} push n_users to 280
    // so hub-spoke lift = 2*280/(130*4) = 1.077 > 1.05. Hub degree 65
    // exceeds linkpredMaxDeg=64 -> hubs center NO wedges: without the
    // cap the 65*64/2 spoke pairs (cn 2 via the two hubs) would all
    // emit. Each spoke IS a live center (degree 2) whose single
    // neighbor pair is (99,100) -> the one candidate, cn 65.
    assert(Graph.linkpredMaxDeg == 64, "cap change must retune this spec")
    val spokes = (0 until 65).map(i => 300L + i)
    val rows = spokes.zipWithIndex.flatMap { case (sp, i) =>
      Seq((1000L + 4 * i, 100L), (1000L + 4 * i, sp),
        (1001L + 4 * i, 100L), (1001L + 4 * i, sp),
        (1002L + 4 * i, 99L), (1002L + 4 * i, sp),
        (1003L + 4 * i, 99L), (1003L + 4 * i, sp))
    } ++ (0 until 20).flatMap(i =>
      Seq((2000L + i, 200L), (2000L + i, 201L)))
    val got = Graph.linkpredFrom(graft.core.Transform.extractFrom(
        eventsOf(rows)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((99L, 100L, 65L, 65L * 1442695L)))
  }

  test("lpa: bridged triangles split into two communities; a lone " +
       "edge oscillates and lands on self-labels after the even " +
       "round count") {
    // Hand-replayed 4-round synchronous propagation (no self-vote,
    // ties to the smallest label) on triangle {1,2,3} - bridge 3-7 -
    // triangle {7,8,9}: labels pass 2,1,1,3,7,7 -> 1,1,1,7,3,3 ->
    // 1,1,1,3,3,3 -> 1,1,1,3,3,3 (communities 1 and 3, the bridge
    // never merges them). The isolated edge (10,20) swaps labels
    // every round - the no-fixpoint case that makes lpaRounds a FIXED
    // contract - so after 4 (even) rounds each end holds its own id.
    assert(Graph.lpaRounds % 2 == 0, "odd rounds retune the oscillator")
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 7L),
      (7L, 8L), (7L, 9L), (8L, 9L), (10L, 20L))
      .toDF("o1", "o2")
    val got = Graph.lpaFromEdges(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 3L),
      (8L, 3L), (9L, 3L), (10L, 10L), (20L, 20L)))
  }

  test("modularity: per-community report hand-computed on the bridged " +
       "triangles; the crossing bridge and lone edge count against") {
    val s = spark; import s.implicits._
    // Same graph as the lpa fixture -> communities {1,2,3}=1,
    // {7,8,9}=3, 10 and 20 self-labeled. m = 8. Each triangle:
    // e_in 3, deg mass 7 -> dq = 3/8 - (7/16)^2 = 0.18359375 ->
    // q6 0.183594. Each lone end: e_in 0, deg 1 ->
    // dq = -(1/16)^2 = -0.00390625 -> q6 -0.003906 (floor(-3905.75)).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 7L),
      (7L, 8L), (7L, 9L), (8L, 9L), (10L, 20L))
      .toDF("o1", "o2")
    val got = Graph.modularityFromEdges(edges).collect()
      .map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 3L, 3L, 7L, 0.183594),
      Seq(3L, 3L, 3L, 7L, 0.183594),
      Seq(10L, 1L, 0L, 1L, -0.003906),
      Seq(20L, 1L, 0L, 1L, -0.003906)), s"modularity: $got")
  }

  test("transitivity: wedges and closures hand-counted on the bridged " +
       "triangles; wedge-free projections yield no ratio") {
    val s = spark; import s.implicits._
    // bridged triangles + lone edge: degrees 2,2,3,3,2,2,1,1 ->
    // sum d(d-1) = 20 -> 10 wedges; 2 triangles -> 6 closed wedge
    // slots -> transitivity 2*6/20 = 0.6 exactly
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 7L),
      (7L, 8L), (7L, 9L), (8L, 9L), (10L, 20L))
      .toDF("o1", "o2")
    val got = Graph.transitivityFromEdges(edges).collect().head
    assert(got.toSeq == Seq(8L, 10L, 2L, 0.6), s"transitivity: $got")
    // a single edge: two degree-1 endpoints, zero wedges -> NULL
    val lone = Graph.transitivityFromEdges(
        Seq((1L, 2L)).toDF("o1", "o2")).collect().head
    assert(lone.toSeq.take(3) == Seq(1L, 0L, 0L) && lone.isNullAt(3),
      s"wedge-free: $lone")
  }

  test("cohesion store serves the modularity view == one-shot " +
       "q_modularity") {
    val oneShot = Graph.qModularity(spark, sfDir).collect()
      .map(_.toSeq).toSeq
    val stored = graft.pipeline.SignatureStore
      .gatedModularity(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(stored == oneShot)
  }

  test("cohesion store serves the lpa view == one-shot q_lpa") {
    val oneShot = Graph.qLpa(spark, sfDir).collect().map(_.toSeq).toSeq
    val stored = graft.pipeline.SignatureStore.gatedLpa(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stored == oneShot)
  }

  test("cohesion store serves the linkpred view == one-shot q_linkpred") {
    val oneShot = Graph.qLinkpred(spark, sfDir).collect().map(_.toSeq).toSet
    val stored = graft.pipeline.SignatureStore.gatedLinkpred(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(stored == oneShot)
  }

  test("graph store serves the ppr view == one-shot q_ppr") {
    val oneShot = Graph.qPpr(spark, sfDir).collect().map(_.toSeq).toSet
    val stored = graft.pipeline.SignatureStore.gatedPpr(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(stored == oneShot)
  }

  test("graph store == one-shot pagerank after parity-split ingest") {
    val oneShot = Graph.qPagerank(spark, sfDir).collect().map(_.toSeq).toSet
    val stored = graft.pipeline.SignatureStore.gatedGraph(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(stored == oneShot)
  }

  test("hits: planted bipartite graph matches an exact driver replay " +
       "of the normalized reinforcement iteration") {
    // u1 -> {10, 20}, u2 -> {10}: o10 outranks o20 as an authority
    // (two hubs point at it), u1 outranks u2 as a hub (it points at
    // both authorities). Replay the exact integer half-steps on the
    // driver and demand bit-equality.
    val pairs = Seq((1L, 10L), (1L, 20L), (2L, 10L))
    val arcs = pairs.map { case (u, o) => (2 * u, 2 * o + 1) }.distinct
    var h = arcs.map(_._1).distinct.map(v => v -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to Graph.iterations) {
      val ra = arcs.groupBy(_._2).view.mapValues(_.map(e => h(e._1)).sum)
        .toMap
      val at = ra.values.sum
      a = ra.view.mapValues(v => 1000000L * v / at).toMap
      val rh = arcs.groupBy(_._1).view.mapValues(_.map(e => a(e._2)).sum)
        .toMap
      val ht = rh.values.sum
      h = rh.view.mapValues(v => 1000000L * v / ht).toMap
    }
    val expected =
      h.map { case (v, s) => ("hub", v / 2, s) }.toSet ++
        a.map { case (v, s) => ("auth", v / 2, s) }
    val got = Graph.hitsFrom(Graph.fwdPairs(
        graft.core.Transform.extractFrom(eventsOf(pairs))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // the roles genuinely separate: the shared authority dominates,
    // the two-arc hub dominates
    val auth = got.filter(_._1 == "auth").map(t => t._2 -> t._3).toMap
    val hubs = got.filter(_._1 == "hub").map(t => t._2 -> t._3).toMap
    assert(auth(10L) > auth(20L) && hubs(1L) > hubs(2L))
  }

  test("hits store: parity-split edge landings serve the one-shot " +
       "hubs/authorities view") {
    val oneShot = Graph.qHits(spark, sfDir).collect().map(_.toSeq).toSeq
    val stored = graft.pipeline.SignatureStore.gatedHits(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stored == oneShot)
  }

  test("cooccur: planted pairs count common users; cap excludes hot user") {
    val s = spark; import s.implicits._
    // users 1,2 both touch {10, 20} -> pair (10,20) cnt 2;
    // user 3 touches {10, 30} only -> (10,30) cnt 1 falls below support;
    // user 4 exceeds the degree cap -> contributes nothing at all
    val hot = (0 until Graph.cooccurMaxDeg + 1)
      .map(i => (4L, 1000L + i))
    val rows = (Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L)) ++ hot)
      .zipWithIndex.map { case ((u, o), i) =>
        (i.toLong, new java.sql.Timestamp(1000L + i), u, "view", 1.0,
          s"""{"k": $o}""")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Graph.cooccurFrom(graft.core.Transform.extractFrom(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 20L, 2L)))
  }

  private def eventsOf(pairs: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    pairs.zipWithIndex.map { case ((u, o), i) =>
      (i.toLong, new java.sql.Timestamp(1000L + i), u, "view", 1.0,
        s"""{"k": $o}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("triangles: planted clique counts once per corner; lift gate " +
       "excludes the uniform graph") {
    // users 1-4 touch all of {10,20,30}; users 5,6 touch {40,50} only.
    // The bystander pair raises n_users to 6, so the clique pairs pass
    // the lift gate (cnt*n/(c1*c2) = 4*6/16 = 1.5 > 1.05); pair (40,50)
    // also passes (lift 3) but closes no wedge. Exactly one triangle,
    // counted at each of its three corners.
    val base = (1L to 4L).flatMap(u => Seq(10L, 20L, 30L).map((u, _))) ++
      Seq((5L, 40L), (5L, 50L), (6L, 40L), (6L, 50L))
    val got = Graph.trianglesFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 1L), (20L, 1L), (30L, 1L)))
    // Without the bystanders every pair's co-occurrence is exactly what
    // popularity predicts (lift = 1): the gate must drop ALL edges -
    // this is the complete-overlap case an absolute threshold keeps.
    val uniform = (1L to 4L).flatMap(u => Seq(10L, 20L, 30L).map((u, _)))
    assert(Graph.trianglesFrom(
      graft.core.Transform.extractFrom(eventsOf(uniform))).isEmpty)
  }

  test("ppr: mass stays on the seed cohort's k-hop neighborhood, " +
       "exact integer walk") {
    // seed user 0 - obj 5 - user 1 - obj 7 chain; user 3 - obj 9 is
    // disconnected from the cohort and must carry ZERO mass.
    // Hand-replayed 3-iteration integer walk (see values below).
    val got = Graph.pprFrom(Graph.fwdPairs(
        graft.core.Transform.extractFrom(eventsOf(Seq(
          (0L, 5L), (1L, 5L), (1L, 7L), (3L, 9L))))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("user", 0L, 204187L),   // seed: 150000 + 17*63750 DIV 20
      ("user", 1L, 54187L),    // 2-hop user
      ("obj", 5L, 588093L),    // 1-hop object, both users feed it
      ("obj", 7L, 153531L)),   // 3-hop object
      s"ppr support/values drifted: $got")
  }

  test("kcore: a whiskered clique peels to the clique; a whisker-only " +
       "graph peels to nothing") {
    // users 1-4 on the clique {10,20,30,40}; users 5,6 whisker (40,50);
    // users 7,8 bystand on (60,70) raising n_users to 8 so every edge
    // clears the lift bar (worst: (40,50) at 2*8/(6*2)).
    val clique = (1L to 4L).flatMap(u =>
      Seq(10L, 20L, 30L, 40L).map((u, _)))
    val whisker = Seq((5L, 40L), (5L, 50L), (6L, 40L), (6L, 50L))
    val bystand = Seq((7L, 60L), (7L, 70L), (8L, 60L), (8L, 70L))
    val got = Graph.kcoreFrom(graft.core.Transform.extractFrom(
        eventsOf(clique ++ whisker ++ bystand)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // node 50 (deg 1), 60, 70 (deg 1 each) peel; the clique survives
    // with every member at in-core degree 3
    assert(got == Seq((10L, 3L), (20L, 3L), (30L, 3L), (40L, 3L)))
    // whisker + bystander alone: max degree 1 - the 3-core is EMPTY,
    // and the loop must terminate at the empty fixpoint
    assert(Graph.kcoreFrom(graft.core.Transform.extractFrom(
      eventsOf(whisker ++ bystand))).isEmpty)
  }

  test("kcore on the fixture is deterministic and every member keeps " +
       ">= k in-core neighbors") {
    val a = Graph.qKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Graph.qKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(a.forall(_._2 >= Graph.kcoreK),
      "fixpoint members must all keep >= k in-core neighbors")
  }

  test("triangles: hub orientation closes wedges without fanning out") {
    // star around hub 10 plus one rim edge: {10-20, 10-30, 20-30} is
    // the only triangle; rim pair (20,40) lacks support-2. Degree
    // orientation must direct rim->hub, so the hub's degree never
    // explodes the wedge set, and the triangle still lands exactly once.
    // Bystander users 100-106 on pair (60,70) raise n_users to 16 so
    // the hub edges clear the lift bar (worst: 10-20 at 2*16/(6*5)).
    val base =
      Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),   // edge 10-20
        (3L, 10L), (3L, 30L), (4L, 10L), (4L, 30L),     // edge 10-30
        (5L, 10L), (5L, 40L), (6L, 10L), (6L, 40L),     // edge 10-40
        (7L, 20L), (7L, 30L), (8L, 20L), (8L, 30L),     // edge 20-30
        (9L, 20L), (9L, 40L)) ++                        // support-1 pair
      (100L to 106L).flatMap(u => Seq((u, 60L), (u, 70L)))
    val got = Graph.trianglesFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 1L), (20L, 1L), (30L, 1L)))
    // determinism across runs (localCheckpoint'd edge relation)
    val again = Graph.trianglesFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again == got)
  }

  test("concomp: two planted components resolve to min-id labels with " +
       "exact sizes; edge endpoints always share a label") {
    // users 1,2 share object 10 (component min = user1's node 2,
    // size 3); user 3 alone on object 20 (min = node 6, size 2)
    val base = Seq((1L, 10L), (2L, 10L), (3L, 20L))
    val got = Graph.concompFrom(spark,
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("obj", 10L, 2L, 3L), ("obj", 20L, 6L, 2L),
      ("user", 1L, 2L, 3L), ("user", 2L, 2L, 3L), ("user", 3L, 6L, 2L)))
    // corpus-level invariants: endpoints agree, labels are members,
    // sizes partition the node set
    val tuples = graft.core.Transform.extract(spark, sfDir)
    val comp = Graph.concompFrom(spark, tuples)
      .withColumn("v", when(col("node_kind") === "user",
        col("node_id") * 2).otherwise(col("node_id") * 2 + 1))
    val lbl = comp.select(col("v"), col("comp_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.values.toSet.subsetOf(lbl.keySet),
      "every component label must itself be a member node")
    assert(lbl.forall { case (v, c) => c <= v },
      "label must be the component minimum")
    val edges = Graph.fwdPairs(tuples).collect()
    assert(edges.forall(e => lbl(e.getLong(0)) == lbl(e.getLong(1))),
      "edge endpoints must share a component")
  }

  test("diameter: double sweep walks the planted chain end to end; " +
       "the disconnected pair stays out of the seed component") {
    // chain u1-o10-u2-o20-u3: seed = u1 (min encoded node), first
    // sweep reaches u3 at hops 4 (the far end), second sweep from u3
    // measures the exact path diameter 4 over the 5 reached nodes;
    // (u5, o30) is a separate component and must not count
    val base = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (5L, 30L))
    val got = Graph.diameterFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect().map(_.toSeq).toSeq
    assert(got == Seq(Seq("user", 1L, "user", 3L, 4L, 4L, 5L)),
      s"diameter: $got")
    // star u1..u4 -> o10: seed u1, far end any leaf at 2 hops (tie
    // resolves to the smallest id, u2), diameter exactly 2, 5 nodes
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
    val got2 = Graph.diameterFrom(
        graft.core.Transform.extractFrom(eventsOf(star)))
      .collect().map(_.toSeq).toSeq
    assert(got2 == Seq(Seq("user", 1L, "user", 2L, 2L, 2L, 5L)),
      s"star diameter: $got2")
  }

  test("harmonic: landmark sums hand-computed on the chain; a " +
       "landmark-only component reaches nothing and reports nothing") {
    // chain u1-o10-u2-o20-u3 plus lone pair (u5, o30): encoded nodes
    // sorted 2,4,6,10,21,41,61 -> landmarks {2,4,6,10}. Hand sums
    // (10^6 DIV d over landmarks at d > 0): u1 750000, u2 10^6,
    // u3 750000, o10/o20 2333333, o30 10^6; u5 is reached by no
    // OTHER landmark -> distance-undefined, absent.
    val base = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (5L, 30L))
    val got = Graph.harmonicFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("obj", 10L, 2333333L), ("obj", 20L, 2333333L),
      ("obj", 30L, 1000000L),
      ("user", 1L, 750000L), ("user", 2L, 1000000L),
      ("user", 3L, 750000L)), s"harmonic: $got")
  }

  test("ktruss: a 4-clique survives with support 2, pendant chains " +
       "are stripped round one, and a lone triangle cascades to empty") {
    val s = spark; import s.implicits._
    def truss(edges: Seq[(Long, Long)]) =
      Graph.trussFromEdges(edges.toDF("o1", "o2")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 4-clique + pendant chain: every clique edge sits in exactly 2
    // clique triangles; the chain has none and is peeled immediately
    // WITHOUT disturbing the clique supports
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L))
    val got = truss(clique ++ Seq((4L, 5L), (5L, 6L)))
    assert(got == clique.map { case (a, b) => (a, b, 2L) },
      s"ktruss: $got")
    // a lone triangle: every edge has support 1 < trussK-2 = 2, so
    // the first peel empties it (4-truss demands denser cohesion
    // than the triangle itself - the edge-vs-node peel distinction)
    assert(truss(Seq((7L, 8L), (7L, 9L), (8L, 9L))).isEmpty,
      "a bare triangle is not a 4-truss")
  }

  test("betweenness: Brandes dependencies hand-computed on the chain " +
       "under DEGREE-ranked landmarks; endpoints score 0 and the " +
       "landmark-free component reports nothing") {
    // chain u1-o10-u2-o20-u3 (encoded path 2-21-4-41-6) plus lone
    // pair (u5, o30): sym degrees 4:2, 21:2, 41:2, others 1 ->
    // top-4-by-degree landmarks (id tie-break) {4, 21, 41, 2}. Hand
    // Brandes per landmark (sigma = 1 everywhere on a path, delta in
    // micro-units):
    //   lm=2:  21:3e6, 4:2e6, 41:1e6, 6:0
    //   lm=4:  21:1e6, 41:1e6, 2:0, 6:0
    //   lm=21: 4:2e6, 41:1e6, 2:0, 6:0
    //   lm=41: 4:2e6, 21:1e6, 2:0, 6:0
    // Sums: o10 5e6, o20 3e6, u1 0, u2 6e6, u3 0. The lone pair
    // (u5, o30) holds no landmark (degree 1, ids above the
    // tie-break) and is reached by none -> ABSENT, unlike the old
    // id-order pick that spent a landmark on it: the degree rank
    // concentrates the sample where the paths are.
    val base = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (5L, 30L))
    val got = Graph.betweennessFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("obj", 10L, 5000000L), ("obj", 20L, 3000000L),
      ("user", 1L, 0L), ("user", 2L, 6000000L),
      ("user", 3L, 0L)), s"betweenness: $got")
  }

  test("bfs hops: planted chain counts exact alternating distances and " +
       "excludes the disconnected pair") {
    // chain u1-o10-u2-o20-u3 from source u1 (the min encoded node);
    // (u5, o30) is a separate component and must not appear
    val base = Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (5L, 30L))
    val got = Graph.bfsHopsFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("obj", 10L, 1L), ("obj", 20L, 3L),
      ("user", 1L, 0L), ("user", 2L, 2L), ("user", 3L, 4L)))
    // corpus-level BFS invariant: along every edge the hop count
    // changes by at most one, and exactly one source sits at zero
    val tuples = graft.core.Transform.extract(spark, sfDir)
    val hops = Graph.bfsHopsFrom(tuples)
      .withColumn("v", when(col("node_kind") === "user",
        col("node_id") * 2).otherwise(col("node_id") * 2 + 1))
      .select(col("v"), col("hops")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops.values.count(_ == 0L) == 1)
    val edges = Graph.fwdPairs(tuples).collect()
    assert(edges.forall { e =>
      (hops.get(e.getLong(0)), hops.get(e.getLong(1))) match {
        case (Some(a), Some(b)) => math.abs(a - b) <= 1
        case (None, None) => true // both outside the source component
        case _ => false // reached node adjacent to unreached one
      }
    }, "BFS hop counts must be edge-consistent")
  }

  test("degree dist: histogram masses recompute from the arc list") {
    val base = Seq((1L, 10L), (1L, 20L), (2L, 10L))
    val got = Graph.degreeDistFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("obj", 1L, 1L), ("obj", 2L, 1L),
      ("user", 1L, 1L), ("user", 2L, 1L)))
    // corpus-level: node and arc masses recompute from the histogram
    val tuples = graft.core.Transform.extract(spark, sfDir)
    val rows = Graph.degreeDistFrom(tuples).collect()
    val nFwd = Graph.fwdPairs(tuples).count()
    assert(rows.map(r => r.getLong(1) * r.getLong(2)).sum == 2 * nFwd,
      "sum(degree x nodes) must equal the directed arc count")
  }

  test("assortativity: a star is exactly -1; the corpus value is a " +
       "valid correlation over the right arc count") {
    // one user touching three objects: every arc links degree 3 to
    // degree 1, a perfectly disassortative graph
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    val r = Graph.assortativityFrom(
        graft.core.Transform.extractFrom(eventsOf(star)))
      .collect().head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == -1.0)
    val tuples = graft.core.Transform.extract(spark, sfDir)
    val c = Graph.assortativityFrom(tuples).collect().head
    assert(c.getLong(0) == 2 * Graph.fwdPairs(tuples).count())
    assert(c.getDouble(1) >= -1.0 && c.getDouble(1) <= 1.0)
  }

  test("katz: hand-replayed 3-iteration integer walk on a 2-star; " +
       "walk counting is NOT degree-normalized") {
    // user 0 (v=0) - objects 1, 2 (v=3, 5). Per iteration
    // x'(v) = (sum over nbrs of (x + 1e6)) DIV 8:
    //   i1: u = 2e6/8 = 250000,  a = b = 1e6/8 = 125000
    //   i2: u = 2*(1125000)/8 = 281250, a = b = 1250000/8 = 156250
    //   i3: u = 2*(1156250)/8 = 289062, a = b = 1281250/8 = 160156
    val got = Graph.katzFrom(Graph.fwdPairs(
        graft.core.Transform.extractFrom(eventsOf(Seq(
          (0L, 1L), (0L, 2L))))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(("obj", 1L, 160156L), ("obj", 2L, 160156L),
      ("user", 0L, 289062L)), s"katz walk wrong: $got")
  }

  test("lcc: a planted clique corner is exactly 1.0 and an open wedge " +
       "is 0; degree-1 nodes are excluded") {
    // reuse the triangle fixture: clique {10,20,30} (lift-passing) and
    // the wedge-free pair (40,50). Clique nodes: degree 2, one
    // triangle -> lcc = 2*1/(2*1) = 1.0; pair nodes: degree 1 ->
    // excluded entirely.
    val base = (1L to 4L).flatMap(u => Seq(10L, 20L, 30L).map((u, _))) ++
      Seq((5L, 40L), (5L, 50L), (6L, 40L), (6L, 50L))
    val got = Graph.lccFrom(
        graft.core.Transform.extractFrom(eventsOf(base)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((10L, 2L, 1L, 1.0), (20L, 2L, 1L, 1.0),
      (30L, 2L, 1L, 1.0)), s"lcc wrong: $got")
  }
}
