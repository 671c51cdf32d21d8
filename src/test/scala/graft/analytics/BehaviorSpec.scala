package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered-funnel semantics on planted users: the ORDER constraint is
  * the whole point — doing a later step before the earlier one must
  * not convert.
  */
class BehaviorSpec extends SparkSpec {

  test("gini: hand-computed concentration on planted counts; uniform " +
       "activity scores zero") {
    val s = spark; import s.implicits._
    def eventsFor(counts: Seq[Int]): String = {
      val rows = counts.zipWithIndex.flatMap { case (c, u) =>
        (0 until c).map { i =>
          ((u * 1000 + i).toLong, new java.sql.Timestamp(1000L + i),
            u.toLong, "view", 1.0, """{"k": 1}""")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gini").toString
      rows.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      tmp
    }
    // counts (1,1,1,1,6): sorted ranks 1..5, sum(rk*x) = 1+2+3+4+30 =
    // 40, sum x = 10 -> G = 2*40/(5*10) - 6/5 = 0.4
    val skewed = Tpch.qGini(spark, eventsFor(Seq(1, 1, 1, 1, 6)))
      .collect().head
    assert(skewed.getLong(0) == 5L && skewed.getLong(1) == 10L)
    assert(skewed.getDouble(2) == 0.4, s"want 0.4: $skewed")
    // perfectly uniform activity -> zero concentration
    val flat = Tpch.qGini(spark, eventsFor(Seq(3, 3, 3, 3)))
      .collect().head
    assert(flat.getDouble(2) == 0.0, s"uniform must be 0: $flat")
  }

  test("session overlap: tiled self-join counts each overlapping pair " +
       "once, even across a tile boundary") {
    val s = spark; import s.implicits._
    // times in seconds; tile = 3600s. Session A (user 1) [3500, 3700]
    // and B (user 2) [3550, 3650] share TWO tiles (0 and 1) - the
    // ownership rule must score the pair exactly once. C (user 3) at
    // [10000, 10000] overlaps nothing.
    val ev = Seq(
      (1L, 3500L), (1L, 3700L),
      (2L, 3550L), (2L, 3650L),
      (3L, 10000L))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000L), u, "view", 1.0,
          """{"k": 1}""")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sessov").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tpch.qSessionOverlap(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)),
      s"cross-tile pair must count once: $got")
    // sanity on the fixture: concurrency is symmetric in total (every
    // unordered pair contributes to exactly two sessions)
    val tot = Tpch.qSessionOverlap(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    assert(tot % 2 == 0 && tot > 0)
  }

  test("funnel: step order is enforced per user") {
    val s = spark; import s.implicits._
    // user 1: view -> click -> purchase        (all three steps)
    // user 2: click -> view                    (click BEFORE view: step 1 only)
    // user 3: view -> purchase -> click        (purchase before the
    //                                           converted click: steps 1, 2)
    // user 4: purchase only                    (no view: no steps)
    val ev = Seq(
      (10L, 1L, "view"), (11L, 1L, "click"), (12L, 1L, "purchase"),
      (20L, 2L, "click"), (21L, 2L, "view"),
      (30L, 3L, "view"), (31L, 3L, "purchase"), (32L, 3L, "click"),
      (40L, 4L, "purchase"))
      .map { case (id, u, t) => (id, (id % 10 + 1) * 1000L, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_fn").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)), s"funnel report wrong: $rows")
  }

  test("paths: per-user prefix in event order, shared prefixes ranked") {
    val s = spark; import s.implicits._
    // users 1+2 share the exact 3-step journey; user 3 diverges; path
    // is the FIRST pathLen events, so user 4's 6th event is ignored
    val ev = Seq(
      (10L, 1L, "a"), (11L, 1L, "b"), (12L, 1L, "c"),
      (20L, 2L, "a"), (21L, 2L, "b"), (22L, 2L, "c"),
      (30L, 3L, "b"),
      (40L, 4L, "a"), (41L, 4L, "a"), (42L, 4L, "a"),
      (43L, 4L, "a"), (44L, 4L, "a"), (45L, 4L, "zzz"))
      .map { case (id, u, t) => (id, (id + 1) * 1000L, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_pth").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qPaths(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a>b>c", 2L), (2L, "a>a>a>a>a", 1L),
      (3L, "b", 1L)), s"paths wrong: $rows")
  }

  test("markov: transitions follow per-user event order; rows " +
       "normalize per from-state") {
    val s = spark; import s.implicits._
    // user 1: a -> b -> a   (a→b, b→a)
    // user 2: a -> a -> c   (a→a, a→c)
    // user 3: b only        (no transition)
    val ev = Seq(
      (10L, 1L, "a"), (11L, 1L, "b"), (12L, 1L, "a"),
      (20L, 2L, "a"), (21L, 2L, "a"), (22L, 2L, "c"),
      (30L, 3L, "b"))
      .map { case (id, u, t) => (id, (id % 10 + 1) * 1000L, u, t, 1.0,
        "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_mkv").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qMarkov(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(rows == Seq(
      ("a", "a", 1L, 3L, 0.333333), ("a", "b", 1L, 3L, 0.333333),
      ("a", "c", 1L, 3L, 0.333333), ("b", "a", 1L, 1L, 1.0)),
      s"markov matrix wrong: $rows")
  }

  test("markov2: the periodic-3 sequence carries exactly ln(2) of " +
       "memory where the first-order matrix is 50/50, and zero where " +
       "it is already deterministic") {
    val s = spark; import s.implicits._
    // one user: a a b a a b a a b -> first-order from a is 50/50
    // (a->a 3, a->b 3) but the CONTEXT decides perfectly:
    // (a,a)->b always, (b,a)->a always -> lift ln 2 = 693147; from b
    // the first order is already deterministic (b->a 2/2), so
    // (a,b)->a carries zero lift.
    val ev = Seq("a", "a", "b", "a", "a", "b", "a", "a", "b")
      .zipWithIndex.map { case (t, i) =>
        (i.toLong, (i + 1) * 1000L, 1L, t, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_mk2").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qMarkov2(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(rows == Seq(
      ("a", "a", "b", 3L, 3L, 1.0, 693147L),
      ("a", "b", "a", 2L, 2L, 1.0, 0L),
      ("b", "a", "a", 2L, 2L, 1.0, 693147L)),
      s"markov2 wrong: $rows")
  }

  test("cohort: first-activity week assigns the cohort, cells count " +
       "distinct returning users") {
    val s = spark; import s.implicits._
    val weekNs = Behavior.cohortWeekUs * 1000L
    // user 1 active weeks 0,1,2; user 2 weeks 0,2 (skips 1, and twice
    // in week 0 - distinct per week); user 3 weeks 1,2 (cohort 1)
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L),
      (4L, 2L, 0L), (5L, 2L, 0L), (6L, 2L, 2L),
      (7L, 3L, 1L), (8L, 3L, 2L))
      .map { case (id, u, wk) => (id, wk * weekNs + id * 1000L, u, "view",
        1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_coh").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qCohort(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq(
      (0L, 0L, 2L, 2L), (0L, 1L, 1L, 2L), (0L, 2L, 2L, 2L),
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 1L)), s"cohort matrix wrong: $rows")
  }

  test("seq pattern: greedy leftmost non-overlapping runs, broken by " +
       "intervening events, arrival order irrelevant") {
    val s = spark; import s.implicits._
    // user 1: v c v p e p -> one greedy match "vcvp" (the trailing
    //         lone p has no browse run before it)
    // user 2: p v c       -> purchase BEFORE the browse run: no match
    // user 3: v e v p     -> the error breaks the first run: "vp" only
    // user 4: c p c p     -> two disjoint matches
    val ev = Seq(
      (10L, 1L, "view"), (11L, 1L, "click"), (12L, 1L, "view"),
      (13L, 1L, "purchase"), (14L, 1L, "error"), (15L, 1L, "purchase"),
      (20L, 2L, "purchase"), (21L, 2L, "view"), (22L, 2L, "click"),
      (30L, 3L, "view"), (31L, 3L, "error"), (32L, 3L, "view"),
      (33L, 3L, "purchase"),
      (40L, 4L, "click"), (41L, 4L, "purchase"), (42L, 4L, "click"),
      (43L, 4L, "purchase"))
      .map { case (id, u, t) => (id, (id % 10 + 1) * 1000L, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      // shuffled write order: the in-row array_sort must restore the
      // (ts, event_id) sequence regardless of arrival order
      .orderBy(expr("hash(event_id)"))
    val dir = java.nio.file.Files.createTempDirectory("graft_seq").toString
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Behavior.qSeqPattern(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(rows == Seq(
      (1L, 6L, 1L, "vcvp"), (2L, 3L, 0L, ""),
      (3L, 4L, 1L, "vp"), (4L, 4L, 2L, "cp|cp")),
      s"seq pattern report wrong: $rows")
  }

  test("lorenz: decile curve hand-computed on the gini fixture; the " +
       "heavy tail lands alone in the top decile") {
    val s = spark; import s.implicits._
    // counts (1,1,1,1,6), n=5 -> deciles (rk-1)*10 DIV 5 + 1 =
    // 1,3,5,7,9, one user each; cum shares .1 .2 .3 .4 1.0
    val got = Tpch.lorenzFromCounts(Seq(
        (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 6L))
      .toDF("user_id", "x")).collect().map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(1L, 1L, 1L, 1L, 0.1), Seq(3L, 1L, 1L, 2L, 0.2),
      Seq(5L, 1L, 1L, 3L, 0.3), Seq(7L, 1L, 1L, 4L, 0.4),
      Seq(9L, 1L, 6L, 10L, 1.0)), s"lorenz: $got")
  }

  test("stickiness: hand-computed DAU/MAU over two 30-day windows; " +
       "a window's repeat visitor counts once in MAU, twice in DAU") {
    val s = spark; import s.implicits._
    // window 0: day 1 users {1,2}, day 2 users {1} -> dau_sum 3,
    // mau 2, n_days 2 -> 3/(2*2) = 0.75; window 1: day 31 user {3}
    // -> 1/(1*1) = 1.0
    val du = Seq((1L, 1L), (1L, 2L), (2L, 1L), (31L, 3L))
      .toDF("d", "user_id")
    val got = Behavior.stickinessFromDayUsers(du).collect()
      .map(_.toSeq).toSeq
    assert(got == Seq(
      Seq(0L, 2L, 3L, 2L, 0.75),
      Seq(1L, 1L, 1L, 1L, 1.0)), s"stickiness: $got")
  }

  test("chisq: hand-computed 2x2 contingency incl. a zero-observed " +
       "cell; single-group tables yield dof 0 and no V") {
    val s = spark; import s.implicits._
    // cells (view,0)=4 (view,1)=2 (purchase,0)=1 (purchase,1)=3:
    // margins 6/4 and 5/5, n=10 -> e = 3,3,2,2; micro contribs
    // 333333+333333+500000+500000 -> chi2 1.666666, dof 1,
    // V = q6(sqrt(1.666666/10))
    val a = Behavior.chisqFromCells(Seq(
        ("view", 0L, 4L), ("view", 1L, 2L),
        ("purchase", 0L, 1L), ("purchase", 1L, 3L))
      .toDF("et", "grp", "n")).collect().head
    assert(a.toSeq.take(5) == Seq(10L, 2L, 2L, 1L, 1.666666),
      s"chisq: ${a.toSeq}")
    val vExp = math.floor(
      math.sqrt(1.666666 / 10.0) * 1e6 + 0.5) / 1e6
    assert(a.getDouble(5) == vExp, s"V: ${a.getDouble(5)}")
    // a type seen only in one cohort: the (buy, 0) cell contributes
    // its full expectation 0.75 -> micro 750000 despite obs 0
    val b = Behavior.chisqFromCells(Seq(
        ("view", 0L, 3L), ("view", 1L, 3L), ("buy", 1L, 2L))
      .toDF("et", "grp", "n")).collect().head
    assert(b.toSeq.take(5) == Seq(8L, 2L, 2L, 1L, 1.6),
      s"zero cell: ${b.toSeq}")
    // one group only -> every expectation equals its observation,
    // chi2 0, dof 0, V NULL
    val c = Behavior.chisqFromCells(Seq(
        ("view", 0L, 3L), ("buy", 0L, 2L))
      .toDF("et", "grp", "n")).collect().head
    assert(c.toSeq.take(5) == Seq(5L, 2L, 1L, 0L, 0.0), s"${c.toSeq}")
    assert(c.isNullAt(5), s"single-group V must be NULL: $c")
  }

  test("spearman: monotone data scores exactly 1 regardless of " +
       "outliers, anti-monotone -1, tied blocks stay exact, constant " +
       "axis yields no verdict") {
    val s = spark; import s.implicits._
    def sp(pc: Seq[(Long, Long, Long)]): org.apache.spark.sql.Row =
      graft.analytics.Tpch.spearmanFromPairCounts(
        pc.toDF("x", "y", "k")).collect().head
    // a wild y outlier that would drag Pearson: ranks don't care
    val mono = sp(Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L),
      (4L, 1000000L, 1L)))
    assert(mono.getLong(0) == 4L && mono.getDouble(1) == 1.0, s"$mono")
    val anti = sp(Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
    assert(anti.getDouble(1) == -1.0, s"$anti")
    // tie blocks: both axes tie identically -> still a perfect
    // monotone relation under average ranks
    val tied = sp(Seq((1L, 1L, 2L), (2L, 2L, 1L)))
    assert(tied.getLong(0) == 3L && tied.getDouble(1) == 1.0, s"$tied")
    val flat = sp(Seq((1L, 7L, 2L), (2L, 7L, 3L)))
    assert(flat.isNullAt(1), s"constant axis must be NULL: $flat")
  }

  test("kruskal-wallis: hand-computed H on three separated groups; " +
       "all-tied and single-group corpora yield no verdict") {
    val s = spark; import s.implicits._
    def kw(pc: Seq[(String, Long, Long)]): Array[org.apache.spark.sql.Row] =
      Behavior.kruskalFromCounts(pc.toDF("et", "v_mu", "c")).collect()
    // A={1,2}, B={3,4}, C={5,6}: rank sums 3/7/11, no ties ->
    // H = 12/(6*7) * (9/2 + 49/2 + 121/2) - 3*7 = 32/7
    val r = kw(Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 3L, 1L),
      ("b", 4L, 1L), ("c", 5L, 1L), ("c", 6L, 1L)))
    assert(r.length == 3 && r.forall(_.getLong(3) == 3L))
    assert(r.map(x => x.getString(0) -> x.getLong(2)).toSeq ==
      Seq("a" -> 6L, "b" -> 14L, "c" -> 22L), r.mkString(";"))
    val expH = math.floor(32.0 / 7.0 * 1e6 + 0.5) / 1e6
    assert(r.forall(_.getDouble(5) == expH), s"H: ${r.head}")
    // every observation identical -> tie correction denominator 0
    val flat = kw(Seq(("a", 5L, 2L), ("b", 5L, 3L)))
    assert(flat.forall(_.isNullAt(5)), flat.mkString(";"))
    // one group -> nothing to compare
    val one = kw(Seq(("a", 1L, 1L), ("a", 2L, 1L)))
    assert(one.forall(_.isNullAt(5)), one.mkString(";"))
  }

  test("ks test: exact sup gap with argmax ties to the smallest value; " +
       "disjoint supports score D = 1; an empty cohort has no verdict") {
    val s = spark; import s.implicits._
    def ks(pc: Seq[(Long, Long, Long)]): org.apache.spark.sql.Row =
      Behavior.ksFromCounts(pc.toDF("grp", "v_mu", "c")).collect().head
    // A = {1, 2}, B = {2, 3}: ECDF gaps (scaled by n_a*n_b = 4) are
    // 2, 2, 0 -> D = 2/4 at the SMALLEST achieving value v = 1
    val r = ks(Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L),
      (1L, 3L, 1L)))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"ns: $r")
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L, s"sup: $r")
    assert(r.getDouble(4) == 0.5, s"D: $r")
    assert(r.getDouble(5) == 0.5, s"lambda: $r") // 0.5 * sqrt(4/4)
    val disj = ks(Seq((0L, 1L, 3L), (1L, 2L, 2L)))
    assert(disj.getDouble(4) == 1.0, s"disjoint supports: $disj")
    val one = ks(Seq((0L, 1L, 2L), (0L, 5L, 1L)))
    assert(one.isNullAt(4) && one.isNullAt(5),
      s"empty cohort must yield no verdict: $one")
  }

  test("mann-whitney: hand-computed tied-rank U and z on the textbook " +
       "fixture; an all-tied corpus yields no verdict") {
    val s = spark; import s.implicits._
    // A = {1, 2, 3}, B = {2, 4}: tied ranks (1, 2.5, 4) -> R_A = 7.5,
    // U_A = 1.5 (one win + half the 2-2 tie), T = 2^3-2 = 6,
    // var = (6/12)*(6 - 6/20) = 2.85, z = -1.5/sqrt(2.85)
    val vc = Seq((0L, 1000000L, 1L), (0L, 2000000L, 1L),
      (0L, 3000000L, 1L), (1L, 2000000L, 1L), (1L, 4000000L, 1L))
      .toDF("grp", "v_mu", "c")
    val r = Behavior.mannWhitneyFromCounts(vc).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"ns: $r")
    assert(r.getLong(2) == 3L, s"2U_A: $r") // = 2*1.5
    assert(r.getLong(3) == 6L, s"tie term: $r")
    val expZ = math.floor(
      (3.0 - 3.0 * 2.0) / (2.0 * math.sqrt((3.0 * 2.0 / 12.0)
        * ((5.0 + 1.0) - 6.0 / (5.0 * 4.0)))) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == expZ, s"z: $r vs $expZ")
    // every observation identical: tie term kills the variance -> NULL
    val flat = Seq((0L, 5L, 4L), (1L, 5L, 3L)).toDF("grp", "v_mu", "c")
    val fr = Behavior.mannWhitneyFromCounts(flat).collect().head
    assert(fr.isNullAt(4), s"all-tied must yield no verdict: $fr")
  }

  test("dunn: hand-computed pairwise z; k=2 reduces to the mann-whitney " +
       "z on the same counts; all-tied corpus yields no verdict") {
    val s = spark; import s.implicits._
    // a = {1, 2}, b = {3, 4}: pooled ranks 1..4, mean ranks 1.5 vs
    // 3.5, T = 0, var = [4*5/12]*(1/2+1/2) = 5/3,
    // z = -2/sqrt(5/3) = -1.549193 (q6)
    val vc = Seq(("a", 1L, 1L), ("a", 2L, 1L),
      ("b", 3L, 1L), ("b", 4L, 1L)).toDF("et", "v_mu", "c")
    val r = Behavior.dunnFromCounts(vc).collect()
    assert(r.length == 1, s"one pair: ${r.toSeq}")
    assert(r.head.getString(0) == "a" && r.head.getString(1) == "b")
    assert(r.head.getLong(2) == 2L && r.head.getLong(3) == 2L)
    val expZ = math.floor(
      -2.0 / math.sqrt(4.0 * 5.0 / 12.0 * (0.5 + 0.5)) * 1e6 + 0.5) / 1e6
    assert(r.head.getDouble(4) == expZ, s"z: ${r.head} vs $expZ")
    // k = 2: Dunn's tie-corrected pooled-rank z IS the Mann-Whitney z
    // (same ranking, algebraically identical variance) - the
    // cross-check that the post-hoc member agrees with the pairwise
    // family on its shared ground
    val mwVc = Seq((0L, 1000000L, 2L), (0L, 2000000L, 1L),
      (0L, 3000000L, 4L), (1L, 2000000L, 3L), (1L, 4000000L, 2L),
      (1L, 1000000L, 1L)).toDF("grp", "v_mu", "c")
    val zMw = Behavior.mannWhitneyFromCounts(mwVc).collect()
      .head.getDouble(4)
    val dunnVc = mwVc.select(
      when(col("grp") === 0, "a").otherwise("b").as("et"),
      col("v_mu"), col("c"))
    val zDunn = Behavior.dunnFromCounts(dunnVc).collect()
      .head.getDouble(4)
    assert(math.abs(zDunn - zMw) <= 1e-6,
      s"k=2 Dunn must equal MW z: $zDunn vs $zMw")
    // every observation identical: the tie correction kills the
    // variance -> no verdict
    val flat = Seq(("a", 5L, 4L), ("b", 5L, 3L)).toDF("et", "v_mu", "c")
    val fr = Behavior.dunnFromCounts(flat).collect().head
    assert(fr.isNullAt(4), s"all-tied must yield no verdict: $fr")
  }

  test("abtest: hand-computed pooled z over planted arms; a " +
       "degenerate pooled rate yields no verdict") {
    val s = spark; import s.implicits._
    // arm A (grp 0): 4 users, 2 converted; arm B: 5 users, 1 ->
    // rates .5/.2, pooled 1/3, z = .3/sqrt((1/3)(2/3)(1/4+1/5))
    val a = Behavior.abtestFromFlags(Seq(
        (2L, 0L, 1L), (4L, 0L, 1L), (6L, 0L, 0L), (8L, 0L, 0L),
        (1L, 1L, 1L), (3L, 1L, 0L), (5L, 1L, 0L), (7L, 1L, 0L),
        (9L, 1L, 0L))
      .toDF("user_id", "grp", "conv")).collect().head
    assert(a.toSeq.take(4) == Seq(4L, 2L, 5L, 1L), s"${a.toSeq}")
    assert(a.getDouble(4) == 0.5 && a.getDouble(5) == 0.2)
    val zExp = math.floor(
      (2.0 / 4.0 - 1.0 / 5.0) / math.sqrt(
        (3.0 / 9.0) * (1.0 - 3.0 / 9.0) * (1.0 / 4.0 + 1.0 / 5.0))
      * 1e6 + 0.5) / 1e6
    assert(a.getDouble(6) == zExp, s"z: ${a.getDouble(6)}")
    // every user converted -> pooled p = 1, zero variance, z NULL
    val b = Behavior.abtestFromFlags(Seq(
        (2L, 0L, 1L), (1L, 1L, 1L))
      .toDF("user_id", "grp", "conv")).collect().head
    assert(b.toSeq.take(4) == Seq(1L, 1L, 1L, 1L) && b.isNullAt(6),
      s"degenerate: ${b.toSeq}")
  }

  test("survival: hand-computed Kaplan-Meier with censoring - the " +
       "risk set shrinks through censored-only days, deaths before " +
       "censoring at equal times, exact micro-unit product") {
    val s = spark; import s.implicits._
    val day = 86400000L // ms
    // user 1: events day 0, 1, 3 -> gaps 1, 2; censored at 0 (obs end
    // = day 3). user 2: events day 0, 2 -> gap 2; censored at 1.
    // durations: deaths {1:1, 2:2}, censors {0:1, 1:1}, total 5.
    // KM: day 0 censor-only (risk 5 -> 4); day 1: n=4, d=1 ->
    // S = 750000, then its censor leaves 2; day 2: n=2, d=2 -> S = 0.
    val rows = Seq(
      (0L, 0L, 1L), (1L, 1 * day, 1L), (2L, 3 * day, 1L),
      (3L, 0L, 2L), (4L, 2 * day, 2L))
      .map { case (i, ms, u) =>
        (i, new java.sql.Timestamp(ms), u, "view", 1.0, """{"k":1}""")
      }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_surv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.qSurvival(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 1L, 750000L),
      (2L, 2L, 2L, 0L, 0L)), s"KM curve wrong: $got")
  }

  test("survival logrank: hand-computed two-group log-rank - per-group " +
       "KM curves, pooled-day at-risk accounting, exact micro-unit " +
       "O-E and variance sums, chi2 = 1.0 on the planted split") {
    val s = spark; import s.implicits._
    val day = 86400000L // ms
    // user 0 (grp 0): events day 0,1,2 -> gaps 1,1; censored 1 (obs
    // end = day 3). user 1 (grp 1): events day 0,3 -> gap 3;
    // censored 0.
    // g0 days: t=1 (d=2,c=1); KM: n=3, d=2 -> S = 333333.
    // g1 days: t=0 (c=1), t=3 (d=1); KM: risk 2->1 through t=0,
    //   t=3: n=1, d=1 -> S = 0.
    // log-rank pooled: t=0 d=0 skip (g1 risk 2->1); t=1: n0=3, n1=1,
    //   d0=2, d=2 -> O-E = 2 - 2*3/4 = 0.5 (500000), V =
    //   2*(3/4)*(1/4)*(2/3) = 0.25 (250000); t=3: n=1 -> V term 0,
    //   O-E = 0. chi2 = 0.5^2 / 0.25 = 1.0.
    val rows = Seq(
      (0L, 0L, 0L), (1L, 1 * day, 0L), (2L, 2 * day, 0L),
      (3L, 0L, 1L), (4L, 3 * day, 1L))
      .map { case (i, ms, u) =>
        (i, new java.sql.Timestamp(ms), u, "view", 1.0, """{"k":1}""")
      }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_logrank").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.qSurvivalLogrank(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      (0L, 1L, 3L, 2L, 1L, 333333L, 1.0),
      (1L, 3L, 1L, 1L, 0L, 0L, 1.0)), s"logrank wrong: $got")
  }

  test("markov entropy: deterministic states are exactly 0, a uniform " +
       "2-way split is exactly the micro-nat ln 2, and the rate is " +
       "the frequency-weighted integer mean") {
    val s = spark; import s.implicits._
    // user 1 alternates view/click (both states deterministic);
    // user 2's 'error' splits 2/2 to purchase/signup (entropy ln 2),
    // with purchase/signup returning to error deterministically
    val seq1 = Seq("view", "click", "view", "click", "view")
    val seq2 = Seq("error", "purchase", "error", "signup",
      "error", "purchase", "error", "signup", "error")
    val rows = (seq1.zipWithIndex.map { case (et, i) =>
        (i.toLong, new java.sql.Timestamp(1000L + i), 1L, et, 1.0,
          """{"k":1}""")
      }) ++ (seq2.zipWithIndex.map { case (et, i) =>
        (100L + i, new java.sql.Timestamp(1000L + i), 2L, et, 1.0,
          """{"k":1}""")
      })
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mkent").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Behavior.qMarkovEntropy(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // ln 2 in micro-nats = floor(693147.18 + 0.5) = 693147;
    // rate = (4 * 693147) DIV 12 = 231049
    assert(got == Seq(
      ("click", 2L, 0L, 231049L),
      ("error", 4L, 693147L, 231049L),
      ("purchase", 2L, 0L, 231049L),
      ("signup", 2L, 0L, 231049L),
      ("view", 2L, 0L, 231049L)), s"entropy rows wrong: $got")
  }
}
