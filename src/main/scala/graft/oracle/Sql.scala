package graft.oracle

import graft.core.{Assoc, CacheKind, Config, CountK, LastN}

/** DuckDB oracle SQL, generated from the SAME `Config.rules` that drive
  * the Spark transform - so the two sides cannot drift. Conventions that
  * keep the driver's hash-compare exact:
  *   - times are epoch-micros BIGINT on both sides;
  *   - money/quantity aggregates go through DECIMAL pre-agg, DOUBLE out;
  *   - every query ORDER BYs its full key set;
  *   - no engine-native hash functions: md5 lowercase hex only.
  */
object Sql {

  val tuplesCte: String =
    """tuples AS (
      |  SELECT event_type AS p, user_id AS s,
      |         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS o,
      |         epoch_us(ts) AS t, event_id AS seq
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      |    AND ts IS NOT NULL
      |    AND TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
      |        IS NOT NULL
      |)""".stripMargin

  /** UNION ALL per (rule, output) ≙ the one-pass explode transform. */
  val xfCte: String = {
    val branches = for {
      rule <- Config.rules
      out  <- rule.outs
    } yield {
      val a = out.action.map(s => s"'$s'").getOrElse("CAST(NULL AS VARCHAR)")
      s"""  SELECT '${out.cache}' AS cache, ${out.keyFrom} AS k, $a AS a,
         |         ${out.valFrom} AS v, t, seq
         |  FROM tuples WHERE p = '${rule.pred}'""".stripMargin
    }
    s"xf AS (\n${branches.mkString("\n  UNION ALL\n")}\n)"
  }

  val prefix = s"WITH $tuplesCte, $xfCte"

  private def inList(caches: Seq[String]): String =
    caches.map(c => s"'$c'").mkString("(", ", ", ")")

  def cachesOfSql(kind: CacheKind): String = inList(Config.cachesOf(kind))

  val ssExtract: String =
    s"WITH $tuplesCte SELECT p, s, o, t, seq FROM tuples ORDER BY seq"

  val ssTransform: String =
    s"$prefix SELECT cache, k, a, v, t, seq FROM xf ORDER BY seq, cache"

  val assocStateSelect: String =
    s"""SELECT cache, k, v, t FROM (
       |  SELECT cache, k, v, t,
       |         row_number() OVER (PARTITION BY cache, k
       |                            ORDER BY t DESC, seq DESC) AS rn
       |  FROM xf WHERE cache IN ${cachesOfSql(Assoc)}
       |) WHERE rn = 1""".stripMargin

  val ssCacheAssoc: String =
    s"$prefix, st AS ($assocStateSelect) SELECT * FROM st ORDER BY cache, k"

  val lastnStateSelect: String =
    s"""SELECT cache, k, v, t, rn FROM (
       |  SELECT cache, k, v, t,
       |         row_number() OVER (PARTITION BY cache, k
       |                            ORDER BY t DESC, seq DESC) AS rn
       |  FROM xf WHERE cache IN ${cachesOfSql(LastN)}
       |) WHERE rn <= ${Config.lastNSize}""".stripMargin

  val ssCacheLastn: String =
    s"$prefix, st AS ($lastnStateSelect) " +
      "SELECT * FROM st ORDER BY cache, k, rn"

  val countStateSelect: String =
    s"""SELECT cache, k AS s, a, v AS o,
       |       count(*) AS cnt, max(t) AS last_t
       |FROM xf WHERE cache IN ${cachesOfSql(CountK)}
       |GROUP BY cache, k, a, v""".stripMargin

  val ssCacheCount: String =
    s"$prefix, st AS ($countStateSelect) " +
      "SELECT * FROM st ORDER BY cache, s, a, o"

  val ssSinkPointRead: String =
    s"$prefix, st AS ($countStateSelect) " +
      "SELECT * FROM st ORDER BY cache, s, a, o LIMIT 20"

  val ssCacheKeycount: String =
    s"""$prefix SELECT 'subject-counts' AS cache, k, count(*) AS cnt
       |FROM xf GROUP BY k ORDER BY k""".stripMargin

  val ssUndoAssoc: String =
    s"""WITH $tuplesCte, ops AS (
       |  SELECT o AS k, s AS v, t, seq FROM tuples WHERE p = 'signup'
       |  UNION ALL
       |  SELECT o AS k, CAST(NULL AS BIGINT) AS v, t, seq
       |  FROM tuples WHERE p = 'error'
       |)
       |SELECT 'signup-obj-user' AS cache, k, v, t FROM (
       |  SELECT k, v, t,
       |         row_number() OVER (PARTITION BY k
       |                            ORDER BY t DESC, seq DESC) AS rn
       |  FROM ops
       |) WHERE rn = 1 ORDER BY k""".stripMargin

  /** Exact LastNCache fold (append-with-eviction / retract-all) as a
    * recursive CTE: one step per op per key, list state. The append
    * branch trims from the front when the buffer would exceed n
    * (capacity overflow is always exactly one element); the retract
    * branch is list_filter. rn=1 newest, like the Spark side.
    */
  def ssUndoLastn(n: Int): String =
    s"""WITH RECURSIVE $tuplesCte, ops AS (
       |  SELECT * FROM (
       |    SELECT s AS k,
       |           CASE WHEN p = 'view' THEN 'add' ELSE 'del' END AS op,
       |           o AS v,
       |           row_number() OVER (PARTITION BY s ORDER BY t, seq)
       |             AS step
       |    FROM tuples WHERE p IN ('view', 'click')
       |  )
       |), nsteps AS (
       |  SELECT k, max(step) AS mx FROM ops GROUP BY k
       |), fold AS (
       |  SELECT k, 0 AS step, CAST([] AS BIGINT[]) AS buf FROM nsteps
       |  UNION ALL
       |  SELECT f.k, f.step + 1,
       |         CASE WHEN o.op = 'add' THEN
       |           CASE WHEN len(list_append(f.buf, o.v)) > $n
       |                THEN list_append(f.buf, o.v)[2:]
       |                ELSE list_append(f.buf, o.v) END
       |         ELSE list_filter(f.buf, x -> x != o.v) END
       |  FROM fold f JOIN ops o ON o.k = f.k AND o.step = f.step + 1
       |), final AS (
       |  SELECT f.k, f.buf FROM fold f
       |  JOIN nsteps ns ON ns.k = f.k AND f.step = ns.mx
       |)
       |SELECT cache, k, rn, v FROM (
       |  SELECT 'view-user-obj' AS cache, k,
       |         CAST(len(buf) - unnest(range(1, len(buf) + 1)) + 1
       |              AS BIGINT) AS rn,
       |         unnest(buf) AS v
       |  FROM final
       |) ORDER BY k, rn""".stripMargin

  val ssUndoCount: String =
    s"""WITH $tuplesCte, deltas AS (
       |  SELECT s, 'buy' AS a, o,
       |         CASE WHEN p = 'purchase' THEN 1 ELSE -1 END AS delta,
       |         t, seq
       |  FROM tuples WHERE p IN ('purchase', 'click')
       |), run AS (
       |  SELECT *, sum(delta) OVER (PARTITION BY s, o ORDER BY t, seq
       |                             ROWS BETWEEN UNBOUNDED PRECEDING
       |                             AND CURRENT ROW) AS running
       |  FROM deltas
       |)
       |SELECT s, a, o,
       |  CAST(sum(delta) - least(0, min(running)) AS BIGINT) AS cnt,
       |  max(CASE WHEN delta = 1 THEN t END) AS last_t
       |FROM run GROUP BY s, a, o
       |HAVING sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) >= 1
       |ORDER BY s, a, o""".stripMargin

  private val countsCte = s"$prefix, cs AS ($countStateSelect)"

  def ssQGetcount(s: Long, a: String, o: Long): String =
    s"""$countsCte
       |SELECT key.s, key.a, key.o, coalesce(cs.cnt, 0) AS cnt, cs.last_t
       |FROM (SELECT CAST($s AS BIGINT) AS s, '$a' AS a,
       |             CAST($o AS BIGINT) AS o) key
       |LEFT JOIN cs ON cs.s = key.s AND cs.a = key.a AND cs.o = key.o""".stripMargin

  val ssQActionsForSubj: String =
    s"$countsCte SELECT DISTINCT s, a FROM cs ORDER BY s, a"

  def ssQCountsForSubjAction(actions: Seq[String]): String =
    s"""$countsCte
       |SELECT s, o, CAST(sum(cnt) AS BIGINT) AS cnt, max(last_t) AS last_t
       |FROM cs WHERE a IN ${inList(actions)}
       |GROUP BY s, o ORDER BY s, o""".stripMargin

  def ssQSumcounts(actions: Seq[String]): String =
    s"""$countsCte
       |SELECT s, CAST(sum(cnt) AS BIGINT) AS total,
       |       CAST(sum(CASE WHEN a IN ${inList(actions)} THEN cnt ELSE 0 END)
       |            AS BIGINT) AS filtered_total
       |FROM cs GROUP BY s ORDER BY s""".stripMargin

  val ssQTuplesSorted: String =
    s"""$countsCte
       |SELECT s, a, o, cnt, last_t FROM cs
       |ORDER BY cnt DESC, last_t DESC, s, a, o""".stripMargin

  /** All six TupleComparators orderings, tagged + ranked. The (s, a, o)
    * tie-break runs in the variant's direction (the reference's
    * comparators pin no tie order), making each desc ordering the exact
    * reverse of its asc partner - the property the Spark side exploits
    * to serve both from one sort.
    */
  /** Independent literal copy of the engine's sort-variant inventory
    * (CountQueries.sortVariantPairs). Deliberately NOT the shared
    * constant: if oracle and engine expanded from one list, a wrong
    * entry would corrupt both sides identically and parity would stay
    * green. CountQueriesSpec asserts the two lists match, so drift is
    * caught loudly instead of silently absorbed.
    */
  val sortVariantList: Seq[(String, String, Seq[String])] = Seq(
    ("time_asc", "time_desc", Seq("last_t")),
    ("count_asc", "count_desc", Seq("cnt")),
    ("count_time_asc", "count_time_desc", Seq("cnt", "last_t")))

  val ssQSortVariants: String = {
    val variants = sortVariantList.flatMap {
      case (nameAsc, nameDesc, keys) =>
        val cols = keys ++ Seq("s", "a", "o")
        Seq(nameAsc -> cols.map(c => s"$c ASC").mkString(", "),
            nameDesc -> cols.map(c => s"$c DESC").mkString(", "))
    }
    val branches = variants.map { case (name, order) =>
      s"""  SELECT '$name' AS ordering,
         |    CAST(row_number() OVER (ORDER BY $order) AS BIGINT)
         |      AS rk,
         |    s, a, o, cnt, last_t
         |  FROM cs""".stripMargin
    }
    s"""$countsCte, v AS (
       |${branches.mkString("\n  UNION ALL\n")}
       |)
       |SELECT * FROM v ORDER BY ordering, rk""".stripMargin
  }

  def ssQTopkDense(k: Int): String =
    s"""$countsCte
       |SELECT s, a, o, cnt, last_t, rk FROM (
       |  SELECT s, a, o, cnt, last_t,
       |         CAST(dense_rank() OVER (PARTITION BY s ORDER BY cnt DESC)
       |              AS BIGINT) AS rk
       |  FROM cs
       |) WHERE rk <= $k ORDER BY s, rk, a, o""".stripMargin

  def ssQTopkPerSubj(k: Int): String =
    s"""$countsCte
       |SELECT s, a, o, cnt, last_t, rk FROM (
       |  SELECT s, a, o, cnt, last_t,
       |         row_number() OVER (PARTITION BY s
       |                            ORDER BY cnt DESC, last_t DESC, a, o)
       |           AS rk
       |  FROM cs
       |) WHERE rk <= $k ORDER BY s, rk""".stripMargin

  /** Tumbling 1-day windows are epoch-aligned in both engines. */
  val ssStreamWindowed: String =
    s"""WITH $tuplesCte
       |SELECT ${graft.pipeline.ParityMath.fdivDuckSql("t", "86400000000")} * 86400000000 AS window_start, p,
       |       count(*) AS cnt
       |FROM tuples GROUP BY 1, 2 ORDER BY window_start, p""".stripMargin

  /** Batch reconstruction of session_window: lag/gap sessions per
    * subject over the tuple stream (30-min gap, µs), end = max t + gap.
    */
  val ssStreamSessions: String =
    s"""WITH $tuplesCte, flags AS (
       |  SELECT s, t, seq,
       |    CASE WHEN t - lag(t) OVER w > 1800000000
       |           OR lag(t) OVER w IS NULL
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM tuples
       |  WINDOW w AS (PARTITION BY s ORDER BY t, seq)
       |), sess AS (
       |  SELECT s, t,
       |    CAST(sum(new_sess) OVER (PARTITION BY s ORDER BY t, seq
       |                             ROWS BETWEEN UNBOUNDED PRECEDING
       |                             AND CURRENT ROW) AS BIGINT) AS sid
       |  FROM flags
       |)
       |SELECT s AS user_id, min(t) AS start_t,
       |       max(t) + 1800000000 AS end_plus_gap,
       |       count(*) AS n_events
       |FROM sess GROUP BY s, sid
       |ORDER BY user_id, start_t""".stripMargin

  /** Batch form of the purchase→error interval join (µs interval). */
  val ssStreamJoin: String =
    s"""WITH $tuplesCte
       |SELECT x.s AS s, x.seq AS p_seq, y.seq AS e_seq
       |FROM tuples x JOIN tuples y
       |  ON x.s = y.s AND x.p = 'purchase' AND y.p = 'error'
       | AND y.t >= x.t AND y.t <= x.t + 3600000000
       |ORDER BY x.s, p_seq, e_seq""".stripMargin

  val ssStreamDedup: String =
    s"WITH $tuplesCte SELECT DISTINCT s, o FROM tuples ORDER BY s, o"

  val ssMetrics: String =
    s"""$prefix, m AS (
       |  SELECT 'events-received' AS metric, count(*) AS n FROM events
       |  UNION ALL
       |  SELECT 'tuples-extracted' AS metric, count(*) AS n FROM tuples
       |  UNION ALL
       |  SELECT 'tuples-transformed' AS metric, count(*) AS n FROM xf
       |  UNION ALL
       |  SELECT concat('recorded-', cache) AS metric, count(*) AS n
       |  FROM xf GROUP BY cache
       |) SELECT metric, n FROM m ORDER BY metric""".stripMargin

  val ssEncodeOutput: String =
    s"""$prefix
       |SELECT seq, cache,
       |       concat_ws('|', cache, k, coalesce(a, '-'), v, CAST(t AS VARCHAR))
       |         AS encoded
       |FROM xf ORDER BY seq, cache""".stripMargin

  /** Union of every cache's final state, normalized - the flagship
    * end-to-end pipeline result.
    */
  val ssPipelineE2e: String =
    s"""$prefix,
       |a_st AS ($assocStateSelect),
       |l_st AS ($lastnStateSelect),
       |c_st AS ($countStateSelect),
       |uni AS (
       |  SELECT cache, k, CAST(NULL AS VARCHAR) AS a, v, t,
       |         CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS rn
       |  FROM a_st
       |  UNION ALL
       |  SELECT cache, k, CAST(NULL AS VARCHAR) AS a, v, t,
       |         CAST(NULL AS BIGINT) AS cnt, rn
       |  FROM l_st
       |  UNION ALL
       |  SELECT cache, s AS k, a, o AS v, last_t AS t, cnt,
       |         CAST(NULL AS BIGINT) AS rn
       |  FROM c_st
       |  UNION ALL
       |  SELECT 'subject-counts' AS cache, k, CAST(NULL AS VARCHAR) AS a,
       |         CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS t,
       |         count(*) AS cnt, CAST(NULL AS BIGINT) AS rn
       |  FROM xf GROUP BY k
       |)
       |SELECT * FROM uni ORDER BY cache, k, a, rn, v""".stripMargin
}
