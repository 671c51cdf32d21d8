package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-cache query API against the reference's own test fixture
  * (query_api_test.clj `simple-db`):
  *
  *   {:s0 {:a0 {:o0 [1 1000], :o1 [5 1001]}, :a1 {:o1 [2 1005]}},
  *    :s1 {:a0 {:o1 [1 1002], :o3 [10 1010], :o5 [7 1008]}}}
  *
  * with s0→0, s1→1, a0→"a0", a1→"a1", o0→0 … flattened to the
  * relational count-state (s, a, o, cnt, last_t).
  */
class CountQueriesSpec extends SparkSpec {

  private def simpleDb: DataFrame = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "a0", 0L, 1L, 1000L),
      (0L, "a0", 1L, 5L, 1001L),
      (0L, "a1", 1L, 2L, 1005L),
      (1L, "a0", 1L, 1L, 1002L),
      (1L, "a0", 3L, 10L, 1010L),
      (1L, "a0", 5L, 7L, 1008L))
      .toDF("s", "a", "o", "cnt", "last_t")
  }

  test("getCount: present key") {
    val r = CountQueries.getCountFrom(simpleDb, 0L, "a0", 1L).collect().head
    assert(r.getLong(3) == 5L && r.getLong(4) == 1001L)
  }

  test("getCount: absent key → [o 0 null] like the reference") {
    val r = CountQueries.getCountFrom(simpleDb, 0L, "a0", 99L).collect().head
    assert(r.getLong(3) == 0L && r.isNullAt(4))
  }

  test("actionsForSubj") {
    val r = CountQueries.actionsForSubjFrom(simpleDb).collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(r == Set((0L, "a0"), (0L, "a1"), (1L, "a0")))
  }

  test("countsForSubjAction merges across actions (merge-leaves)") {
    // reference: for s0 across [a0 a1], o1 merges to [7 1005]
    val r = CountQueries.countsForSubjActionFrom(simpleDb, Seq("a0", "a1"))
      .collect()
      .map(x => ((x.getLong(0), x.getLong(1)), (x.getLong(2), x.getLong(3))))
      .toMap
    assert(r((0L, 1L)) == (7L, 1005L))
    assert(r((0L, 0L)) == (1L, 1000L))
    assert(r((1L, 3L)) == (10L, 1010L))
  }

  test("sumCounts: total and action-filtered") {
    val r = CountQueries.sumCountsFrom(simpleDb, Seq("a1")).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == (8L, 2L))  // reference: (sumCounts :s0) => 8
    assert(r(1L) == (18L, 0L)) // reference: (sumCounts :s1) => 18
  }

  test("tuplesForSubjAction sorted by countTimeComparator descending") {
    val r = CountQueries.tuplesSortedFrom(simpleDb).collect()
      .map(x => (x.getLong(2), x.getLong(3)))
    // count desc, then time desc: o3[10] > o5[7] > o1[5] > o1[2,1005] >
    // o0[1,1000] vs o1[1,1002] → 1002 first
    assert(r.map(_._2).toSeq == Seq(10L, 7L, 5L, 2L, 1L, 1L))
    assert(r(4)._1 == 1L && r(5)._1 == 0L)
  }

  test("sortedVariants: range-partitioned rank == single global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val state = Caches.countState(
      Transform.transformed(spark, sfDir)).drop("cache")
    val got = CountQueries.sortedVariantsFrom(state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    val want = CountQueries.sortVariants.map { case (name, order) =>
      // sortVariants carries the direction-matched (s, a, o) tie-break
      val w = Window.orderBy(order: _*)
      state.select(lit(name).as("ordering"),
        row_number().over(w).cast(LongType).as("rk"),
        col("s"), col("a"), col("o"), col("cnt"), col("last_t"))
    }.reduce(_ unionAll _).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    assert(got == want)
  }

  test("sortedVariants: no single-partition window in the plan") {
    val state = Caches.countState(
      Transform.transformed(spark, sfDir)).drop("cache")
    val df = CountQueries.sortedVariantsFrom(state)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global-window funnel regressed:\n$plan")
    assert(!plan.contains("Window"),
      s"expected zipWithIndex ranking, not a window:\n$plan")
  }

  test("sort-variant inventory: engine and oracle lists match") {
    // the oracle keeps an independent literal copy (a shared constant
    // would corrupt both sides identically); this is the drift alarm
    assert(graft.oracle.Sql.sortVariantList == CountQueries.sortVariantPairs)
  }

  test("topK per subject") {
    val r = CountQueries.topKPerSubjFrom(simpleDb, 2).collect()
      .map(x => (x.getLong(0), x.getLong(5), x.getLong(2)))
    assert(r.toSet == Set(
      (0L, 1L, 1L), (0L, 2L, 1L),  // s0: o1(cnt5), then o1(cnt2,a1)
      (1L, 1L, 3L), (1L, 2L, 5L))) // s1: o3(cnt10), o5(cnt7)
  }
}
