package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cache-state semantics ≙ caches_test.clj: last-write-wins, ring-buffer
  * eviction, count+latest-time, retraction.
  */
class CachesSpec extends SparkSpec {

  /** Transformed-tuple relation builder: (cache, k, a, v, t, seq). */
  private def xf(rows: (String, Long, String, Long, Long, Long)*): DataFrame = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("cache", "k", "a", "v", "t", "seq")
      .withColumn("a", when(col("a") === "-", lit(null)).otherwise(col("a")))
  }

  test("assoc cache: last write wins by (t, seq)") {
    val st = Caches.assocState(xf(
      ("signup-obj-user", 1L, "-", 100L, 10L, 0L),
      ("signup-obj-user", 1L, "-", 200L, 20L, 1L),
      ("signup-obj-user", 1L, "-", 300L, 20L, 2L), // same t, later seq wins
      ("signup-obj-user", 2L, "-", 400L, 5L, 3L)))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(st == Set((1L, 300L), (2L, 400L)))
  }

  test("lastn cache: keeps N most recent, evicts oldest") {
    val rows = (1 to 25).map(i =>
      ("view-user-obj", 1L, "-", 1000L + i, i.toLong, i.toLong))
    val st = Caches.lastnState(xf(rows: _*))
      .collect().map(r => (r.getLong(2), r.getLong(4)))
    assert(st.length == 20)
    // rn=1 is the newest (t=25); value 1001..1005 evicted
    assert(st.toMap.apply(1025L) == 1L)
    assert(!st.map(_._1).contains(1005L))
  }

  test("count cache: occurrence count + most recent time per [s a o]") {
    val st = Caches.countState(xf(
      ("interactions-user-obj", 1L, "buy", 7L, 10L, 0L),
      ("interactions-user-obj", 1L, "buy", 7L, 30L, 1L),
      ("interactions-user-obj", 1L, "buy", 7L, 20L, 2L),
      ("interactions-user-obj", 1L, "err", 7L, 5L, 3L)))
      .collect()
      .map(r => ((r.getLong(1), r.getString(2), r.getLong(3)),
        (r.getLong(4), r.getLong(5)))).toMap
    assert(st((1L, "buy", 7L)) == (3L, 30L))
    assert(st((1L, "err", 7L)) == (1L, 5L))
  }

  test("undo assoc: retraction nulls the key, last op wins") {
    val s = spark; import s.implicits._
    val tuples = Seq(
      // p, s, o, t, seq
      ("signup", 100L, 1L, 10L, 0L),
      ("error", 999L, 1L, 20L, 1L),   // retracts key 1 after signup
      ("signup", 101L, 2L, 30L, 2L),
      ("error", 999L, 2L, 25L, 3L),   // earlier than signup → signup wins
      ("error", 999L, 3L, 40L, 4L))   // retraction-only key → null row
      .toDF("p", "s", "o", "t", "seq")
    val st = Caches.undoAssocState(tuples).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(st == Map(1L -> None, 2L -> Some(101L), 3L -> None))
  }

  test("cache aggregation states shuffle exactly once") {
    val dfs = Map(
      "assoc" -> Caches.assocState(Transform.transformed(spark, sfDir)),
      "count" -> Caches.countState(Transform.transformed(spark, sfDir)))
    dfs.foreach { case (name, df) =>
      val exchanges = df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1, s"$name: expected exactly 1 shuffle")
    }
  }
}
