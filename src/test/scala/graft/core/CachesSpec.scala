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

  test("undo count: floor-at-each-step matches a sequential reference walk") {
    val s = spark; import s.implicits._
    // interleavings where clamped-walk ≠ clamped net sum:
    // key 1: +1,-1,-1,+1 → ref walk 1,0,0,1 (net-clamp would give 0)
    // key 2: -1,+1       → ref walk 0,1
    // key 3: -1,-1       → no inc ever → key absent
    // key 4: +1,+1,-1,-1,-1,+1 → 1,2,1,0,0,1
    val ev = Seq(
      ("purchase", 1L, 1L, 10L, 0L), ("click", 1L, 1L, 20L, 1L),
      ("click", 1L, 1L, 30L, 2L), ("purchase", 1L, 1L, 40L, 3L),
      ("click", 2L, 2L, 10L, 4L), ("purchase", 2L, 2L, 20L, 5L),
      ("click", 3L, 3L, 10L, 6L), ("click", 3L, 3L, 20L, 7L),
      ("purchase", 4L, 4L, 10L, 8L), ("purchase", 4L, 4L, 20L, 9L),
      ("click", 4L, 4L, 30L, 10L), ("click", 4L, 4L, 40L, 11L),
      ("click", 4L, 4L, 50L, 12L), ("purchase", 4L, 4L, 60L, 13L))
      .toDF("p", "s", "o", "t", "seq")
    val st = Caches.undoCountState(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(st(1L) == (1L, 40L))
    assert(st(2L) == (1L, 20L))
    assert(!st.contains(3L))
    assert(st(4L) == (1L, 60L))
  }

  test("undoLastnState: exact ring-buffer semantics (caches.clj:69-73)") {
    val s = spark; import s.implicits._
    val ev = Seq(
      // key 1: add 1,2,3 with n=2 → [2,3]; retract 3 → [2]
      ("view", 1L, 1L, 10L, 1L), ("view", 1L, 2L, 20L, 2L),
      ("view", 1L, 3L, 30L, 3L), ("click", 1L, 3L, 40L, 4L),
      // key 2: add 5, retract 5, re-add 5 → [5] (post-retraction append survives)
      ("view", 2L, 5L, 10L, 5L), ("click", 2L, 5L, 20L, 6L),
      ("view", 2L, 5L, 30L, 7L),
      // key 3: retract on an empty buffer is a no-op → absent
      ("click", 3L, 9L, 10L, 8L),
      // key 4: add 7,8,9 (7 evicted at n=2), retract 8 and 9 → EMPTY.
      // A "survivors" closed form would wrongly resurrect 7 - this row
      // pins the sequential eviction semantics.
      ("view", 4L, 7L, 10L, 9L), ("view", 4L, 8L, 20L, 10L),
      ("view", 4L, 9L, 30L, 11L), ("click", 4L, 8L, 40L, 12L),
      ("click", 4L, 9L, 50L, 13L),
      // key 5: retract removes ALL occurrences of the value
      ("view", 5L, 6L, 10L, 14L), ("view", 5L, 6L, 20L, 15L),
      ("click", 5L, 6L, 30L, 16L))
      .toDF("p", "s", "o", "t", "seq")
    val st = Caches.undoLastnState(ev, n = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(st.filter(_._1 == 1L).toSet == Set((1L, 1L, 2L)))
    assert(st.filter(_._1 == 2L).toSet == Set((2L, 1L, 5L)))
    assert(!st.exists(_._1 == 3L))
    assert(!st.exists(_._1 == 4L), "evicted value must not resurrect")
    assert(!st.exists(_._1 == 5L), "retraction removes all occurrences")
  }

  test("undoLastnState == sequential ring-buffer simulation (randomized)") {
    val s = spark; import s.implicits._
    val n = 3
    Seq(11, 42, 99).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // random add/retract stream over few keys/values, with t ties so
      // the (t, seq) order discipline is exercised
      val events = (1 to 300).map { i =>
        val p = if (rnd.nextInt(3) == 0) "click" else "view"
        (p, rnd.nextInt(4).toLong, rnd.nextInt(6).toLong,
          rnd.nextInt(20).toLong, i.toLong)
      }
      // independent sequential simulator of the reference semantics:
      // conj with capacity-n eviction; retraction filters all matches
      val expected = events.sortBy(e => (e._4, e._5))
        .foldLeft(Map.empty[Long, Vector[Long]]) { case (m, (p, k, v, _, _)) =>
          val buf = m.getOrElse(k, Vector.empty)
          p match {
            case "view" => m.updated(k, (buf :+ v).takeRight(n))
            case _ => m.updated(k, buf.filterNot(_ == v))
          }
        }
        .flatMap { case (k, buf) =>
          buf.zipWithIndex.map { case (v, pos) =>
            (k, (buf.size - pos).toLong, v)
          }
        }.toSet
      val got = Caches.undoLastnState(
          events.toDF("p", "s", "o", "t", "seq"), n)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("count/keycount states merge as monoids (partitioned == full)") {
    // the property that makes partitioned/incremental computation
    // valid: compute state over disjoint event halves, merge with
    // (sum cnt, max last_t), get exactly the full-corpus state
    val xf = Transform.transformed(spark, sfDir)
    val a = xf.filter(col("seq") % 2 === 0)
    val b = xf.filter(col("seq") % 2 === 1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))
    val mergedCount = Caches.countState(a).unionAll(Caches.countState(b))
      .groupBy(col("cache"), col("s"), col("a"), col("o"))
      .agg(sum(col("cnt")).as("cnt"), max(col("last_t")).as("last_t"))
      .collect().map(r => key(r) -> (r.getLong(4), r.getLong(5))).toMap
    val full = Caches.countState(xf)
      .collect().map(r => key(r) -> (r.getLong(4), r.getLong(5))).toMap
    assert(mergedCount == full)
    val mergedKc = Caches.keycountState(a).unionAll(Caches.keycountState(b))
      .groupBy(col("cache"), col("k")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val fullKc = Caches.keycountState(xf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(mergedKc == fullKc)
  }

  test("cache aggregation states shuffle exactly once") {
    val dfs = Map(
      "assoc" -> Caches.assocState(Transform.transformed(spark, sfDir)),
      "count" -> Caches.countState(Transform.transformed(spark, sfDir)))
    dfs.foreach { case (name, df) =>
      // exactly one KEYED shuffle; the round-robin spread of the
      // single-row-group input (tableParallel) is not a keyed exchange
      val exchanges = df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"$name: expected exactly 1 keyed shuffle")
    }
  }
}
