package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transform-stage semantics, mirroring the reference's
  * transform_test.clj / system_test.clj vectors: multi-output rules,
  * subject/object rearrangement, unmatched-predicate drop, malformed
  * filtering.
  */
class TransformSpec extends SparkSpec {

  private def eventsDf = {
    val s = spark; import s.implicits._
    // (event_id, ts_ns, user_id, event_type, value, props)
    Seq(
      (0L, 1000000L, 10L, "signup", 1.0, """{"k": 7}"""),
      (1L, 2000000L, 11L, "purchase", 2.0, """{"k": 8}"""),
      (2L, 3000000L, 11L, "view", 3.0, """{"k": 7}"""),
      (3L, 4000000L, 12L, "click", 4.0, """{"k": 9}"""), // unmatched rule
      (4L, 5000000L, 12L, "error", 5.0, """{"k": 7}"""),
      (5L, 6000000L, 13L, "signup", 6.0, """not json"""), // malformed
      (6L, 7000000L, 14L, null, 7.0, """{"k": 1}""")      // malformed
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("extract destructures and drops malformed events") {
    val t = Transform(Transform.extractFrom(eventsDf))
    val tuples = Transform.extractFrom(eventsDf).collect()
    // 5 valid events: ids 0-4 (5 has bad props, 6 null predicate)
    assert(tuples.map(_.getLong(4)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // t is µs = ns / 1000
    assert(tuples.find(_.getLong(4) == 0L).get.getLong(3) == 1000L)
  }

  test("transform emits 0..n cache tuples per input, rearranged") {
    val xf = Transform(Transform.extractFrom(eventsDf))
      .select("cache", "k", "a", "v", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"), r.getLong(3), r.getLong(4)))
      .toSet
    val expected = Set(
      // signup u10 o7 → assoc (k=obj) + lastn (k=user)
      ("signup-obj-user", 7L, "-", 10L, 0L),
      ("signup-user-obj", 10L, "-", 7L, 0L),
      // purchase u11 o8 → 2 rearrangements + count
      ("buy-obj-user", 8L, "-", 11L, 1L),
      ("buy-user-obj", 11L, "-", 8L, 1L),
      ("interactions-user-obj", 11L, "buy", 8L, 1L),
      // view u11 o7 → lastn
      ("view-user-obj", 11L, "-", 7L, 2L),
      // click: no matching rule → dropped (system.clj:28)
      // error u12 o7 → count with action err
      ("interactions-user-obj", 12L, "err", 7L, 4L))
    assert(xf == expected)
  }

  test("config file text parses to the default rules") {
    assert(Transform.parseRules(Transform.defaultConfigText) == Config.rules)
  }

  test("constant guards and literal output atoms (full pattern surface)") {
    // ≙ a core.match arm pinning a tuple position to a constant and
    // emitting a constant atom: [\"view\" s 7 t] -> [cache s 1 t].
    // props {\"k\": 7} extracts to o=7, so only event 2 (view, o=7)
    // matches the guarded rule; the sibling unguarded rule still sees
    // every view.
    val rules = Transform.parseRules(
      """view(o=7) -> featured-viewers(s,1)
        |view -> view-user-obj(s,o)
        |purchase(s=999) -> never(s,o)
        |""".stripMargin)
    assert(rules.head == Rule("view",
      Seq(Out("featured-viewers", "s", "1")), sEq = None, oEq = Some(7L)))
    val xf = Transform(Transform.extractFrom(eventsDf), rules)
      .select("cache", "k", "v", "seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(xf == Set(
      ("featured-viewers", 11L, 1L, 2L), // guarded match, literal v
      ("view-user-obj", 11L, 7L, 2L)))   // unguarded sibling
    // guard that matches nothing emits nothing (no null structs leak)
    assert(!xf.exists(_._1 == "never"))
  }

  test("parseRules rejects malformed config lines") {
    intercept[IllegalArgumentException] {
      Transform.parseRules("purchase -> just some garbage")
    }
    intercept[Exception] {
      Transform.parseRules("no arrow here")
    }
  }

  test("transform is a narrow plan (no shuffle)") {
    val plan = Transform(Transform.extractFrom(eventsDf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
