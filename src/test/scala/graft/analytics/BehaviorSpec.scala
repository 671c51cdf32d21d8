package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ordered-funnel semantics on planted users: the ORDER constraint is
  * the whole point — doing a later step before the earlier one must
  * not convert.
  */
class BehaviorSpec extends SparkSpec {

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
}
