package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule transparently swaps the row_number+filter idiom
  * for the bounded-heap operator - same rows, no Window sort in the
  * physical plan - and leaves non-matching windows alone.
  */
class TopKWindowRewriteSpec extends SparkSpec {

  private def uninstall(): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_.isInstanceOf[TopKWindowRewrite])
  }

  test("row_number+filter rewrites to TopKPerKeyExec, results identical") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(2000)((rnd.nextInt(30).toLong,
      rnd.nextInt(1000).toLong, rnd.nextLong())).toDF("k", "score", "uid")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("score").desc, col("uid"))
    def q = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
    // ensureConf installs the rule engine-wide; drop it to capture the
    // pure-window baseline, then restore
    uninstall()
    val baseline = q.collect().map(_.toSeq).toSet
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
    TopKWindowRewrite.install(spark)
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window sort survived:\n$plan")
      assert(rewritten.collect().map(_.toSeq).toSet == baseline)

      // strict < bound is absorbed too (k-1)
      val lt = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") < 3)
      assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(lt.collect().map(_.toSeq).toSet ==
        baseline.filter(_.last.asInstanceOf[Int] < 3))

      // a global (unpartitioned) window is NOT rewritten
      val g = df.withColumn("rk",
          row_number().over(Window.orderBy(col("score"), col("uid"))))
        .filter(col("rk") <= 5)
      assert(g.queryExecution.executedPlan.toString.contains("Window"))

    } finally TopKWindowRewrite.install(spark) // engine-wide default
  }

  test("dense_rank()+filter rewrites distinct-value-bounded, identical") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    // scores drawn from 8 values per 20-key domain → every kept dense
    // rank carries a whole tie GROUP, so per-key output far exceeds k
    val df = Seq.fill(3000)((rnd.nextInt(20).toLong,
      rnd.nextInt(8).toLong, rnd.nextLong())).toDF("k", "score", "uid")
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc)
    def q = df.withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 3)
    uninstall()
    val baseline = q.collect().map(_.toSeq).toSet
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
    TopKWindowRewrite.install(spark)
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"dense rule did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window sort survived:\n$plan")
      val got = rewritten.collect()
      assert(got.map(_.toSeq).toSet == baseline)
      // the discriminator: exactly the top 3 DISTINCT score values per
      // key survive, with all their ties (rows per key >> 3)
      val perKey = got.groupBy(_.getLong(0))
      assert(perKey.values.exists(_.length > 3),
        "fixture must keep whole tie groups, not 3 rows")
      perKey.foreach { case (_, rs) =>
        assert(rs.map(_.getLong(1)).distinct.length <= 3,
          "no more than k distinct order values may survive")
        assert(rs.map(_.getInt(3)).max <= 3)
      }
    } finally TopKWindowRewrite.install(spark)
  }

  test("rank()+filter rewrites tie-retaining, results identical") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    // scores drawn from 6 values per 25-key domain → boundary tie
    // groups are common, so rank <= 3 regularly keeps > 3 rows per key
    val df = Seq.fill(3000)((rnd.nextInt(25).toLong,
      rnd.nextInt(6).toLong, rnd.nextLong())).toDF("k", "score", "uid")
    val w = Window.partitionBy(col("k")).orderBy(col("score").desc)
    def q = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    uninstall()
    val baseline = q.collect().map(_.toSeq).toSet
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
    TopKWindowRewrite.install(spark)
    try {
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"rank rule did not fire:\n$plan")
      assert(!plan.contains("Window"), s"window sort survived:\n$plan")
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got == baseline)
      // the discriminator: ties at the boundary are retained, so some
      // key holds MORE than 3 rows (row_number semantics would cap at 3)
      val perKey = rewritten.collect().groupBy(_.getLong(0))
        .values.map(_.length)
      assert(perKey.exists(_ > 3),
        "fixture must exercise boundary ties (rank keeps the tie group)")
      // and competition ranks skip after a tie group
      val someKey = rewritten.collect().groupBy(_.getLong(0)).values
        .find(rs => rs.map(_.getInt(3)).distinct.length <
          rs.length)
      assert(someKey.isDefined, "expect at least one shared rank")
    } finally TopKWindowRewrite.install(spark)
  }
}
