package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions injects the native functions at session build time
  * (spark.sql.extensions), the cluster-deployment path.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("functions resolve in a session built with GraftExtensions") {
    // force a NEW session so builder-time extensions apply even when
    // other suites already created one in this JVM
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // withExtensions ≙ spark.sql.extensions=graft.functions.GraftExtensions
    // (the config form needs a fresh SparkContext; other suites may have
    // created one already in this JVM, so exercise the builder hook)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT graft_md5_48('abc') AS h, graft_hamming(5L, 6L) AS d")
        .collect().head
      // first 12 hex chars of md5('abc') = '900150983cd2'
      assert(r.getLong(0) == java.lang.Long.parseLong("900150983cd2", 16))
      assert(r.getLong(1) == 2L) // 101 xor 110 = 011
      // the injected optimizer rule substitutes the top-k operator with
      // NO runtime install call - the pure extensions path
      val topk = spark.sql(
        """SELECT * FROM (
          |  SELECT id % 5 AS k, id AS v,
          |    row_number() OVER (PARTITION BY id % 5 ORDER BY id DESC) AS rk
          |  FROM range(1000)
          |) WHERE rk <= 2""".stripMargin)
      topk.collect()
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"),
        s"extensions-injected rewrite did not fire:\n$plan")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
