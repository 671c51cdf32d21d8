package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing - the pre-shuffle technique that
  * turns the repeated fact⋈fact join at 100 TB into a zero-Exchange
  * merge: both sides bucketed on the join key at write time, so the
  * join needs no runtime shuffle at any scale.
  */
class BucketingSpec extends SparkSpec {

  test("HLL approx distinct tracks exact distinct within 5%") {
    import org.apache.spark.sql.functions._
    val r = graft.core.Graft.table(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("bucketed fact-fact join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.core.Graft.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = graft.core.Graft.table(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")
      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
