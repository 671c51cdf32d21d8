package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew posture under measurement (SURVEY §8): a deliberately hot key
  * holding half the fact rows, exercised through (a) AQE's skew-join
  * splitting on a sort-merge join and (b) the two-level salted
  * aggregation - both must produce exactly the un-skewed plan's
  * results, and (a) must show AQE actually splitting the skewed
  * partition.
  */
class SkewSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // 200k-row fact: key 0 holds 50% of rows, the rest spread over 1000
  private def skewedFact = spark.range(200000)
    .select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000 + 1)
        .as("k"),
      (col("id") % 97).as("v"))

  private def dim = spark.range(1001)
    .select(col("id").as("k"), concat(lit("g"), col("id") % 7).as("grp"))

  test("AQE splits the skewed partition of a sort-merge join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = skewedFact.join(dim, "k")
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
        s"expected a skew-split sort-merge join:\n$plan")
      // ground truth via broadcast (no skew sensitivity)
      val want = skewedFact.join(broadcast(dim), "k")
        .groupBy(col("grp")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  test("salted two-level aggregation == direct aggregation on a hot key") {
    val direct = skewedFact.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = skewedFact
      .withColumn("salt", col("v") % 16)
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
