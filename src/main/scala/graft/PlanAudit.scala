package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the headline queries so
  * scale posture (pushdown, broadcast, shuffle count) can be audited.
  * Usage: sbt "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join_agg", "q5_multijoin", "ss_cache_count",
        "dd_minhash_lsh", "ann_topk_brute")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
