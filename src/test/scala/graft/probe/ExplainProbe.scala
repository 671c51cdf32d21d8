package graft.probe

import org.apache.spark.sql.SparkSession

/** Plan-audit scratch: print the executed plan of named gated queries.
  *
  *   sbt "Test/runMain graft.probe.ExplainProbe q_pagerank txt_entropy"
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      // post-execution: AQE-final plan, ReusedExchange visible
      println(df.queryExecution.executedPlan.treeString.take(8000))
    }
  }
}
