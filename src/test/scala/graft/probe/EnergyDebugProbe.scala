package graft.probe

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object EnergyDebugProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Graft.ensureConf(spark)
    val pc = Similarity.energyProjCounts(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    pc.groupBy(col("dir")).agg(sum(col("c")).as("n"),
        min(col("p")).as("pmin"), max(col("p")).as("pmax"),
        count(lit(1)).as("rows"))
      .orderBy(col("dir")).collect().foreach(println)
    // dump the fact for python comparison
    pc.coalesce(1).write.mode("overwrite")
      .parquet("/tmp/energy_fact.parquet")
    spark.stop()
  }
}
