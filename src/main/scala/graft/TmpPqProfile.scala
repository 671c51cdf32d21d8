package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpPqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[pq] $name ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // warm
    graft.pipeline.Similarity.pqTrain(e)
    t("pqTrain-warm")(graft.pipeline.Similarity.pqTrain(e))
    t("pqTrain-warm2")(graft.pipeline.Similarity.pqTrain(e))
    spark.stop()
  }
}
