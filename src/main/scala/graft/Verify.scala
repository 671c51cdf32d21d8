package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg (local iteration only; the driver passes 2):
    // comma-separated query names to dump instead of all of them
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // cross-engine rounding-headroom diagnostic for the one accepted
    // libm risk (QualityClassifier.gdTrain): how close any sigmoid
    // evaluation came to a floor(v+0.5) boundary this run - a margin
    // >> 2e-10 means a 1-ulp exp() disagreement cannot flip a weight
    if (only.forall(_.contains("pipe_qclf_train"))) {
      try System.err.println(f"[verify] qclf sigmoid boundary margin = " +
        f"${graft.pipeline.QualityClassifier.boundaryMargin(spark, sfDir)}%.3e")
      catch { case e: Throwable =>
        System.err.println(s"[verify] qclf margin diagnostic failed: $e")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.core.Transform.releaseAll(spark)
    graft.core.CountQueries.releaseAll(spark)
    graft.pipeline.SignatureStore.releaseAll(spark)
    graft.pipeline.Similarity.releaseAll(spark)
    graft.pipeline.QualityClassifier.releaseAll(spark)
    graft.analytics.Graph.releaseAll(spark)
    spark.stop()
  }
}
