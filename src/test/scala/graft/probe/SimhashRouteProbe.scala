package graft.probe

import graft.pipeline.{Dedup, Multimodal, SignatureStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calibration probe for the simhash scheme router
  * (`Dedup.simhashFlipBudgetPerDoc`): measures, for the TEXT corpus
  * (dd_simhash) and the IMAGE corpus (mm_ahash_pairs) at the primary
  * bench SF and the generator-driven 10× anchor, (a) the router's
  * exact per-scheme candidate volumes and (b) the measured wall of
  * each static scheme — the four (corpus, scale) points the budget
  * must route to their wall-time winners. The budget is pinned where
  * every point's (v_chunk − v_flip)/n sits on the correct side.
  *
  *   sbt "Test/runMain graft.probe.SimhashRouteProbe [sfDir] [factor]"
  */
object SimhashRouteProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.ensureConf(spark)

    def wall(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def probePoint(tag: String, dir: String): Unit = {
      val textSims = SignatureStore.shingles(spark, dir)
        .select(col("doc_id"), expr("graft_simhash48(hst)").as("sim"))
        .localCheckpoint()
      val (tn, tvc, tvf) = Dedup.simhashRouteStatsFor(textSims)
      println(s"[$tag text] n=$tn v_chunk=$tvc v_flip=$tvf " +
        s"gap_per_doc=${(tvc - tvf) / math.max(tn, 1L)}")
      for (scheme <- Seq("chunk7", "flip1", "routed")) {
        spark.conf.set("graft.dedup.simhashScheme", scheme)
        // warm once (shared signature memo), time min of 2
        val w = (1 to 3).map(_ =>
          wall(Dedup.simhashPairs(spark, dir).count())).min
        println(f"[$tag text] $scheme wall=$w%.2fs")
      }
      spark.conf.unset("graft.dedup.simhashScheme")

      // image corpus: the ahash signature relation
      val imgSims = Multimodal.ahashSims(spark, dir).localCheckpoint()
      val (in_, ivc, ivf) = Dedup.simhashRouteStatsFor(imgSims)
      println(s"[$tag img]  n=$in_ v_chunk=$ivc v_flip=$ivf " +
        s"gap_per_doc=${(ivc - ivf) / math.max(in_, 1L)}")
      for (scheme <- Seq("chunk7", "flip1", "routed")) {
        spark.conf.set("graft.dedup.simhashScheme", scheme)
        val w = (1 to 3).map(_ =>
          wall(Multimodal.ahashPairs(spark, dir).count())).min
        println(f"[$tag img]  $scheme wall=$w%.2fs")
      }
      spark.conf.unset("graft.dedup.simhashScheme")
    }

    probePoint("sf", sfDir)

    // generator-driven 10x anchor corpus (the Bench sf3 recipe)
    val dir3 = java.nio.file.Files
      .createTempDirectory("graft_route_probe").toString
    val rowsD = spark.read.parquet(s"$sfDir/documents.parquet")
      .count() * factor
    spark.read.format("graft-docs").option("rows", rowsD.toString)
      .load().coalesce(1).write.mode("overwrite").parquet(s"$dir3/_gen")
    val part = new java.io.File(s"$dir3/_gen").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir3, "documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    probePoint(s"${factor}x", dir3)

    spark.stop()
  }
}
