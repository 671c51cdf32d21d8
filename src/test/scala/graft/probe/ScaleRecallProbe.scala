package graft.probe

import graft.pipeline.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall floor for the DEFAULT ANN faces at scale-probe corpus sizes —
  * the companion measurement to the r13 auto-route (assign flat→h2 and
  * trainN grown with √n once k = ⌈√n⌉ crosses annTrainN): slopes alone
  * don't justify a default change; the routed faces must also keep
  * their recall. Truth is computed DISTRIBUTED (broadcast the bounded
  * query set over the corpus — never a driver loop over n):
  *
  *   - recall@10 of the default `ann_ivf` vs `ann_topk_brute`
  *     (= the gated ann_recall_eval math) over the numQueries set;
  *   - range recall of the default `ann_range` vs the brute
  *     threshold truth over the same query set;
  *   - sampled kNN-join recall@knnK: `ann_knn_join`'s rows for a
  *     deterministic 64-query sample vs the sample's brute truth.
  *
  *   sbt "Test/runMain graft.probe.ScaleRecallProbe [nVecs]"
  */
object ScaleRecallProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Graft.ensureConf(spark)
    // optional posture pins, to compare the auto-route against the
    // r12 defaults at the same corpus: [assign] [trainN] ("-" = unset)
    args.lift(1).filter(_ != "-")
      .foreach(spark.conf.set("graft.similarity.assign", _))
    args.lift(2).filter(_ != "-")
      .foreach(spark.conf.set("graft.similarity.trainN", _))

    val dir = java.nio.file.Files
      .createTempDirectory("graft_recall_probe").toString
    spark.read.format("graft-embeddings").option("rows", n.toString)
      .load().coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_gen")
    val part = new java.io.File(s"$dir/_gen").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val k = Similarity.cellsOf(spark, Similarity.vecCountFor(spark, dir))
    println(s"n=$n k=$k trainN=${Similarity.trainNFor(n)} " +
      s"h2=${Similarity.h2AssignOf(spark, k)}")

    // (a) the gated calibration face itself, on the routed defaults
    val rec = Similarity.annRecallEval(spark, dir)
      .agg(avg(col("recall"))).first().getDouble(0)
    println(f"ann_ivf recall@${Similarity.topK} (default route): $rec%.3f")

    // (b) range recall vs distributed brute truth over the query set
    val e = graft.core.Graft.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < Similarity.numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val bruteRange = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", graft.pipeline.ParityMath.q6(
        expr(Similarity.cosSpark("q_emb", "embedding"))))
      .filter(col("sim") >= Similarity.rangeSimThreshold)
      .select(col("q_id"), col("vec_id"))
    val truthN = bruteRange.count()
    val gotRange = Similarity.annRange(spark, dir)
      .select(col("q_id"), col("vec_id"))
    val hitN = gotRange.join(bruteRange, Seq("q_id", "vec_id")).count()
    println(f"ann_range recall (default route): " +
      f"${hitN.toDouble / math.max(truthN, 1)}%.3f " +
      s"(truth=$truthN got=${gotRange.count()})")

    // (c) sampled kNN-join recall@knnK: 64 deterministic query ids
    val sampleIds = (0L until 64L).map(_ * math.max(n / 64L, 1L))
    val qs = e.filter(col("vec_id").isin(sampleIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val bruteKnn = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", graft.pipeline.ParityMath.q6(
        expr(Similarity.cosSpark("q_emb", "embedding"))))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= Similarity.knnK)
      .select(col("q_id"), col("vec_id"))
    val gotKnn = Similarity.annKnnJoin(spark, dir)
      .filter(col("q_id").isin(sampleIds: _*))
      .select(col("q_id"), col("nbr_id").as("vec_id"))
    def cnt(df: DataFrame) = df.count()
    val tk = cnt(bruteKnn)
    val hk = cnt(gotKnn.join(bruteKnn, Seq("q_id", "vec_id")))
    println(f"ann_knn_join sampled recall@${Similarity.knnK} " +
      f"(default route): ${hk.toDouble / math.max(tk, 1)}%.3f " +
      s"(truth=$tk)")
    // (d) the p=3 point of the probe/recall dial, same sample
    val t2 = System.nanoTime()
    val gotMp = Similarity.annKnnJoinMp(spark, dir)
      .filter(col("q_id").isin(sampleIds: _*))
      .select(col("q_id"), col("nbr_id").as("vec_id"))
    val hm = cnt(gotMp.join(bruteKnn, Seq("q_id", "vec_id")))
    println(f"ann_knn_join_mp sampled recall@${Similarity.knnK} " +
      f"(p=3): ${hm.toDouble / math.max(tk, 1)}%.3f " +
      f"(${(System.nanoTime() - t2) / 1e9}%.1fs filtered run)")
    spark.stop()
  }
}
