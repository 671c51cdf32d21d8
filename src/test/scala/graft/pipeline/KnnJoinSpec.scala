package graft.pipeline

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ann_knn_join parity: the native argmax/arg-second cell assignment +
  * bucketed join must reproduce, bitwise, the declarative replay of
  * the SAME rule (crossJoin + window cell ranks — the formulation the
  * DuckDB oracle runs), and the join must behave sanely on a planted
  * boundary case.
  */
class KnnJoinSpec extends SparkSpec {

  test("ann_knn_join == declarative crossJoin+window replay (bitwise)") {
    val s = spark; import s.implicits._
    val e = Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainedCentroidsFor(spark, sfDir)
    val centsDf = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("cid", "c_emb")
    val wCell = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val ranks = e.crossJoin(broadcast(centsDf))
      .withColumn("csim", expr(Similarity.cosSparkHof("embedding", "c_emb")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= 2)
      .select(col("vec_id"), col("cid"), col("crk"))
    val probes = ranks.select(col("vec_id").as("q_id"), col("cid"))
    val index = ranks.filter(col("crk") === 1)
      .select(col("vec_id").as("nbr_id"), col("cid"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("nbr_id"))
    val replay = probes.join(index, "cid")
      .filter(col("nbr_id") =!= col("q_id"))
      .join(e.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb")), "q_id")
      .join(e.select(col("vec_id").as("nbr_id"),
        col("embedding").as("n_emb")), "nbr_id")
      .withColumn("sim",
        ParityMath.q6(expr(Similarity.cosSpark("q_emb", "n_emb"))))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= Similarity.knnK)
      .select(col("q_id"), col("nbr_id"), col("sim"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
      .collect().map(_.toString).toSeq
    val fast = Similarity.annKnnJoin(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(fast.nonEmpty && fast == replay)
  }


  test("ann_mmr: diversity displaces the near-duplicate of the top " +
       "pick; pure relevance order would rank it second") {
    val s = spark; import s.implicits._
    // v0 is the query itself (rel 1.0, always rank 1). v1 at 11.5deg,
    // v2 a NEAR-DUP of v1 (0.8deg apart, rel barely lower), v3 at
    // rel 0.965 but pointing into a fresh dimension. Brute order is
    // 0,1,2,3; MMR must pick 0,1,3,2 because v2's pairwise sim to v1
    // (~0.9999) costs it more than v3's lower relevance.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.98f, 0.19899749f, 0.0f)),
      (2L, Array(0.97709f, 0.212799f, 0.0f)),
      (3L, Array(0.965f, 0.0f, 0.2622499f)))
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.annMmr(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 3L), (4L, 2L)),
      s"mmr ranking wrong: $got")
    // and the scores are the documented integer combination
    val rows = Similarity.annMmr(spark, dir).collect()
    rows.foreach { r =>
      if (r.getLong(0) == 1L)
        assert(r.getLong(3) == 7L * r.getLong(2),
          "rank 1 has no diversity penalty")
      else assert(r.getLong(3) < 7L * r.getLong(2))
    }
  }


  test("ann_mmr_ivf: the index-pooled face picks the self-query first " +
       "(its home cell is always probed), emits k distinct docs, and " +
       "penalizes every later pick") {
    val rows = Similarity.annMmrIvf(spark, sfDir).collect()
    assert(rows.length == Similarity.mmrK)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 0L &&
      rows.head.getLong(3) == 7L * rows.head.getLong(2),
      "rank 1 must be the self-query at 7x its relevance")
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    rows.tail.foreach(r => assert(r.getLong(3) < 7L * r.getLong(2),
      "every non-first pick carries a positive diversity penalty"))
  }

  test("every vector gets neighbors; self is never a neighbor; ranks " +
       "are 1..k dense per vector") {
    val rows = Similarity.annKnnJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(g =>
      g.map(_._3).sorted.toSeq == (1L to g.size.toLong)))
    assert(rows.forall { case (q, n, _) => q != n })
    // with 500 vectors in 16 cells every cell has > k members, so
    // every vector must reach the full k
    assert(byQ.values.forall(_.size == Similarity.knnK))
  }

  test("ann_knn_join_h2: structure matches the flat face and neighbor " +
       "recall vs the exact top-k holds for both quantizers") {
    import org.apache.spark.sql.functions._
    val h2 = Similarity.annKnnJoinH2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byQ = h2.groupBy(_._1)
    assert(byQ.values.forall(g =>
      g.map(_._3).sorted.toSeq == (1L to g.size.toLong)))
    assert(h2.forall { case (q, n, _) => q != n })
    // exact truth: brute-force top-k per vector (500² at the fixture)
    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val truth = e.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      .crossJoin(e).filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", graft.pipeline.ParityMath.q6(
        expr(Similarity.cosSpark("q_emb", "embedding"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Similarity.knnK)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[(Long, Long, Long)]): Double =
      rows.count(r => truth.contains((r._1, r._2))).toDouble / truth.size
    val flat = Similarity.annKnnJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val (rH2, rFlat) = (recallOf(h2), recallOf(flat))
    println(f"[knn-h2] recall flat=$rFlat%.3f h2=$rH2%.3f")
    // measured at the fixture: flat 0.349, h2 0.285. Top-5-of-500 truth
    // through 2-of-23 probed cells on near-orthogonal vectors is a
    // LOW-recall regime for both quantizers (the fixture's cells barely
    // block, H2Probe); the floors pin the measured level so a real
    // regression (broken probe union, empty cells) still fails loudly
    assert(rFlat >= 0.30, f"flat knn recall $rFlat%.3f collapsed")
    assert(rH2 >= 0.25, f"h2 knn recall $rH2%.3f collapsed")
    assert(rH2 >= rFlat - 0.10,
      f"h2 recall $rH2%.3f fell too far below flat $rFlat%.3f")
  }
}
