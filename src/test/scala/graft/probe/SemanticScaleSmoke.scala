package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic-dedup scale smoke: runs the dd_semantic pipeline (trained
  * cells → within-cell cosine → dominance verdicts) against a generated
  * embedding corpus 1-2 orders of magnitude past sf0.1, with k SCALED
  * so cells stay ~constant-sized - the 100 TB posture the operator's
  * docstring claims (the quadratic term is per-cell-constant x corpus,
  * never corpus²). Verifies in closed form:
  *
  *   - every planted duplicate (exact vector copy of its seed) lands in
  *     its seed's cell and is dropped with dup_of = the seed;
  *   - no clean vector is dropped (random 64-dim vectors: the smoke's
  *     eps=0.8 puts a false positive ~6 sigma out);
  *   - the max cell size stays within a small factor of the mean (the
  *     blocking bound the plan relies on).
  *
  *   sbt "Test/runMain graft.probe.SemanticScaleSmoke [nVecs]"
  */
object SemanticScaleSmoke {

  val dims = 64
  val smokeEps = 0.8

  /** Deterministic pseudo-random unit-scale vectors as a pure-SQL
    * generator; every vec whose id % 50 == 7 copies id-1's vector -
    * planted exact duplicates at a fixed 2% rate.
    */
  def syntheticEmbeddings(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).toDF("vec_id")
      .withColumn("seed_id",
        when(pmod(col("vec_id"), lit(50)) === 7 && col("vec_id") > 0,
          col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dims - 1}), i -> CAST(
           |  (CAST(pmod(xxhash64(seed_id * 1000003 + i), 1000) AS DOUBLE)
           |   - 499.5) / 500.0 AS FLOAT))""".stripMargin))
      .select(col("vec_id"), col("embedding"))

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.ensureConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.NativeFunctions.register(spark)
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val k = math.max(16, (n / 500L).toInt) // cells of ~500: k grows with n
    val e = syntheticEmbeddings(spark, n).repartition(64).persist()
    val planted = e.count() / 50 // one dup per 50 ids (id % 50 == 7)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[semantic-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val cents = timed(s"train $k centroids (1 Lloyd round)")(
      graft.pipeline.Similarity.trainedCentroids(e, rounds = 1, k = k))
    val assign = graft.pipeline.Similarity.ivfAssignWith(e, cents).persist()

    val (maxCell, meanCell) = timed("cell balance") {
      val sizes = assign.groupBy(col("cid")).count()
        .agg(max(col("count")), avg(col("count"))).collect()(0)
      (sizes.getLong(0), sizes.getDouble(1))
    }
    System.err.println(
      f"[semantic-smoke] cells: $k, mean $meanCell%.0f, max $maxCell " +
        f"(${maxCell / meanCell}%.1fx mean)")

    val verdicts = timed("within-cell dominance verdicts") {
      val dups = assign.as("x").join(assign.as("y"),
          col("x.cid") === col("y.cid") &&
          col("x.vec_id") < col("y.vec_id"))
        .withColumn("sim", expr(graft.pipeline.Similarity
          .cosSpark("x.embedding", "y.embedding")))
        .filter(col("sim") >= smokeEps)
        .groupBy(col("y.vec_id").as("vec_id"))
        .agg(min(col("x.vec_id")).as("dup_of"))
      dups.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    // closed form: exactly the planted dups, each pointing at its seed
    val expected = (0L until n).filter(v => v % 50 == 7 && v > 0)
      .map(v => v -> (v - 1)).toMap
    val falsePos = verdicts.keySet -- expected.keySet
    val missed = expected.keySet -- verdicts.keySet
    val misattributed = expected.filter { case (v, s) =>
      verdicts.get(v).exists(_ != s)
    }
    System.err.println(
      s"[semantic-smoke] planted $planted, dropped ${verdicts.size}, " +
        s"false+ ${falsePos.size}, missed ${missed.size}, " +
        s"misattributed ${misattributed.size}")
    require(falsePos.isEmpty && missed.isEmpty && misattributed.isEmpty,
      s"closed-form check failed: false+=$falsePos missed=$missed")
    require(maxCell < meanCell * 3,
      s"cell blow-up: max $maxCell vs mean $meanCell")
    spark.stop()
  }
}
