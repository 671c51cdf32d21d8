package graft.functions

import graft.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Native expressions agree with the pure-functions formulations
  * bit-for-bit (the property the oracles rely on) and stay inside
  * whole-stage codegen.
  */
class ExpressionsSpec extends SparkSpec {

  test("graft_cosine == zip_with/aggregate formulation, bitwise") {
    val e = graft.core.Graft.table(spark, sfDir, "embeddings").limit(100)
    val r = e.as("x").crossJoin(e.as("y")).limit(500)
      .select(
        expr(Similarity.cosSpark("x.embedding", "y.embedding")).as("native"),
        expr(Similarity.cosSparkHof("x.embedding", "y.embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(r.count() == 0)
  }

  test("graft_hamming == bit_count(xor)") {
    val s = spark; import s.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (-1L, 0L), (123456789L, 987654321L),
      (Long.MaxValue, Long.MinValue)).toDF("a", "b")
    val bad = df.select(
      expr("graft_hamming(a, b)").as("h"),
      expr("CAST(bit_count(a ^ b) AS BIGINT)").as("ref"))
      .filter(col("h") =!= col("ref"))
    assert(bad.count() == 0)
  }

  test("graft_md5_48 == hex-nibble Horner over md5 hex (oracle form)") {
    val s = spark; import s.implicits._
    val df = Seq("", "a", "hello world", "the quick brown fox", "ü™∂")
      .toDF("s")
    val bad = df.select(
      expr("graft_md5_48(s)").as("native"),
      expr(graft.pipeline.HashParity.hex48Spark("md5(s)")).as("sqlform"))
      .filter(col("native") =!= col("sqlform"))
    assert(bad.count() == 0)
  }

  test("cosine expression participates in codegen (no fallback)") {
    val df = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(expr(Similarity.cosSpark("embedding", "embedding")).as("c"))
    df.collect() // finalize the adaptive plan
    // whole-stage-codegen'd operators print with a "*(stageId)" prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_cosine"),
      s"no codegen in:\n$plan")
  }
}
