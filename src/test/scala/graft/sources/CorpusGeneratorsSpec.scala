package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The corpus DSv2 generators (`graft-docs` / `graft-embeddings`):
  * deterministic, partition-parallel, schema-identical to the driver
  * fixture tables, and statistically shaped so dedup/ANN/text bench
  * slopes at the generated anchor reflect real workload density
  * (planted near-duplicates, unit-norm vectors, fixture vocab).
  */
class CorpusGeneratorsSpec extends SparkSpec {

  private def docs(rows: Long, parts: Int = 8) =
    spark.read.format("graft-docs")
      .option("rows", rows.toString)
      .option("numPartitions", parts.toString).load()

  private def embs(rows: Long, parts: Int = 8) =
    spark.read.format("graft-embeddings")
      .option("rows", rows.toString)
      .option("numPartitions", parts.toString).load()

  test("graft-docs: deterministic, fixture schema, planted near-dups") {
    val fixture = graft.core.Graft.table(spark, sfDir, "documents")
    val df = docs(2000, parts = 5)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      fixture.schema.map(f => (f.name, f.dataType)),
      s"schema drift: ${df.schema} vs ${fixture.schema}")
    assert(df.count() == 2000L && df.rdd.getNumPartitions == 5)
    val a = df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == docs(2000, parts = 2).orderBy("doc_id").collect()
      .map(_.toSeq).toSeq, "partition-layout independence")
    // n_chars is the text length; vocab words only; langs all present
    val bad = df.filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == 0)
    assert(df.select("lang").distinct().count() == 5)
    // planted near-dups: doc i (i % 23 == 7) mutates ~10% of doc i-7,
    // so the pair's word-shingle Jaccard is high by construction
    val dup = DocumentsGenerator.textOf(30).split(' ')
    val base = DocumentsGenerator.textOf(23).split(' ')
    assert(dup.length == base.length)
    val same = dup.zip(base).count { case (x, y) => x == y }
    assert(same.toDouble / base.length > 0.8,
      s"near-dup kept only $same/${base.length} words")
    // and the dedup operator actually FINDS candidates on generated
    // docs (the density the anchor bench depends on)
    val tmp = java.nio.file.Files.createTempDirectory("graft_gd").toString
    docs(2000).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/_g")
    val part = new java.io.File(s"$tmp/_g").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(tmp, "documents.parquet"))
    val cand = graft.pipeline.Dedup.minhashLsh(spark, tmp).count()
    assert(cand > 50, s"expected LSH candidates on generated docs: $cand")
  }

  test("graft-embeddings: deterministic, fixture schema, unit norms") {
    val fixture = graft.core.Graft.table(spark, sfDir, "embeddings")
    val df = embs(1000, parts = 4)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      fixture.schema.map(f => (f.name, f.dataType.simpleString)),
      s"schema drift: ${df.schema} vs ${fixture.schema}")
    assert(df.count() == 1000L && df.rdd.getNumPartitions == 4)
    assert(df.orderBy("vec_id").limit(50).collect().map(_.toSeq).toSeq ==
      embs(1000, parts = 7).orderBy("vec_id").limit(50).collect()
        .map(_.toSeq).toSeq)
    // unit-norm within float tolerance; all 10 labels present
    val norms = df.select(expr(
      "abs(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) - 1.0)").as("d"))
      .agg(max(col("d"))).collect().head.getDouble(0)
    assert(norms < 1e-5, s"vectors must be unit-norm, worst |n2-1|=$norms")
    assert(df.select("label").distinct().count() == 10)
  }
}
