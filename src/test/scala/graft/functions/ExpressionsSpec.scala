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

  test("LshMath signs == the literal sign matrix the oracle SQL embeds") {
    val fromExpr = LshMath.signs(Similarity.lshPlanes, Similarity.dims)
      .map(_.toSeq.map(_.toInt)).toSeq
    assert(fromExpr == Similarity.planeSigns)
  }

  test("graft_lsh_bucket == expanded 512-term SQL form, bitwise") {
    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
    val bad = e.select(
        expr(Similarity.bucketSpark("embedding")).as("native"),
        expr(Similarity.bucketSparkSqlForm("embedding"))
          .cast("bigint").as("sqlform"))
      .filter(col("native") =!= col("sqlform"))
    assert(bad.count() == 0)
  }

  test("graft_lsh_bucket rejects planes outside [1, 63]") {
    // 0 planes → constant bucket, >63 → shifted-out mask bits: both
    // silently wrong, so the builder must fail loudly at plan time
    for (bad <- Seq(0, 64, -3)) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_lsh_bucket(array(CAST(1.0 AS FLOAT)), $bad)")
          .collect()
      }
      assert(e.getMessage.contains("[1, 63]") ||
        Option(e.getCause).exists(_.getMessage.contains("[1, 63]")),
        s"planes=$bad must be rejected with a clear message, got: $e")
    }
  }

  test("lsh bucket expression participates in codegen (no fallback)") {
    val df = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(expr(Similarity.bucketSpark("embedding")).as("b"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_lsh_bucket"),
      s"no codegen in:\n$plan")
  }

  test("graft_nearest_centroid == crossJoin+window argmax") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centRows = e.filter(col("vec_id") < Similarity.ivfCentroids)
      .orderBy(col("vec_id")).collect()
    val centVecs = centRows.toSeq.map(_.getSeq[Float](1).toSeq.map(_.toDouble))
    val nearest = org.apache.spark.sql.GraftBridge.column(
      NearestCentroid(
        org.apache.spark.sql.GraftBridge.expression(col("embedding")),
        centVecs))
    val narrow = e.select(col("vec_id"), nearest.as("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = e.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid"))
    val wide = e.crossJoin(broadcast(cents))
      .withColumn("csim",
        expr(Similarity.cosSpark("embedding", "c_emb")))
      .withColumn("ark", row_number().over(w))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrow == wide)
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

  test("graft_bloom_contains: no false negatives, few false positives") {
    val s = spark; import s.implicits._
    val stored = (0L until 1000L).map(_ * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(stored.length.toLong, 0.001)
    stored.foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val bloomLit = lit(bos.toByteArray)
    val probe = (stored ++ (1L to 5000L).map(_ * 7919L + 1L)).toDF("h")
      .select(col("h"), call_function("graft_bloom_contains",
        bloomLit, col("h")).as("hit"),
        col("h").isin(stored: _*).as("stored"))
    // one-sided error: every stored key MUST hit...
    assert(probe.filter(col("stored") && !col("hit")).count() == 0)
    // ...and fpp 0.001 keeps spurious hits rare (50x slack for luck)
    assert(probe.filter(!col("stored") && col("hit")).count() <= 250)
  }

  test("bloom probe participates in codegen (no fallback)") {
    val s = spark; import s.implicits._
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(10L, 0.01)
    bloom.putLong(42L)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // spark.range, not a local Seq - ConvertToLocalRelation would fold
    // a local projection away and leave no physical plan to inspect
    val df = spark.range(42, 44).select(
      call_function("graft_bloom_contains",
        lit(bos.toByteArray), col("id")).as("hit"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_bloom_contains"),
      s"no codegen in:\n$plan")
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("graft_bloom_any == exists(graft_bloom_contains), and codegens") {
    val s = spark; import s.implicits._
    val stored = (0L until 500L).map(_ * 104729L)
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(stored.length.toLong, 0.001)
    stored.foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val bloomLit = lit(bos.toByteArray)
    // arrays mixing hits and misses; plain array() (not a transform
    // HOF) so the codegen assertion below tests bloom_any, not the
    // fixture's lambda
    val df = spark.range(0, 200).select(
      array(col("id") * 3 * lit(104729L),
        (col("id") * 3 + 1) * lit(104729L) + lit(1L),
        (col("id") * 3 + 2) * lit(104729L)).as("hs"))
    val bad = df.select(
      call_function("graft_bloom_any", bloomLit, col("hs")).as("batch"),
      exists(col("hs"),
        h => call_function("graft_bloom_contains", bloomLit, h)).as("hof"))
      .filter(col("batch") =!= col("hof"))
    assert(bad.count() == 0)
    val plan = df.select(call_function("graft_bloom_any", bloomLit,
      col("hs")).as("b")).queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_any"), s"missing from:\n$plan")
    assert(plan.contains("*(1) Project"), s"no codegen in:\n$plan")
  }

  test("graft_top_bigram == explode/groupBy/max(struct) formulation") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .filter(size(col("toks")) >= 2)
    val native = docs.select(col("doc_id"),
        expr("graft_top_bigram(toks)").as("m"))
      .select(col("doc_id"), col("m.bg"), col("m.c"))
    val relational = docs.select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> concat_ws(' ', toks[i], toks[i+1]))""".stripMargin))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("c"), col("bg"))).as("m"))
      .select(col("doc_id"), col("m.bg"), col("m.c"))
    assert(native.exceptAll(relational).count() == 0)
    assert(relational.exceptAll(native).count() == 0)
    // degenerate inputs: < 2 tokens -> null struct
    val s = spark; import s.implicits._
    val tiny = Seq(Seq("one"), Seq.empty[String]).toDF("toks")
      .select(expr("graft_top_bigram(toks)").as("m"))
    assert(tiny.filter(col("m").isNotNull).count() == 0)
  }

  test("graft_dup_ngrams == array_distinct/transform formulation") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
    val bad = docs.select(
        expr("graft_dup_ngrams(toks, 3)").as("native"),
        greatest(lit(0L), (size(col("toks")) - 2).cast("long") - expr(
          """size(array_distinct(transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))"""
            .stripMargin).cast("long")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
    // degenerate: fewer tokens than n -> 0, repeated text -> all dups
    val s = spark; import s.implicits._
    val edge = Seq(
      (Seq("a", "b"), 0L),            // shorter than n
      (Seq("a", "a", "a", "a"), 1L),  // "a a a" twice -> 1 repeat
      (Seq.empty[String], 0L)
    ).toDF("toks", "want")
    assert(edge.filter(expr("graft_dup_ngrams(toks, 3)") =!= col("want"))
      .count() == 0)
  }

  test("graft_gram_hashes == array_distinct/transform/md5 formulation") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
    // 3-gram (shingling) and 5-gram (decontamination) forms, both
    // against the HOF chain they replaced; distinct-on-strings order
    // must match first-occurrence order exactly
    for (n <- Seq(3, 5)) {
      val bad = docs.select(
          expr(s"graft_gram_hashes(toks, $n)").as("native"),
          expr(
            s"""CASE WHEN size(toks) >= $n THEN
               |  transform(array_distinct(transform(
               |    sequence(1, size(toks) - ${n - 1}),
               |    i -> concat_ws(' ', slice(toks, i, $n)))),
               |    s -> graft_md5_48(s))
               |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
            .as("hof"))
        .filter(not(col("native") === col("hof")))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
    val bad2 = docs.select(
        expr("graft_token_hashes(toks)").as("native"),
        expr("transform(toks, s -> graft_md5_48(s))").as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(bad2.count() == 0)
  }

  test("graft_gram_hashes_all == positional transform/md5 formulation") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
    val n = graft.pipeline.Dedup.spanN
    val bad = docs.select(
        expr(s"graft_gram_hashes_all(toks, $n)").as("native"),
        expr(
          s"""CASE WHEN size(toks) >= $n THEN
             |  transform(sequence(1, size(toks) - ${n - 1}),
             |    i -> graft_md5_48(concat_ws(' ', slice(toks, i, $n))))
             |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)
          .as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(bad.count() == 0)
    // positional form keeps repeats the distinct form drops
    val s = spark; import s.implicits._
    val rep = Seq(Seq("a", "b", "a", "b")).toDF("toks").select(
      size(expr("graft_gram_hashes_all(toks, 2)")).as("all_n"),
      size(expr("graft_gram_hashes(toks, 2)")).as("dis_n")).head()
    assert(rep.getInt(0) == 3 && rep.getInt(1) == 2)
  }

  test("graft_minhash_sigs == 32 array_min(transform) signatures") {
    import graft.pipeline.{Dedup, HashParity}
    val hs = Dedup.shinglesFrom(
        graft.core.Graft.table(spark, sfDir, "documents"))
      .filter(size(col("hs")) >= 1)
    val sigsCol = org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashSigs(
        org.apache.spark.sql.GraftBridge.expression(col("hs")),
        (0 until Dedup.minhashK).map(HashParity.permA).toArray,
        (0 until Dedup.minhashK).map(HashParity.permB).toArray,
        HashParity.P))
    val relational = (0 until Dedup.minhashK).map { i =>
      expr(s"array_min(transform(hs, h -> (${HashParity.permA(i)} * h " +
        s"+ ${HashParity.permB(i)}) % ${HashParity.P}L))")
    }
    val bad = hs.select(sigsCol.as("native"), array(relational: _*).as("rel"))
      .filter(not(col("native") === col("rel")))
    assert(bad.count() == 0)
    // empty input -> null (the band builder's exclusion contract)
    val s = spark; import s.implicits._
    val empty = Seq(Seq.empty[Long]).toDF("hs").select(
      org.apache.spark.sql.GraftBridge.column(
        graft.functions.MinHashSigs(
          org.apache.spark.sql.GraftBridge.expression(col("hs")),
          Array(1L), Array(0L), HashParity.P)).as("sigs"))
    assert(empty.filter(col("sigs").isNotNull).count() == 0)
  }

  test("graft_bloom_contains rejects a non-foldable filter argument") {
    val s = spark; import s.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array[Byte](1, 2), 1L)).toDF("b", "h")
        .select(call_function("graft_bloom_contains",
          col("b"), col("h")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"))
  }
}
