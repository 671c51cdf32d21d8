package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-family scale smoke: runs the dedup/decontamination/repetition
  * operators against a generated corpus 1-2 orders of magnitude past
  * sf0.1 (unique random-word documents + planted exact duplicates), and
  * prints per-stage throughput. The point is plan-shape evidence at
  * scale: candidate pairs stay ~linear (planted dups only, no
  * bucket blow-up on unique docs), the bloom prune touches every doc
  * exactly once, and nothing collects an unbounded relation to the
  * driver.
  *
  *   sbt "Test/runMain graft.probe.CorpusScaleSmoke [nDocs]"
  */
object CorpusScaleSmoke {

  /** Deterministic random-word corpus, ~60-token docs from a 60-word
    * vocabulary, as a pure-SQL generator (no driver-side data). Every
    * doc whose id % 50 == 7 repeats the text of id-1 - planted exact
    * duplicates at a fixed 2% rate; all other docs are unique with
    * overwhelming probability (60^60 texts).
    */
  def syntheticDocs(spark: SparkSession, nDocs: Long): DataFrame = {
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort",
      "window", "the", "a", "column", "join", "small", "big", "query",
      "data", "group", "vector", "stream", "order", "filter", "customer",
      "engine", "plan", "stage", "task", "shuffle", "codec", "page",
      "block", "index", "store", "cache", "disk", "read", "write",
      "byte", "field", "schema", "null", "state", "event", "time",
      "count", "label", "token", "gram", "probe", "bloom", "band",
      "bucket", "score").map(w => s"'$w'").mkString(", ")
    spark.range(nDocs).toDF("doc_id")
      .withColumn("seed_id",
        when(pmod(col("doc_id"), lit(50)) === 7 && col("doc_id") > 0,
          col("doc_id") - 1).otherwise(col("doc_id")))
      // word + per-position numeric suffix: ~5800 distinct tokens, so
      // unrelated docs share almost no CHAR shingles (with the bare
      // 60-word vocab every doc was a char-5-gram near-dup of every
      // other and LSH - correctly - flagged 2.7M pairs)
      .withColumn("text", expr(
        s"""concat_ws(' ', transform(sequence(0, 59),
           |  i -> concat(element_at(array($vocab),
           |    CAST(pmod(xxhash64(seed_id * 1000003 + i), 60) + 1 AS INT)),
           |    pmod(xxhash64(seed_id * 999983 + i), 97))))"""
          .stripMargin))
      .select(col("doc_id"), col("text"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.ensureConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val docs = syntheticDocs(spark, nDocs)
      .repartition(64).persist()
    val planted = docs.count() // materialize generation outside timers

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[corpus-smoke] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // exact dedup: one keyed shuffle on the content hash
    val exactGroups = timed("exact dedup")(
      docs.groupBy(expr("graft_md5_48(text)").as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
        .filter(col("n") > 1).count())

    // tokenization alone, to attribute the narrow-pass cost
    val tokDocs = timed("tokenize only (regexp)")(
      docs.select(expr("size(regexp_extract_all(text, '\\\\S+', 0))")
        .as("n")).filter(col("n") >= 0).count())
    require(tokDocs == planted)

    // repetition signals: narrow in-row pass via the codegen'd
    // expressions (vs the interpreted HOF formulation)
    val repDocs = timed("repetition narrow pass (native)")(
      docs.withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .filter(size(col("toks")) >= 3)
        .select(expr("graft_dup_ngrams(toks, 3)").as("dup_tri"),
          expr("graft_top_bigram(toks)").as("m"))
        .filter(col("dup_tri") >= 0 && col("m").isNotNull).count())
    val repDocsHof = timed("repetition narrow pass (HOF)")(
      docs.withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .filter(size(col("toks")) >= 3)
        .select((size(col("toks")) - 2 - expr(
          """size(array_distinct(transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))"""
            .stripMargin)).as("dup_tri"))
        .filter(col("dup_tri") >= 0).count())
    require(repDocs == repDocsHof)

    // bloom decontamination prune: bench = first 50 docs' 5-grams
    val bloomPruned = timed("bloom decont prune") {
      val grams = docs
        .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), expr(
          """array_distinct(transform(sequence(1, size(toks) - 4),
            |  i -> graft_md5_48(concat_ws(' ', slice(toks, i, 5)))))"""
            .stripMargin).as("ghs"))
      val bench = grams.filter(col("doc_id") < 50)
        .select(explode(col("ghs")).as("h")).distinct()
        .collect().map(_.getLong(0))
      val bloom = org.apache.spark.util.sketch.BloomFilter
        .create(bench.length.toLong, 0.00001)
      bench.foreach(bloom.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      grams.filter(col("doc_id") >= 50)
        .filter(call_function("graft_bloom_any",
          lit(bos.toByteArray), col("ghs"))).count()
    }

    // MinHash/LSH candidate generation: the corpus-wide shuffle keys
    // on (band, band_hash); unique docs produce ~no extra pairs, so
    // the candidate relation stays ~linear in the planted dups
    val candidates = timed("minhash+LSH candidates") {
      val bands = graft.pipeline.Dedup.bandsFrom(
        graft.pipeline.Dedup.shinglesFrom(docs))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    }

    // substring-level dup coverage: one gram-keyed count shuffle +
    // broadcast repeated-gram probe + islands window over covered
    // positions. The planted full-doc duplicates (and their seed docs)
    // are exactly the fully-covered documents; every other doc shares
    // no 5-gram with anything (position-salted tokens) so its coverage
    // is 0 - the relation between planted structure and coverage is
    // closed-form.
    val (spanFull, spanNone) = timed("dup-span coverage") {
      val spans = graft.pipeline.Dedup.dupSpansFrom(docs).persist()
      val full = spans.filter(col("covered_tokens") === col("n_tokens"))
        .count()
      val none = spans.filter(col("covered_tokens") === 0).count()
      spans.unpersist()
      (full, none)
    }
    // 48-bit gram hashing: expected collisions ~ n_grams^2 / 2^49 -
    // ~0.25 at 200k docs, ~1 at 400k - and each collision partially
    // covers its two docs. Allow that probabilistic tail; the planted
    // structure itself must be recovered exactly.
    val partialDocs = planted - spanFull - spanNone
    require(partialDocs <= 10,
      s"partial span coverage beyond collision expectation: $partialDocs")
    require(spanFull == 2L * (nDocs / 50),
      s"planted full-coverage docs: want ${2L * (nDocs / 50)}, got $spanFull")

    println(s"CORPUS-SMOKE docs=$planted exact_dup_groups=$exactGroups " +
      s"rep_docs=$repDocs bloom_maybe=$bloomPruned lsh_candidates=$candidates " +
      s"span_full=$spanFull")

    // weighted sample: one narrow pass + TakeOrdered top-K over the
    // full corpus; K rows exactly, ranked
    val wK = graft.pipeline.CorpusOps.wsampleK
    val wTop = timed("weighted sample top-K")(
      graft.pipeline.CorpusOps.sampleWeightedFrom(docs)
        .orderBy(col("skey").desc, col("doc_id")).limit(wK).collect())
    require(wTop.length == wK)
    require(wTop.map(_.getDouble(2)).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)), "sample not ranked")

    // bigram-LM NLL: the vocab-side scoring shape at the scale where
    // the bigram vocabulary (position-salted tokens -> ~one distinct
    // bigram per occurrence here, the worst case) genuinely outgrows a
    // broadcast - the corpus pays one (w1,w2)-keyed shuffle join + one
    // doc-keyed sum, never a vocab broadcast
    val bgDocs = timed("bigram-LM NLL (vocab-side scoring)")(
      graft.pipeline.TextAnalysis.bigramNllFrom(docs).count())
    require(bgDocs == planted, s"bigram NLL rows: $bgDocs vs $planted")

    // component resolution on a worst-case CHAIN: diameter = n, where
    // plain min-label propagation needs n rounds (hours of jobs at
    // this size) - path halving must land in O(log n)
    val chainN = 100000L
    val (chains, rounds) = timed(s"connected components ($chainN-chain)") {
      val edges = spark.range(chainN - 1)
        .selectExpr("id AS doc_a", "id + 1 AS doc_b")
      val (out, r) = graft.pipeline.Dedup.resolveComponents(spark, edges)
      (out.filter(col("cluster_id") === 0L).count(), r)
    }
    require(chains == chainN,
      s"chain must collapse to one component: $chains of $chainN labeled 0")
    require(rounds <= 25,
      s"path halving must converge in O(log n) rounds, took $rounds")
    println(s"CORPUS-SMOKE chain=$chainN rounds=$rounds wsample_k=$wK")
    docs.unpersist()
    spark.stop()
  }
}
