package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text operators on crafted inputs (the synthetic corpus is PII-free,
  * so scrubbing semantics are proven here).
  */
class TextAnalysisSpec extends SparkSpec {

  test("pmi: planted collocation table scores ln(c*N/(r*s)) in exact " +
       "micro-nats; support floor excludes the hapax pair; ties break " +
       "on the word order") {
    val s = spark; import s.implicits._
    // bigram table: (alpha,beta) 6, (alpha,gamma) 5, (delta,beta) 5,
    // (x,y) 5, (p,q) 1 (below the floor). N=22, r(alpha)=11, r(delta)=5,
    // r(x)=5, s(beta)=11, s(gamma)=5, s(y)=5. (alpha,gamma) and
    // (delta,beta) tie exactly -> w1 order decides.
    val docs = (
      Seq.fill(6)("alpha beta") ++ Seq.fill(5)("alpha gamma") ++
        Seq.fill(5)("delta beta") ++ Seq.fill(5)("x y") ++ Seq("p q"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def mu(c: Long, r: Long, sm: Long, n: Long): Long =
      math.floor(math.log(c.toDouble * n / (r.toDouble * sm)) * 1e6
        + 0.5).toLong
    val got = TextAnalysis.pmiFrom(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("x", "y", 5L, mu(5, 5, 5, 22)),
      ("alpha", "gamma", 5L, mu(5, 11, 5, 22)),
      ("delta", "beta", 5L, mu(5, 5, 11, 22)),
      ("alpha", "beta", 6L, mu(6, 11, 11, 22))))
    assert(mu(5, 11, 5, 22) == mu(5, 5, 11, 22), "the tie is the point")
  }

  test("jsd drift: identical sources score EXACTLY zero; a disjoint-" +
       "vocabulary source matches the driver replay incl. the " +
       "absent-mass ln2 closed form") {
    val s = spark; import s.implicits._
    def run(rows: Seq[(Long, String, String)]) = {
      val docs = rows.map { case (id, src, t) =>
        (id, t, "en", src, t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("graft_jsd")
        .toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      TextAnalysis.jsdDrift(spark, dir).collect()
    }
    // p == q for every source -> both KL ratios are exactly 1 and the
    // absent mass is empty: bitwise zero
    val same = run(Seq((1L, "a", "x y"), (2L, "b", "x y")))
    assert(same.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getDouble(4) == 0.0), s"identical sources must score 0: ${
        same.map(_.toSeq).toSeq}")
    // A = "x x y" (ns 3), B = "z" (ns 1), N = 4, ct = {x:2, y:1, z:1}
    def lnq(num: Double, den: Double): Long =
      math.floor(math.log(num / den) * 1e6 + 0.5).toLong
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = run(Seq((1L, "a", "x x y"), (2L, "b", "z")))
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val aNum1 = 2 * lnq(2.0 * 2 * 4, 2.0 * 4 + 2.0 * 3) +
      1 * lnq(2.0 * 1 * 4, 1.0 * 4 + 1.0 * 3)
    val aNum2 = 2 * lnq(2.0 * 2 * 3, 2.0 * 4 + 2.0 * 3) +
      1 * lnq(2.0 * 1 * 3, 1.0 * 4 + 1.0 * 3)
    val aJsd = q6((aNum1 / 3.0 + aNum2 / 4.0 + 1.0 * 693147.0 / 4.0)
      / 2000000.0)
    assert(got("a") == ((2L, aNum1, aNum2, aJsd)), s"source a: $got")
    // B's only term z is exclusive: p_t/m_t = 2·1·4/(4+1) and
    // q_t/m_t = 2·1·1/5; the other 3/4 of the corpus mass is absent
    val bNum1 = 1 * lnq(2.0 * 1 * 4, 1.0 * 4 + 1.0 * 1)
    val bNum2 = 1 * lnq(2.0 * 1 * 1, 1.0 * 4 + 1.0 * 1)
    val bJsd = q6((bNum1 / 1.0 + bNum2 / 4.0 + 3.0 * 693147.0 / 4.0)
      / 2000000.0)
    assert(got("b") == ((1L, bNum1, bNum2, bJsd)), s"source b: $got")
    // disjoint vocab drifts much harder than the shared-vocab source
    assert(got("b")._4 > got("a")._4)
  }

  test("fertility: in-row argmax routes docs to their marker language " +
       "and the per-language ratios are hand-exact") {
    val s = spark; import s.implicits._
    // en doc: 8 words, 8 letter-run pieces, 28 chars -> fertility 1.0,
    // chars/piece 3.5; fr doc: 7/7/25 -> 1.0 and q6(25/7)
    val docs = Seq(
      (1L, "the cat and the dog is a pet"),
      (2L, "le chat et la vie les des"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.fertilityFromDocStats(
        TextAnalysis.fertilityDocStats(docs))
      .collect().map(_.toSeq).toSeq
    val cpFr = math.floor(25.0 / 7.0 * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      Seq("en", 1L, 8L, 8L, 28L, 1.0, 3.5),
      Seq("fr", 1L, 7L, 7L, 25L, 1.0, cpFr)), s"fertility: $got")
    // the in-row pick == the langid window pick on the real corpus
    val inRow = TextAnalysis.fertilityDocStats(
        graft.core.Graft.tableParallel(spark, sfDir, "documents"))
      .groupBy("pred_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val windowed = TextAnalysis.langid(spark, sfDir)
      .groupBy("pred_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inRow == windowed,
      s"argmax parity: in-row $inRow vs windowed $windowed")
  }

  test("vocab coverage: hand-computed cuts over a 12-type frequency " +
       "table; the curve saturates at full vocabulary") {
    val s = spark; import s.implicits._
    graft.core.Graft.ensureConf(spark)
    // counts 12..1 (total 78): top-10 covers 75 -> q6(75/78);
    // both larger cuts admit all 12 types and cover everything
    val freq = (1 to 12).map(i => (f"t$i%02d", (13 - i).toLong))
      .toDF("term", "cnt")
    val got = TextAnalysis.coverageFrom(freq).collect()
      .map(_.toSeq).toSeq
    val s10 = math.floor(75.0 / 78.0 * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      Seq(10L, 10L, 75L, s10),
      Seq(100L, 12L, 78L, 1.0),
      Seq(1000L, 12L, 78L, 1.0)), s"coverage: $got")
  }

  test("pii scrub redacts emails, phones and SSNs") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "contact bob@example.com or 555-123-4567 today"),
      (2L, "ssn 123-45-6789 appears once"),
      (3L, "clean text with no pii at all"))
      .toDF("doc_id", "text")
    val scrubbed = df.select(col("doc_id"),
        TextAnalysis.piiScrubExpr("text").as("out"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(scrubbed(1L) == "contact <EMAIL> or <PHONE> today")
    assert(scrubbed(2L) == "ssn <SSN> appears once")
    assert(scrubbed(3L) == "clean text with no pii at all")
  }

  test("pii counts align with redactions") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a@b.co c@d.org and 111-22-3333")).toDF("doc_id", "text")
    val n = df.select(
      size(expr(s"regexp_extract_all(text, '${TextAnalysis.emailRe.replace("\\", "\\\\")}', 0)")).as("e"),
      size(expr(s"regexp_extract_all(text, '${TextAnalysis.ssnRe.replace("\\", "\\\\")}', 0)")).as("s"))
      .collect().head
    assert(n.getInt(0) == 2 && n.getInt(1) == 1)
  }

  test("keyphrase: hand-replayed RAKE — islands split at stopwords, " +
       "over-cap runs excluded, deg/freq in exact micro-units") {
    val s = spark; import s.implicits._
    // d1 runs: [deep learning] [deep networks] [fun]; d2's 5-token run
    // b..f exceeds rakeMaxLen=4 and is excluded OUTRIGHT (its words
    // must not reach the word stats). deep: freq 3, deg 6 -> 2e6;
    // learning 2e6; networks 2e6; fun 1e6.
    assert(TextAnalysis.rakeMaxLen == 4, "cap change must retune this spec")
    val docs = Seq(
      (1L, "deep learning of deep networks is fun"),
      (2L, "deep learning and b c d e f"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.keyphraseFrom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("deep learning", 2L, 4000000L),
      ("deep networks", 1L, 4000000L),
      ("fun", 1L, 1000000L)))
  }

  test("langid picks the best-scoring marker language deterministically") {
    val r = TextAnalysis.langid(spark, sfDir).collect()
    assert(r.length == 500)
    // same-vocab synthetic corpus: scores must still be well-defined
    assert(r.forall(x => x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0))
  }

  test("unigram NLL: rare-token documents score more surprising") {
    val r = TextAnalysis.unigramNll(spark, sfDir).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.size == 500 && r.values.forall(_ > 0.0))
    // a document of corpus-common tokens must score below one that is
    // mostly hapax legomena: compare each doc's score against the
    // corpus quartiles of its own mean token frequency
    val toks = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
    val freq = toks.groupBy("term").count()
    val meanFreq = toks.join(freq, "term").groupBy("doc_id")
      .agg(avg(col("count")).as("mf"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val byFreq = r.keys.toSeq.sortBy(meanFreq)
    val lowFreqNll = byFreq.takeRight(50).map(r).sum / 50 // most common
    val highFreqNll = byFreq.take(50).map(r).sum / 50     // most rare
    assert(highFreqNll > lowFreqNll,
      "rare-token docs must have higher mean NLL than common-token docs")
  }

  test("tfidf: top-3 matches an independent Scala recomputation") {
    val rows = TextAnalysis.tfidf(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent ground truth: collect raw tokens, redo the integer
    // quantization scheme in plain Scala
    val toks = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.nonEmpty)
    val tf = toks.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong } }
    val df = tf.flatMap(_._2.keys).groupBy(identity).map {
      case (t, xs) => t -> xs.size.toLong }
    val nDocs = tf.size.toDouble
    val idfU = df.map { case (t, d) =>
      t -> math.floor(math.log(nDocs / d.toDouble) * 1e6 + 0.5).toLong }
    val truth = tf.flatMap { case (d, m) =>
      m.toSeq.map { case (t, c) => (t, c * idfU(t)) }
        .sortBy { case (t, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, _), i) => (d, t, (i + 1).toLong) }
    }.toSet
    assert(got.length == truth.size)
    assert(got.toSet == truth,
      s"mismatch: ${got.toSet.diff(truth).take(3)} vs ${truth.diff(got.toSet).take(3)}")
    // scores are non-negative and bounded by max idf (ln N, nats)
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(s => s >= 0.0 && s <= math.log(nDocs)))
  }

  test("phrase merge: left-to-right overlap, chaining, exact BPE pass") {
    val s = spark; import s.implicits._
    // merges include (hash, join), (hash_join, filter) - chained - and
    // the overlap case uses a repeated pair
    val docs = Seq(
      // chaining: hash+join -> hash_join, then +filter -> 3-level
      (1L, "hash join filter scan"),
      // left-to-right non-overlap: "hash join ... hash join" both
      // merge; "join hash join" -> first pair (join,hash) is NOT a
      // merge, so (hash,join) fires on positions 2-3
      (2L, "join hash join"),
      // a replacement is never re-matched in its own pass: "hash join
      // join" -> [hash_join, join], the second join survives
      (3L, "hash join join"),
      // untouched doc
      (4L, "scan row scan")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.phraseMergeFrom(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3)))
      .toMap
    assert(r(1L) == ((4L, 2L, "hash_join_filter scan")))
    assert(r(2L) == ((3L, 2L, "join hash_join")))
    assert(r(3L) == ((3L, 2L, "hash_join join")))
    assert(r(4L) == ((3L, 3L, "scan row scan")))
    // real corpus: merges fire, token counts only shrink, text
    // reassembles consistently
    val corpus = TextAnalysis.phraseMerge(spark, sfDir).collect()
    assert(corpus.forall(x => x.getLong(2) <= x.getLong(1)))
    assert(corpus.exists(x => x.getLong(2) < x.getLong(1)),
      "the merge table must fire on the corpus")
  }

  test("bpe learn: planted multi-level merges recovered, apply round-trips") {
    val s = spark; import s.implicits._
    // two docs of a repeated 3-token phrase plant a 3-level merge
    // ladder; the filler doc contributes only count-1 pairs
    val phrase = Array.fill(12)("spark sql engine").mkString(" ")
    val docs = Seq(
      (1L, phrase),
      (2L, phrase),
      (3L, "filler tokens alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val learned = TextAnalysis.bpeLearnFrom(docs, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (spark,sql) and (sql,engine) tie at 24; lhs-asc breaks it
    assert(learned(0) == ((1L, "spark", "sql", 24L)))
    // round 2 chains onto round 1's output token
    assert(learned(1) == ((2L, "spark_sql", "engine", 24L)))
    // round 3: the fully-merged phrase repeats adjacently -> self-pair,
    // 11 per doc
    assert(learned(2) == ((3L, "spark_sql_engine", "spark_sql_engine", 22L)))
    // max pair count is non-increasing across rounds (BPE invariant)
    assert(learned.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
    // feeding the learned table to the APPLY operator reproduces the
    // planted structure: 36 tokens -> 12 merged -> 6 self-paired
    val applied = TextAnalysis
      .phraseMergeFrom(docs, learned.map(x => (x._2, x._3)).toSeq)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(applied(1L) == ((36L, 6L)))
    assert(applied(3L) == ((6L, 6L)), "filler doc untouched")
    // corpus run: exactly bpeRounds rows, counts non-increasing
    val corpus = TextAnalysis.bpeLearn(spark, sfDir).collect()
    assert(corpus.length == TextAnalysis.bpeRounds)
    val counts = corpus.map(_.getLong(3))
    assert(counts.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("bpe encode: the learned table applied end-to-end reproduces " +
       "the planted merge ladder") {
    val s = spark; import s.implicits._
    val phrase = Array.fill(12)("spark sql engine").mkString(" ")
    val docs = Seq(
      (1L, phrase),
      (2L, phrase),
      (3L, "filler tokens alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeFrom(docs, rounds = 3).collect()
    val m = r.map(x => x.getLong(0) ->
      ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    // 36 raw tokens -> 24 (spark_sql) -> 12 (spark_sql_engine) -> 6
    // (the round-3 self-pair merges left-to-right non-overlapping)
    assert(m(1L)._1 == 36L && m(1L)._2 == 6L)
    assert(m(1L)._3 ==
      Array.fill(6)("spark_sql_engine_spark_sql_engine").mkString(" "))
    assert(m(3L) == ((6L, 6L, "filler tokens alpha beta gamma delta")),
      "doc without planted pairs must pass through unmerged")
    // corpus run: every encoded count bounded by the raw count, and
    // the learned table actually fires somewhere
    val corpus = TextAnalysis.bpeEncode(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(x => x.getLong(2) <= x.getLong(1)))
    assert(corpus.exists(x => x.getLong(2) < x.getLong(1)),
      "the corpus-learned merges must fire on the corpus")
  }

  test("bpe learn: early stop at the support floor - a low-support " +
       "tail ends the induction instead of merging noise") {
    val s = spark; import s.implicits._
    // round 1 has real support (the repeated bigram); every remaining
    // adjacent pair occurs exactly once, i.e. below the floor of 2 -
    // the induction must emit ONE round and stop, not pay 8 corpus
    // scans to learn seven noise merges
    val docs = (
      (1L to 5L).map(i => (i, "hot pair")) ++ // merged doc = 1 token:
        // no self-pair can chain a second supported round
        (6L to 13L).map(i => (i, s"solo${i}a solo${i}b"))
      ).toDF("doc_id", "text")
    val learned = TextAnalysis.bpeLearnFrom(docs, rounds = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(learned.length == 1, s"expected the floor to stop round 2+, " +
      s"got ${learned.mkString(", ")}")
    assert(learned(0)._2 == "hot" && learned(0)._3 == "pair")
    assert(learned(0)._4 >= TextAnalysis.bpeSupportFloor)
  }

  test("bm25: engine top-k matches an independent driver-side " +
       "recomputation of the full formula") {
    val rows = TextAnalysis.bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1L to rows.length))
    // independent reimplementation: plain Scala over the raw text
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    val n = docs.length.toLong
    val sToks = docs.map(_._2.length.toLong).sum
    val dfm = TextAnalysis.bm25QueryTerms.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val su = TextAnalysis.bm25QueryTerms.map { t =>
        val c = toks.count(_ == t).toLong
        if (c == 0) 0L
        else {
          val idfU = math.floor(math.log(1.0 +
            (n.toDouble - dfm(t) + 0.5) / (dfm(t) + 0.5)) * 1e6 + 0.5).toLong
          math.floor(idfU.toDouble *
            ((22.0 * c * sToks) /
             (10.0 * c * sToks + 3.0 * sToks + 9.0 * dl * n).toDouble)
            + 0.5).toLong
        }
      }.sum
      (id, su)
    }.filter(_._2 > 0)
      .sortBy { case (id, su) => (-su, id) }
      .take(TextAnalysis.bm25TopK)
    assert(rows.map(_._2).toSeq == scored.map(_._1).toSeq,
      s"ranking mismatch: engine=${rows.map(_._2).toSeq} " +
        s"driver=${scored.map(_._1).toSeq}")
    rows.zip(scored).foreach { case ((_, _, s), (_, su)) =>
      assert(math.abs(s - su / 1e6) < 1e-9)
    }
  }

  test("hybrid rrf: fused scores are consistent with the reported " +
       "per-list ranks and ordering is deterministic") {
    val rows = TextAnalysis.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def part(r: Option[Long]): Long =
      r.map(x => math.floor(1e6 / (TextAnalysis.rrfK + x) + 0.5).toLong)
        .getOrElse(0L)
    val recomputed = rows.map { r =>
      val tr = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val vr = if (r.isNullAt(4)) None else Some(r.getLong(4))
      (r.getLong(1), part(tr) + part(vr), r.getDouble(2))
    }
    recomputed.foreach { case (_, u, rrf) =>
      assert(math.abs(rrf - u / 1e6) < 1e-9)
    }
    // the report is ordered by the fused score with doc_id tie-break
    val key = recomputed.map { case (id, u, _) => (-u, id) }
    assert(key.sortBy(identity).toSeq == key.toSeq)
    // at least one doc must appear in BOTH lists on the fixture
    assert(rows.exists(r => !r.isNullAt(3) && !r.isNullAt(4)),
      "expected overlap between the lexical and vector lists")
  }

  test("backoff score: window context totals + co-partitioned chain " +
       "≡ the aggregate-join formulation it replaced") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    // docs chosen so trigram/bigram/unseen branches all fire and some
    // (w1,w2) / (w2) contexts repeat with different continuations
    val docs = Seq(
      (0L, "the cat sat on the mat"), (2L, "the cat sat on the hat"),
      (4L, "a dog sat on a log"), (6L, "the dog ran"),
      (1L, "the cat sat on the mat"), (3L, "zz unseen words here"),
      (5L, "the dog sat on the mat quickly"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.backoffNllFrom(docs)
      .collect().map(_.toSeq).toSeq
    // the pre-r17 shape, reimplemented verbatim: context totals via
    // aggregate + self-join, naive join chain
    val toks = TextAnalysis.backoffDocToks(docs).localCheckpoint()
    val train = toks.filter(pmod(col("doc_id"), lit(2)) === 0)
    val test0 = toks.filter(pmod(col("doc_id"), lit(2)) === 1)
    val (pos, uni, bg, tg) = (TextAnalysis.backoffPos(test0),
      TextAnalysis.backoffUni(train), TextAnalysis.backoffBg(train),
      TextAnalysis.backoffTg(train))
    val tot = uni.agg(sum(col("cu")).as("s_tok"), count(lit(1)).as("v_size"))
    val tgs = tg.join(
      tg.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("c12")),
      Seq("w1", "w2"))
    val bgs = bg.join(
      bg.groupBy(col("w2")).agg(sum(col("c2")).as("c1")), Seq("w2"))
    val a = TextAnalysis.backoffAlpha
    val exp = pos
      .join(tgs, Seq("w1", "w2", "w3"), "left")
      .join(bgs, Seq("w2", "w3"), "left")
      .join(broadcast(uni), Seq("w3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        expr(s"""CAST(floor(-ln(CASE
          |  WHEN i >= 3 AND c3 IS NOT NULL
          |    THEN CAST(c3 AS DOUBLE) / CAST(c12 AS DOUBLE)
          |  WHEN i >= 2 AND c2 IS NOT NULL
          |    THEN (CASE WHEN i >= 3 THEN $a ELSE 1.0 END)
          |      * (CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
          |  ELSE (CASE WHEN i >= 3 THEN $a * $a WHEN i = 2 THEN $a
          |        ELSE 1.0 END)
          |    * (CAST(coalesce(cu, 0) + 1 AS DOUBLE)
          |       / CAST(s_tok + v_size AS DOUBLE))
          |END) * 1000000.0 + 0.5) AS BIGINT)""".stripMargin).as("nll_u"),
        expr("""CASE
          |  WHEN i >= 3 AND c3 IS NULL AND c2 IS NULL THEN 2L
          |  WHEN i >= 3 AND c3 IS NULL THEN 1L
          |  WHEN i = 2 AND c2 IS NULL THEN 1L
          |  ELSE 0L END""".stripMargin).as("bo"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("bo")).as("n_bo"),
        sum(col("nll_u")).as("sum_u"))
      .select(col("doc_id"), col("n_tok"), col("n_bo"),
        ParityMath.q6((col("sum_u").cast("double") / lit(1000000.0))
          / col("n_tok")).as("nll"))
      .orderBy(col("doc_id"))
      .collect().map(_.toSeq).toSeq
    assert(got === exp)
  }

  test("stupid backoff: verbatim held-out text never backs off; " +
       "reordered text backs off and scores worse") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sbo").toString
    runBackoffFixture(tmp)
  }

  test("readability: counts and both Flesch formulas replay by hand; " +
       "zero-sentence text floors the denominator instead of dividing " +
       "by zero") {
    // "Hello world. This is fun!" - 5 words, 2 sentence runs, vowel
    // groups: he|llo(2) wo|rld(1) this(1) is(1) fun(1) = 6
    val t1 = "Hello world. This is fun!"
    val t2 = "no sentence terminators here at all"  // 6 words, 0 sents
    val docs = spark.createDataFrame(Seq(
      (0L, t1, "en", "src0", t1.length.toLong),
      (1L, t2, "en", "src0", t2.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_read").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.readability(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def scores(w: Long, s: Long, y: Long): (Double, Double) = {
      val wd = math.max(1L, w).toDouble; val sd = math.max(1L, s).toDouble
      (q6(206.835 - 1.015 * (w / sd) - 84.6 * (y / wd)),
        q6(0.39 * (w / sd) + 11.8 * (y / wd) - 15.59))
    }
    assert(got(0L)._1 == 5L && got(0L)._2 == 2L && got(0L)._3 == 6L)
    val (f0, g0) = scores(5, 2, 6)
    assert(got(0L)._4 == f0 && got(0L)._5 == g0)
    // vowel groups of t2: o(1) e|e(2) e|i|a|o (no - count per word:
    // "no"(1) "sentence"(3: e,e,e) "terminators"(4: e,i,a,o)
    // "here"(2) "at"(1) "all"(1) = 12
    assert(got(1L)._1 == 6L && got(1L)._2 == 0L && got(1L)._3 == 12L)
    val (f1, g1) = scores(6, 0, 12)
    assert(got(1L)._4 == f1 && got(1L)._5 == g1)
  }

  private def runBackoffFixture(tmp: String): Unit = {
    val phrase = Seq.fill(40)("alpha beta gamma delta").mkString(" ")
    val salad = new scala.util.Random(11)
      .shuffle(phrase.split(" ").toSeq).mkString(" ")
    // train = even ids (the phrase LM); held-out = 1 verbatim, 3 salad
    val docs = spark.createDataFrame(Seq(
      (0L, phrase, "en", "src0", phrase.length.toLong),
      (2L, phrase, "en", "src0", phrase.length.toLong),
      (1L, phrase, "en", "src0", phrase.length.toLong),
      (3L, salad, "en", "src0", salad.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.backoffNll(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 3L), "only held-out (odd) docs score")
    val (n1, bo1, nll1) = got(1L)
    val (n3, bo3, nll3) = got(3L)
    assert(n1 == 160L && n3 == 160L)
    assert(bo1 == 0L, s"every trigram of the verbatim doc is in the " +
      s"LM - no backoff, got $bo1")
    assert(bo3 > 0L, "the reordered doc must hit unseen trigrams")
    assert(nll3 > nll1 + 0.3,
      s"backoff chain failed to separate: verbatim=$nll1 salad=$nll3")
    // the training docs' own trigrams are all seen by construction -
    // scoring train-on-train would measure nothing; the parity split
    // is what makes bo3 > 0 possible at all
  }

  test("retrieval eval: metrics match an independent driver-side " +
       "recomputation from the gated lists") {
    val rows = TextAnalysis.retrievalEval(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("bm25", "hybrid", "vector"))
    // driver-side relevance: all five query terms present
    val rel = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .filter { r =>
        val toks = "[a-z0-9]+".r
          .findAllIn(r.getString(1).toLowerCase).toSet
        TextAnalysis.bm25QueryTerms.forall(toks.contains)
      }.map(_.getLong(0)).toSet
    assert(rel.nonEmpty, "fixture must have conjunctive-match docs")
    val k = TextAnalysis.retrievalEvalK
    val idcgU = (1 to math.min(rel.size, k)).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
      .sum
    def metrics(list: Seq[(Long, Long)]): (Long, Double, Double, Double) = {
      val hits = list.count(e => rel(e._1)).toLong
      val pk = list.count(e => rel(e._1) && e._2 <= k) / k.toDouble
      val first = list.filter(e => rel(e._1)).map(_._2).sorted.headOption
      val mrr = first.map(r0 =>
        math.floor(1e6 / r0.toDouble + 0.5) / 1e6).getOrElse(0.0)
      val dcgU = list.filter(e => rel(e._1) && e._2 <= k).map(e =>
        math.floor(1e6 / (math.log(e._2 + 1.0) / math.log(2.0)) + 0.5)
          .toLong).sum
      val ndcg = if (idcgU == 0L) 0.0 else dcgU.toDouble / idcgU
      (hits, pk, mrr, ndcg)
    }
    val faces = Map(
      "bm25" -> TextAnalysis.textList(spark, sfDir, TextAnalysis.bm25TopK)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "vector" -> TextAnalysis.vecList(spark, sfDir, TextAnalysis.bm25TopK)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "hybrid" -> TextAnalysis.hybridRrf(spark, sfDir)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq)
    rows.foreach { case (lst, hits, pk, mrr, ndcg) =>
      val (eh, epk, emrr, endcg) = metrics(faces(lst))
      assert(hits == eh, s"$lst hits: got $hits want $eh")
      assert(math.abs(pk - epk) < 1e-9, s"$lst p@k: got $pk want $epk")
      assert(math.abs(mrr - emrr) < 1e-9, s"$lst mrr: got $mrr want $emrr")
      assert(math.abs(ndcg - endcg) < 2e-6,
        s"$lst ndcg: got $ndcg want $endcg")
    }
  }

  test("bigram NLL separates word salad the unigram gate cannot see") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bg").toString
    // same token MULTISET in both docs - the unigram LM scores them
    // identically; only the patterned doc's pairs recur
    val phrase = Seq.fill(40)("alpha beta gamma delta").mkString(" ")
    val salad = new scala.util.Random(7)
      .shuffle(phrase.split(" ").toSeq).mkString(" ")
    val docs = spark.createDataFrame(Seq(
      (0L, phrase, "en", "src0", phrase.length.toLong),
      (1L, salad, "en", "src0", salad.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val uni = TextAnalysis.unigramNll(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = TextAnalysis.bigramNll(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(0L) == uni(1L), "unigram gate must be blind to order")
    assert(bi(1L) > bi(0L) + 0.5,
      s"bigram gate failed to separate: phrase=${bi(0L)} salad=${bi(1L)}")
  }

  test("kneser-ney: hand-replay of the interpolated chain on a planted " +
       "corpus; continuation beats raw frequency where it should") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kn").toString
    // doc 0 "a b a b": bigrams (a,b)x2, (b,a); doc 1 "a c": (a,c).
    // bfreq: (a,b)=2, (b,a)=1, (a,c)=1 -> r(a)=3 n1p(a)=2, r(b)=1
    // n1p(b)=1; n1c(a)=1, n1c(b)=1, n1c(c)=1; nbb=3.
    val docs = spark.createDataFrame(Seq(
      (0L, "a b a b", "en", "src0", 7L),
      (1L, "a c", "en", "src0", 3L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def nllMu(cb: Long, r: Long, n1p: Long, n1c: Long, nbb: Long): Long =
      math.floor(-math.log(
        (math.max(cb.toDouble - 0.75, 0.0)
          + (0.75 * n1p.toDouble) * (n1c.toDouble / nbb.toDouble))
          / r.toDouble) * 1e6 + 0.5).toLong
    val ab = nllMu(2, 3, 2, 1, 3) // P(b|a) = (1.25 + .5)/3
    val ba = nllMu(1, 1, 1, 1, 3) // P(a|b) = (0.25 + .25)/1
    val ac = nllMu(1, 3, 2, 1, 3) // P(c|a) = (0.25 + .5)/3
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = TextAnalysis.knNll(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(0L)._1 == 3L && got(1L)._1 == 1L)
    assert(got(0L)._2 == q6(((2 * ab + ba).toDouble / 1e6) / 3.0),
      s"doc 0: ${got(0L)}")
    assert(got(1L)._2 == q6((ac.toDouble / 1e6) / 1.0),
      s"doc 1: ${got(1L)}")
    // the KN property: (a,c) and (b,a) have the SAME raw count but
    // different verdicts - (a,c) pays for its rare context mass while
    // the a-context's heavier competition makes P(c|a) < P(a|b)
    assert(ac > ba, "continuation-aware smoothing must separate " +
      "equal-count pairs by context")
  }

  test("heaps: curve is cumulative-monotone and its final row equals " +
       "the corpus totals") {
    val r = TextAnalysis.heaps(spark, sfDir).collect()
    assert(r.length == 10)
    assert(r.map(_.getLong(0)).toSeq == (1L to 10L))
    for (c <- 1 to 3)
      assert(r.sliding(2).forall(p => p(0).getLong(c) <= p(1).getLong(c)),
        s"column $c must be cumulative")
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
    assert(r.last.getLong(1) == docs.count())
    assert(r.last.getLong(2) == toks.count())
    assert(r.last.getLong(3) == toks.distinct().count())
  }


  test("novelty: later member of a planted near-dup pair scores at " +
       "most 1 - jaccard-ish; ratios recompute") {
    val nov = TextAnalysis.novelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    nov.values.foreach { case (g, n, r) =>
      assert(n <= g && r == math.floor(n.toDouble / g * 1e6 + 0.5) / 1e6)
    }
    // every verified >=0.8-jaccard pair: the LATER doc shares >=80% of
    // its shingles with an earlier one, so its novelty is <= ~0.2
    val pairs = Dedup.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val later = math.max(a, b)
      assert(nov(later)._3 <= 0.25,
        s"near-dup doc $later scored novelty ${nov(later)._3}")
    }
  }

}
