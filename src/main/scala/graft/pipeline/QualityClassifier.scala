package graft.pipeline

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** In-engine trained quality classifier: logistic regression over the
  * hashing-trick features, distilling a deterministic heuristic
  * teacher into a learned scorer — the CCNet/GPT-3-line quality-filter
  * pattern (train a cheap linear model on weak labels, score the whole
  * corpus with one narrow pass). The reference has no learned
  * component (`/root/reference/src-clj/streamsum/caches.clj` is pure
  * counting); this is the commissioned training-data extension's
  * "learn the filter" member next to the rule-based 39b gate.
  *
  * Determinism scheme (the repo's integer-units discipline applied to
  * GRADIENT DESCENT): weights live in integer micro-units; per epoch,
  * z_mu = Σ w_mu·x + b_mu is an exact integer sum; the only
  * transcendental is the sigmoid, quantized to integer micro-units
  * immediately (floor(1e6/(1+exp(−z)) + 0.5) — the micro-nat ln
  * precedent), so the per-bucket gradient Σ (p_mu − y_mu)·x is exact
  * integer again; the update divides by (lrDen·n_train) with truncation
  * toward zero (Scala/Spark semantics; the oracle replays truncation
  * by sign-splitting DuckDB's floor division). Both engines therefore
  * train BIT-IDENTICAL weights, epoch by epoch.
  *
  * Scale posture (the lessons of this codebase baked in from the
  * start): training runs on the bounded deterministic `doc_id <
  * qclfTrainN` sample — never the corpus — and the per-epoch passes
  * run over a localCheckpointed O(sample × buckets) relation, so
  * epoch cost is independent of corpus size AND free of the
  * Generate/re-evaluation pathology the PQ trainer hit. Scoring is
  * one narrow pass over the full corpus features against the 67-entry
  * literal weight vector. Full-batch GD (not SGD): batch
  * gradients are order-independent integer sums, exactly what the
  * cross-engine contract needs, and for a 67-parameter model the
  * sample IS the batch.
  */
object QualityClassifier {

  /** Training-sample bound (deterministic doc_id prefix; fixtures are
    * larger, so the gate certifies the sampled path).
    */
  val qclfTrainN = 300L

  val qclfEpochs = 40

  /** Update denominator factor: step = trunc(grad / (lrDen · n)). */
  val lrDen = 3L

  private val nB = TextAnalysis.hashfeatBuckets // 64

  // Teacher labels: the two cheapest gate signals (token count in the
  // Gopher band, stopword ratio above floor) — deliberately a SUBSET
  // of the full 39b gate, so the classifier has real signal to
  // recover from lexical features without the oracle having to replay
  // the gate's LM leg inside every epoch CTE. Computed inline as
  // COLUMNS in featureRows (per-row rule, no self-join).

  /** Features + bias rows + micro-unit labels for any documents frame:
    * (doc_id, bucket, x, ymu) with bucket −1 carrying the bias (x=1
    * for every doc, so empty documents still reach the model), −2 the
    * clamped token count and −3 the clamped stopword count.
    */
  private[graft] def featureRows(docs: DataFrame): DataFrame = {
    // dense engineered features next to the hashed buckets: the signed
    // hash sums CANCEL length information by construction (that is
    // their unbiasedness), so a length-band teacher is invisible to
    // them alone — clamped token and stopword counts restore the axes
    // the teacher actually thresholds (measured: hash-only training
    // landed exactly at the majority-class baseline).
    // The label rides every derivation as a COLUMN (the teacher rule
    // is per-row), never via a doc_id self-join — a join of two
    // derivations of the same source would become a stream-stream
    // join on the streaming face.
    val labT = docs
      .select(col("doc_id"), col("text"))
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .withColumn("n_tokens", size(col("toks")).cast(LongType))
      .withColumn("stop_cnt",
        expr(s"size(filter(toks, x -> x IN (${TextAnalysis.stopList})))")
          .cast(LongType))
      .withColumn("stop_ratio", when(col("n_tokens") >= 1, ParityMath.q6(
        col("stop_cnt").cast("double") / col("n_tokens").cast("double"))))
      .withColumn("ymu",
        when(col("n_tokens").between(QualityGate.minTokens,
            QualityGate.maxTokens) &&
          coalesce(col("stop_ratio") >= QualityGate.minStopRatio,
            lit(false)), 1000000L).otherwise(0L))
      .select(col("doc_id"), col("text"), col("n_tokens"),
        col("stop_cnt"), col("ymu"))
    // ONE explode + ONE aggregation (no union of aggregated and
    // row-wise branches — a Complete-mode streaming query cannot mix
    // them): each doc fans out to its hashed-term contributions PLUS
    // three synthetic entries carrying bias and the dense features,
    // then a single (doc, ymu, bucket)-keyed map-combinable sum folds
    // them. Zero-sum HASHED buckets drop (collision cancellation);
    // dense rows stay even at zero (their absence would change z for
    // short docs on only one engine).
    labT
      .select(col("doc_id"), col("ymu"), explode(expr(
        s"""concat(
           |  transform(regexp_extract_all(lower(text), '[a-z0-9]+', 0),
           |    t -> named_struct(
           |      'b', graft_md5_48(t) % $nB,
           |      'c', CASE WHEN (graft_md5_48(t) DIV $nB) % 2 = 0
           |                THEN 1L ELSE -1L END)),
           |  array(named_struct('b', -1L, 'c', 1L),
           |        named_struct('b', -2L, 'c', least(n_tokens, 64L) DIV 8L),
           |        named_struct('b', -3L, 'c', least(stop_cnt, 64L) DIV 8L))
           |)""".stripMargin)).as("bc"))
      .groupBy(col("doc_id"), col("ymu"), col("bc.b").as("bucket"))
      .agg(sum(col("bc.c")).as("x"))
      .filter(col("bucket") < 0L || col("x") =!= 0L)
      .select(col("doc_id"), col("bucket"), col("x"), col("ymu"))
  }

  /** Weight-lookup column for a driver-held weight vector: bucket −3
    * (the first dense feature) maps to index 1 of the 1-based literal
    * array.
    */
  private def wLookup(w: Array[Long]) =
    expr(s"element_at(array(${w.mkString("L, ")}L), " +
      s"CAST(bucket + 4 AS INT))")

  /** Train the 67 micro-unit weights (64 hashed buckets + bias + two
    * dense features) on the bounded sample; returns (weights indexed
    * by bucket+3, n_train). Bounded driver state by construction — the
    * Lloyd-trainer pattern.
    */
  /** Trained weights memoized per (session, corpus) — train and score
    * faces share one training run (the centroid-cache pattern,
    * including the stopped-session sweep).
    */
  private val wCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Array[Long], Long)]()

  def releaseAll(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    wCache.keySet.asScala.filter(_._1 eq spark).toSeq
      .foreach(wCache.remove)
  }

  private[graft] def trainWeights(spark: SparkSession,
                                  sfDir: String): (Array[Long], Long) = {
    val it = wCache.keySet().iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    wCache.computeIfAbsent((spark, sfDir), { case (s, d) =>
      trainWeightsUncached(s, d)
    })
  }

  private def trainWeightsUncached(spark: SparkSession,
                                   sfDir: String): (Array[Long], Long) = {
    Graft.ensureConf(spark)
    gdTrain(featureRows(Graft.tableParallel(spark, sfDir, "documents")
      .filter(col("doc_id") < qclfTrainN)))
  }

  /** The epoch loop over any (doc_id, bucket, x, ymu) training feature
    * relation — shared by the batch, streaming, and store faces. The
    * relation is SAMPLE-BOUNDED by construction (≤ qclfTrainN × 67
    * rows), so it is collected ONCE and the 40 epochs fold on the
    * driver — the Lloyd-codebook posture: distributed featurization,
    * driver-local fitting of a 67-parameter model. (The first cut ran
    * each epoch as a Spark job: 40 × the job-launch floor ≈ 6s of
    * pure scheduling for microseconds of arithmetic.) Bit-identical to
    * the distributed form AND the DuckDB replay: every sum is an
    * order-free integer fold, z_mu/1e6 is one IEEE division, and the
    * sigmoid uses the same Math.exp the engines' EXP lowers to.
    *
    * Known cross-engine risk (accepted): bit-identity assumes DuckDB's
    * libm exp() agrees with JVM Math.exp wherever
    * floor(1e6·sigmoid + 0.5) sits within 1 ulp of a .5 boundary;
    * unlike the one-shot micro-nat ln, a single boundary hit here
    * cascades through all 67 weights for the remaining epochs. The
    * clean failure detector exists by construction: `pipe_qclf_train`
    * gates the WEIGHT VECTOR itself, so a libm divergence fails as a
    * 67-row weight mismatch there before any downstream face can
    * mis-score. The LOCALIZING diagnostic is `boundaryMargin`: the
    * minimum distance any sigmoid evaluation in the whole training run
    * comes to a .5 rounding boundary - a margin ≫ the ~2⁻⁵² relative
    * exp() disagreement (≈2×10⁻¹⁰ absolute at the 1e6 scale) proves
    * the accepted risk is not live on the gated corpus. Verify prints
    * it per run; a spec pins a 10⁻⁶ floor.
    */
  /** Min |frac(1e6·sigmoid) − 0.5| across every evaluation of the
    * training run on this corpus - the cross-engine rounding headroom.
    */
  def boundaryMargin(spark: SparkSession, sfDir: String): Double = {
    Graft.ensureConf(spark)
    val m = new BoundaryMargin
    gdTrain(featureRows(Graft.tableParallel(spark, sfDir, "documents")
      .filter(col("doc_id") < qclfTrainN)), m)
    m.min
  }

  private[graft] final class BoundaryMargin {
    var min: Double = Double.MaxValue
  }

  private[graft] def gdTrain(feats: DataFrame): (Array[Long], Long) =
    gdTrain(feats, null)

  private[graft] def gdTrain(feats: DataFrame,
                             margin: BoundaryMargin): (Array[Long], Long) = {
    val rows = feats
      .select(col("doc_id"), col("bucket"), col("x"), col("ymu"))
      .collect() // bounded: ≤ qclfTrainN × 67 rows
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2),
        r.getLong(3)))
    val byDoc = rows.groupBy(_._1).values.toArray
    val n = byDoc.length.toLong
    val w = new Array[Long](nB + 3)
    if (n == 0L) return (w, 0L)
    for (_ <- 1 to qclfEpochs) {
      val grad = new Array[Long](nB + 3)
      byDoc.foreach { fs =>
        var zmu = 0L
        fs.foreach { case (_, b, x, _) => zmu += x * w(b + 3) }
        val v = 1000000.0 /
          (1.0 + math.exp(-(zmu.toDouble / 1000000.0)))
        if (margin != null) {
          val d = math.abs((v - math.floor(v)) - 0.5)
          if (d < margin.min) margin.min = d
        }
        val pmu = math.floor(v + 0.5).toLong
        val errmu = pmu - fs.head._4
        fs.foreach { case (_, b, x, _) => grad(b + 3) += errmu * x }
      }
      var b = 0
      while (b < grad.length) {
        // Scala Long division truncates toward zero ≙ Spark DIV; the
        // oracle replays truncation by sign-splitting DuckDB's //
        w(b) -= grad(b) / (lrDen * n)
        b += 1
      }
    }
    (w, n)
  }

  /** `pipe_qclf_train`: the trained weight relation (bucket −1 =
    * bias), bit-identical to the oracle's CTE-replayed training.
    */
  def train(spark: SparkSession, sfDir: String): DataFrame = {
    val s2 = Graft.ensureConf(spark)
    import s2.implicits._
    val (w, _) = trainWeights(spark, sfDir)
    w.zipWithIndex.map { case (wmu, i) => (i.toLong - 3L, wmu) }
      .toSeq.toDF("bucket", "w_mu")
      .orderBy(col("bucket"))
  }

  /** `pipe_qclf_score`: every corpus document scored by the trained
    * model — micro-unit probability, thresholded verdict, teacher
    * label, and agreement (the distillation-fidelity audit column).
    * One narrow feature pass + one ≤65-row broadcast lookup; the
    * corpus never feeds training.
    */
  def score(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val (w, _) = trainWeights(spark, sfDir)
    scoreFrom(
      featureRows(Graft.tableParallel(spark, sfDir, "documents")), w)
  }

  /** The scoring view over any (doc_id, bucket, x, ymu) feature
    * relation — shared by the batch and streaming faces.
    */
  private[graft] def scoreFrom(feats: DataFrame,
                               w: Array[Long]): DataFrame =
    feats
      .groupBy(col("doc_id"), col("ymu"))
      .agg(sum(col("x") * wLookup(w)).as("zmu"))
      .withColumn("score_mu",
        expr("CAST(floor(1000000.0 / (1.0 + exp(-(CAST(zmu AS DOUBLE) " +
          "/ 1000000.0))) + 0.5) AS BIGINT)"))
      .select(col("doc_id"), col("score_mu"),
        (col("score_mu") >= 500000L).as("predicted"),
        (col("ymu") === 1000000L).as("label"),
        ((col("score_mu") >= 500000L) === (col("ymu") === 1000000L))
          .as("agree"))
      .orderBy(col("doc_id"))

  /** `pipe_qclf_eval`: the model-quality report — corpus counts,
    * thresholded agreement, and the EXACT tie-corrected ROC AUC via
    * integer midranks: scores collapse to a per-value matrix (bounded
    * by the 1e6+1-value score DOMAIN, never the corpus), midrank·2 =
    * 2·(count below) + count(tied) + 1 keeps everything integer, and
    * AUC = (Σ_pos midrank·2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg) is
    * one final q6 division — bitwise cross-engine, no float ranking
    * anywhere. (The Mann–Whitney identity; ties contribute the exact
    * 1/2 the statistical definition assigns them.)
    */
  def eval(spark: SparkSession, sfDir: String): DataFrame =
    evalFrom(score(spark, sfDir))

  /** The midrank-AUC report over any scored relation - shared by the
    * full-corpus eval and the held-out calibration face. The `below`
    * cumulative runs through `GlobalRank.withPrefixSum` (the axis-
    * tagged range-shuffle family), NOT a global-order window: the
    * per-value matrix is score-DOMAIN-bounded so a window would pass
    * the fixtures, but it was the one remaining empty-partition window
    * funnel in the codebase.
    */
  private def evalFrom(scored: DataFrame): DataFrame = {
    val byScore = scored.groupBy(col("score_mu"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("agree"), 1L).otherwise(0L)).as("agr"))
    val (withBelow, _) = graft.core.GlobalRank.withPrefixSum(
      byScore, Seq(col("score_mu")), "cnt", "below")
    withBelow
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("agr")).as("n_agree"),
        sum(col("pos") * (lit(2L) * col("below") + col("cnt") + 1L))
          .as("mid2"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        ParityMath.q6(col("n_agree").cast("double") /
          col("n").cast("double")).as("agree_frac"),
        ParityMath.q6(
          (col("mid2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              (col("n") - col("n_pos")).cast("double"))).as("auc"))
  }

  /** Calibrated decision threshold: the score_mu cut maximizing
    * thresholded teacher agreement ON THE TRAINING SAMPLE (candidates:
    * the sample's distinct scores plus the predict-nothing cut
    * 1000001; ties break to the smallest cut). The sample is bounded
    * (`doc_id < qclfTrainN`), so selection folds on the driver - the
    * gdTrain posture - and the oracle replays the identical integer
    * argmax in SQL. This closes the r9 gap between ranking quality
    * (AUC 0.96) and the fixed-0.5 thresholded agreement (0.878): the
    * sigmoid is distilled from a discrete teacher, so nothing pins its
    * natural cut to one half.
    */
  private[graft] def calThreshold(spark: SparkSession,
                                  sfDir: String): Long = {
    Graft.ensureConf(spark)
    val (w, _) = trainWeights(spark, sfDir)
    val pairs = scoreFrom(
      featureRows(Graft.tableParallel(spark, sfDir, "documents")
        .filter(col("doc_id") < qclfTrainN)), w)
      .select(col("score_mu"), col("label"))
      .collect() // bounded: <= qclfTrainN rows
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val cands = (pairs.map(_._1).distinct :+ 1000001L).sorted
    val best = cands.map { th =>
      val agree = pairs.count { case (s, y) => (s >= th) == y }
      (th, agree)
    }.maxBy { case (th, a) => (a.toLong, -th) } // ties: smallest cut
    best._1
  }

  /** `pipe_qclf_cal`: the HELD-OUT evaluation (docs the training
    * sample never saw, `doc_id >= qclfTrainN`) at both the default 0.5
    * cut and the training-calibrated cut - the honest generalization
    * numbers `pipe_qclf_eval`'s full-corpus distillation audit (which
    * includes the 300 training docs) does not give.
    */
  def cal(spark: SparkSession, sfDir: String): DataFrame = {
    Graft.ensureConf(spark)
    val (w, _) = trainWeights(spark, sfDir)
    val theta = calThreshold(spark, sfDir)
    val held = scoreFrom(
      featureRows(Graft.tableParallel(spark, sfDir, "documents")
        .filter(col("doc_id") >= qclfTrainN)), w)
    val byScore = held.groupBy(col("score_mu"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("agree"), 1L).otherwise(0L)).as("agr"),
        sum(when((col("score_mu") >= theta) === col("label"), 1L)
          .otherwise(0L)).as("agr_cal"))
    val (withBelow, _) = graft.core.GlobalRank.withPrefixSum(
      byScore, Seq(col("score_mu")), "cnt", "below")
    withBelow
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("agr")).as("n_agree"), sum(col("agr_cal")).as("n_cal"),
        sum(col("pos") * (lit(2L) * col("below") + col("cnt") + 1L))
          .as("mid2"))
      .select(lit(theta).as("theta_mu"), col("n"), col("n_pos"),
        (col("n") - col("n_pos")).as("n_neg"),
        ParityMath.q6(col("n_agree").cast("double") /
          col("n").cast("double")).as("agree_default"),
        ParityMath.q6(col("n_cal").cast("double") /
          col("n").cast("double")).as("agree_cal"),
        ParityMath.q6(
          (col("mid2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              (col("n") - col("n_pos")).cast("double"))).as("auc"))
  }

  // ---- DuckDB oracles -------------------------------------------------

  private val h48 = HashParity.hex48Duck("md5(term)")

  /** Feature/label CTEs over a docs CTE named `$src`, emitting
    * feat_$tag(doc_id, bucket, x) and lab_$tag(doc_id, ymu).
    */
  private def featCtes(src: String, tag: String): String =
    s"""toks_$tag AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
       |    '[a-z0-9]+')) AS term
       |  FROM $src
       |), h_$tag AS (
       |  SELECT doc_id, $h48 AS h FROM toks_$tag
       |), sig_$tag AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
       |      AS n_tokens,
       |    CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
       |      x -> x IN (${TextAnalysis.stopList}))) AS BIGINT)
       |      AS stop_cnt,
       |    CASE WHEN len(regexp_extract_all(text, '\\S+')) >= 1
       |      THEN ${ParityMath.q6Sql(
            s"""CAST(len(list_filter(regexp_extract_all(text, '\\S+'),
               |  x -> x IN (${TextAnalysis.stopList}))) AS DOUBLE)
               | / CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE)"""
              .stripMargin)} END AS stop_ratio
       |  FROM $src
       |), lab_$tag AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN n_tokens BETWEEN ${QualityGate.minTokens}
       |           AND ${QualityGate.maxTokens}
       |         AND COALESCE(stop_ratio >= ${QualityGate.minStopRatio},
       |                      FALSE)
       |      THEN 1000000 ELSE 0 END AS ymu
       |  FROM sig_$tag
       |), feat_$tag AS MATERIALIZED (
       |  SELECT doc_id, CAST(h % $nB AS BIGINT) AS bucket,
       |    CAST(sum(CASE WHEN (h // $nB) % 2 = 0 THEN 1 ELSE -1 END)
       |      AS BIGINT) AS x
       |  FROM h_$tag GROUP BY 1, 2
       |  HAVING sum(CASE WHEN (h // $nB) % 2 = 0 THEN 1 ELSE -1 END) != 0
       |  UNION ALL
       |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT)
       |  FROM lab_$tag
       |  UNION ALL
       |  SELECT doc_id, CAST(-2 AS BIGINT), LEAST(n_tokens, 64) // 8
       |  FROM sig_$tag
       |  UNION ALL
       |  SELECT doc_id, CAST(-3 AS BIGINT), LEAST(stop_cnt, 64) // 8
       |  FROM sig_$tag
       |)""".stripMargin

  /** The epoch chain: w0 = zeros, then per epoch the z/p/gradient/
    * update CTEs — ends in w$qclfEpochs.
    */
  private def epochCtes: String = {
    val sb = new StringBuilder
    sb ++= s"""nT AS MATERIALIZED (SELECT count(*) AS n FROM lab_t),
       |w0 AS MATERIALIZED (
       |  SELECT CAST(unnest(range(-3, $nB)) AS BIGINT) AS bucket,
       |    CAST(0 AS BIGINT) AS wmu
       |)""".stripMargin
    for (e <- 1 to qclfEpochs) {
      sb ++= s"""
         |, z$e AS (
         |  SELECT f.doc_id, SUM(f.x * w.wmu) AS zmu
         |  FROM feat_t f JOIN w${e - 1} w USING (bucket) GROUP BY 1
         |), p$e AS (
         |  SELECT doc_id,
         |    CAST(floor(1000000.0 / (1.0 + exp(-(CAST(zmu AS DOUBLE)
         |      / 1000000.0))) + 0.5) AS BIGINT) AS pmu
         |  FROM z$e
         |), g$e AS (
         |  SELECT f.bucket, SUM((p.pmu - l.ymu) * f.x) AS g
         |  FROM feat_t f
         |  JOIN p$e p USING (doc_id)
         |  JOIN lab_t l USING (doc_id)
         |  GROUP BY 1
         |), w$e AS MATERIALIZED (
         |  -- truncation toward zero ≙ the Spark side's Long division
         |  SELECT w.bucket, w.wmu -
         |    (CASE WHEN COALESCE(g.g, 0) >= 0
         |          THEN COALESCE(g.g, 0) // ($lrDen * n.n)
         |          ELSE -((-COALESCE(g.g, 0)) // ($lrDen * n.n)) END)
         |    AS wmu
         |  FROM w${e - 1} w
         |  LEFT JOIN g$e g USING (bucket)
         |  CROSS JOIN nT n
         |)""".stripMargin
    }
    sb.toString
  }

  val trainSql: String =
    s"""WITH tr AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $qclfTrainN
       |), ${featCtes("tr", "t")}, $epochCtes
       |SELECT bucket, CAST(wmu AS BIGINT) AS w_mu
       |FROM w$qclfEpochs ORDER BY bucket""".stripMargin

  /** CTE chain from the raw table through training to the per-doc
    * scored relation `scored(doc_id, score_mu, ymu)` — shared by the
    * score and eval oracles.
    */
  private def scoredCtes: String =
    s"""tr AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $qclfTrainN
       |), ${featCtes("tr", "t")}, $epochCtes,
       |${featCtes("documents", "a")},
       |zA AS (
       |  SELECT f.doc_id, SUM(f.x * w.wmu) AS zmu
       |  FROM feat_a f JOIN w$qclfEpochs w USING (bucket) GROUP BY 1
       |), scored AS MATERIALIZED (
       |  SELECT l.doc_id,
       |    CAST(floor(1000000.0 / (1.0 + exp(-(CAST(z.zmu AS DOUBLE)
       |      / 1000000.0))) + 0.5) AS BIGINT) AS score_mu,
       |    l.ymu
       |  FROM lab_a l JOIN zA z USING (doc_id)
       |)""".stripMargin

  val scoreSql: String =
    s"""WITH $scoredCtes
       |SELECT doc_id, score_mu,
       |  score_mu >= 500000 AS predicted,
       |  ymu = 1000000 AS label,
       |  (score_mu >= 500000) = (ymu = 1000000) AS agree
       |FROM scored
       |ORDER BY doc_id""".stripMargin

  val evalSql: String =
    s"""WITH $scoredCtes, by_score AS (
       |  SELECT score_mu, count(*) AS cnt,
       |    sum(CASE WHEN ymu = 1000000 THEN 1 ELSE 0 END) AS pos,
       |    sum(CASE WHEN (score_mu >= 500000) = (ymu = 1000000)
       |             THEN 1 ELSE 0 END) AS agr
       |  FROM scored GROUP BY 1
       |), cum AS (
       |  SELECT score_mu, cnt, pos, agr,
       |    COALESCE(sum(cnt) OVER (ORDER BY score_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS below
       |  FROM by_score
       |), tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(sum(agr) AS BIGINT) AS n_agree,
       |    CAST(sum(pos * (2 * below + cnt + 1)) AS BIGINT) AS mid2
       |  FROM cum
       |)
       |SELECT n, n_pos, n - n_pos AS n_neg,
       |  ${ParityMath.q6Sql(
          "CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)")} AS agree_frac,
       |  ${ParityMath.q6Sql(
          """CAST(mid2 - n_pos * (n_pos + 1) AS DOUBLE)
            |  / (2.0 * CAST(n_pos AS DOUBLE)
            |     * CAST(n - n_pos AS DOUBLE))""".stripMargin)} AS auc
       |FROM tot""".stripMargin

  /** The held-out calibration oracle: replay training, select the
    * agreement-argmax cut over the TRAINING docs' scores (ties to the
    * smallest cut - matches the driver fold), then the held-out
    * report at both cuts.
    */
  val calSql: String =
    s"""WITH $scoredCtes, trs AS (
       |  SELECT score_mu, ymu FROM scored WHERE doc_id < $qclfTrainN
       |), cands AS (
       |  SELECT DISTINCT score_mu AS th FROM trs
       |  UNION SELECT CAST(1000001 AS BIGINT)
       |), agrt AS (
       |  SELECT c.th,
       |    (SELECT count(*) FROM trs t
       |     WHERE (t.score_mu >= c.th) = (t.ymu = 1000000)) AS a
       |  FROM cands c
       |), theta AS (
       |  SELECT th FROM agrt ORDER BY a DESC, th ASC LIMIT 1
       |), ho AS (
       |  SELECT s.score_mu, s.ymu, t.th
       |  FROM scored s CROSS JOIN theta t
       |  WHERE s.doc_id >= $qclfTrainN
       |), by_score AS (
       |  SELECT score_mu, count(*) AS cnt,
       |    sum(CASE WHEN ymu = 1000000 THEN 1 ELSE 0 END) AS pos,
       |    sum(CASE WHEN (score_mu >= 500000) = (ymu = 1000000)
       |             THEN 1 ELSE 0 END) AS agr,
       |    sum(CASE WHEN (score_mu >= th) = (ymu = 1000000)
       |             THEN 1 ELSE 0 END) AS agr_cal
       |  FROM ho GROUP BY 1
       |), cum AS (
       |  SELECT cnt, pos, agr, agr_cal,
       |    COALESCE(sum(cnt) OVER (ORDER BY score_mu
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS below
       |  FROM by_score
       |), tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(sum(agr) AS BIGINT) AS n_agree,
       |    CAST(sum(agr_cal) AS BIGINT) AS n_cal,
       |    CAST(sum(pos * (2 * below + cnt + 1)) AS BIGINT) AS mid2
       |  FROM cum
       |)
       |SELECT (SELECT CAST(th AS BIGINT) FROM theta) AS theta_mu,
       |  n, n_pos, n - n_pos AS n_neg,
       |  ${ParityMath.q6Sql(
          "CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)")} AS agree_default,
       |  ${ParityMath.q6Sql(
          "CAST(n_cal AS DOUBLE) / CAST(n AS DOUBLE)")} AS agree_cal,
       |  ${ParityMath.q6Sql(
          """CAST(mid2 - n_pos * (n_pos + 1) AS DOUBLE)
            |  / (2.0 * CAST(n_pos AS DOUBLE)
            |     * CAST(n - n_pos AS DOUBLE))""".stripMargin)} AS auc
       |FROM tot""".stripMargin
}
