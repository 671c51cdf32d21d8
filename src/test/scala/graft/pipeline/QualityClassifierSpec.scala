package graft.pipeline

import graft.SparkSpec

/** The learned quality filter: integer-GD logistic regression over the
  * hashing-trick features, distilling the heuristic teacher labels.
  */
class QualityClassifierSpec extends SparkSpec {

  test("training is deterministic and the weights actually move") {
    val w1 = QualityClassifier.train(spark, sfDir).collect()
    val w2 = QualityClassifier.train(spark, sfDir).collect()
    assert(w1.map(_.toString).toSeq == w2.map(_.toString).toSeq,
      "two trainings must land bit-identical weights")
    assert(w1.length == TextAnalysis.hashfeatBuckets + 3)
    assert(w1.exists(_.getLong(1) != 0L), "all-zero weights: GD never ran")
  }

  test("corpus agreement beats the majority-class baseline " +
       "(the model learned something, not just the prior)") {
    val rows = QualityClassifier.score(spark, sfDir).collect()
    val n = rows.length
    assert(n > 0)
    val agree = rows.count(_.getBoolean(4))
    val pos = rows.count(_.getBoolean(3))
    val majority = math.max(pos, n - pos).toDouble / n
    info(f"n=$n pos=$pos agree=${agree.toDouble / n}%.4f " +
      f"majority=$majority%.4f")
    assert(pos > 0 && pos < n,
      s"degenerate teacher labels on the fixture ($pos/$n positive)")
    assert(agree.toDouble / n > majority,
      f"agreement ${agree.toDouble / n}%.4f must beat the " +
        f"majority baseline $majority%.4f")
  }

  test("eval: exact midrank AUC beats coin-flip and counts match") {
    val r = QualityClassifier.eval(spark, sfDir).collect().head
    val (n, nPos, nNeg) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == nPos + nNeg && nPos > 0 && nNeg > 0)
    val auc = r.getDouble(4)
    info(f"auc=$auc%.4f agree=${r.getDouble(3)}%.4f")
    assert(auc > 0.5, f"AUC $auc%.4f must beat random ranking")
    assert(auc <= 1.0)
  }

  test("qclf store == one-shot score after parity-split ingest " +
       "(training docs straddle the batches — retrain sees the union)") {
    val stored = SignatureStore.gatedQclf(spark, sfDir)
      .collect().map(_.toString).toSeq
    val oneShot = QualityClassifier.score(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(stored == oneShot)
  }

  test("classifier hashed features are bit-identical to the gated " +
       "hashfeat relation (parity is spec-enforced, not structural)") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val fromClf = QualityClassifier.featureRows(docs)
      .filter(org.apache.spark.sql.functions.col("bucket") >= 0)
      .select("doc_id", "bucket", "x")
      .collect().map(_.toString).sorted.toSeq
    val fromHashfeat = TextAnalysis.hashfeatFrom(docs)
      .select("doc_id", "bucket", "w")
      .collect().map(_.toString).sorted.toSeq
    assert(fromClf == fromHashfeat,
      "featureRows' hashed buckets drifted from hashfeatFrom")
  }

  test("sigmoid rounding margin: the accepted libm exp() risk is not " +
       "live on the gated corpus") {
    // a 1-ulp cross-engine exp() disagreement moves 1e6·sigmoid by
    // ~2e-10; the nearest approach to a floor(v+0.5) boundary across
    // the whole training run must dominate that by orders of magnitude
    val m = QualityClassifier.boundaryMargin(spark, sfDir)
    assert(m >= 1e-6,
      f"sigmoid evaluation within $m%.3e of a rounding boundary")
  }

  test("held-out calibration: theta is deterministic, the held-out " +
       "slice excludes the training sample, and the calibrated cut " +
       "does not lose to the default on agreement") {
    val r = QualityClassifier.cal(spark, sfDir).collect().head
    val r2 = QualityClassifier.cal(spark, sfDir).collect().head
    assert(r.toString == r2.toString, "calibration must be deterministic")
    val theta = r.getLong(0)
    assert(theta >= 0L && theta <= 1000001L)
    val nDocs = graft.core.Graft.table(spark, sfDir, "documents").count()
    assert(r.getLong(1) == nDocs - QualityClassifier.qclfTrainN,
      "held-out n must be corpus minus the training sample")
    val (agreeDef, agreeCal) = (r.getDouble(4), r.getDouble(5))
    info(f"theta=$theta agree_default=$agreeDef%.4f agree_cal=$agreeCal%.4f")
    assert(agreeCal >= agreeDef,
      f"calibrated cut ($agreeCal%.4f) lost to the default " +
        f"($agreeDef%.4f) on held-out agreement")
  }

  test("scores are calibrated micro-probabilities in [0, 1e6]") {
    val rows = QualityClassifier.score(spark, sfDir).collect()
    assert(rows.forall { r =>
      val s = r.getLong(1); s >= 0L && s <= 1000000L
    })
    // threshold consistency: predicted == (score_mu >= 500000)
    assert(rows.forall(r => r.getBoolean(2) == (r.getLong(1) >= 500000L)))
  }
}
