package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries (one representative
  * per operator family; SPARK_GRAFT_BENCH_ALL=1 runs everything)
  * against SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * seconds. Results are fully materialized through a noop sink
  * (count() would let Catalyst skip sorts/projections and
  * under-report).
  */
object Bench {

  val headline: Seq[String] = Seq(
    // streamsum core: full pipeline + the cache/query workhorses
    "ss_pipeline_e2e", "ss_transform", "ss_cache_count", "ss_cache_lastn",
    "ss_q_counts_for_subj_action", "ss_q_topk_per_subj",
    "ss_q_sort_variants", "ss_undo_lastn",
    // streaming faces
    "ss_stream_count", "ss_stream_lastn", "ss_stream_lsh_cand",
    // analytics
    "q1_agg", "q3_join_agg", "q5_multijoin", "q_window", "q_sessionize",
    "q_asof_join",
    // training-data pipeline
    "dd_exact", "dd_minhash_lsh", "dd_ngram_jaccard", "dd_simhash",
    "dd_embed_cosine", "ann_topk_brute", "ann_lsh_bucketed", "ann_ivf",
    "txt_stats", "txt_fingerprint",
    "mm_binary_stats", "pipe_corpus_clean")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up on the smallest SF so per-query numbers
    // reflect steady-state execution, not first-call compilation.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    val selected =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.toSeq.sortBy(_._1)
      else headline.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    // SPARK_GRAFT_BENCH_REPS=n (default 1): per-query median of n runs
    // - machine contention makes single-shot numbers ±50% noisy; the
    // median keeps the driver's run cheap by default but lets a local
    // perf investigation measure structurally.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
    val results = selected.map {
      case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (System.nanoTime() - t0) / 1e9
        }.sorted
        name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // release the per-(session, corpus) memos - the bench touched two
    // corpora (warm-up SF + bench SF) and nothing should stay pinned
    graft.core.Transform.releaseAll(spark)
    graft.pipeline.SignatureStore.releaseAll(spark)
    spark.stop()
  }
}
