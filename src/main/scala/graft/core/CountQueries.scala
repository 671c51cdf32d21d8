package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The reference's count-cache query API
  * (/root/reference/src-clj/streamsum/tuple_counts/query_api.clj and the
  * Java interfaces CountSummary/Queries/TupleComparators), re-expressed
  * as DataFrame transformations over the count-cache state
  * (`Caches.countState` ≙ the nested {s {a {o [count t]}}} structure,
  * flattened relationally).
  *
  * Every function returns a DataFrame - no driver-side collect - so the
  * same API scales from a point lookup to a full-cache scan; Catalyst
  * pushes the subject/action filters into the aggregation upstream.
  * The `…From(state)` variants run against any count-state relation
  * (schema: s, a, o, cnt, last_t); the (spark, sfDir) variants derive
  * the state from the events table first.
  */
object CountQueries {

  private def counts(spark: SparkSession, sfDir: String): DataFrame =
    Caches.countState(Transform.transformed(spark, sfDir)).drop("cache")

  /** CountSummary.getCount(s,a,o): point lookup; absent keys surface as
    * [o 0 null], ≙ query_api.clj CountSummaryImpl.getCount's
    * (new-CountTriple obj [0 nil]).
    */
  def getCountFrom(state: DataFrame, s: Long, a: String, o: Long): DataFrame = {
    val key = state.sparkSession.range(1).select(
      lit(s).as("s"), lit(a).as("a"), lit(o).as("o"))
    key.join(state, Seq("s", "a", "o"), "left")
      .select(col("s"), col("a"), col("o"),
              coalesce(col("cnt"), lit(0L)).as("cnt"), col("last_t"))
  }

  def getCount(spark: SparkSession, sfDir: String,
               s: Long, a: String, o: Long): DataFrame =
    getCountFrom(counts(spark, sfDir), s, a, o)

  /** CountSummary.actionsForSubj: distinct actions per subject (exposed
    * for all subjects - the distributed generalization of the per-key
    * call; filter s to recover the point API).
    */
  def actionsForSubjFrom(state: DataFrame): DataFrame =
    state.select(col("s"), col("a")).distinct()

  def actionsForSubj(spark: SparkSession, sfDir: String): DataFrame =
    actionsForSubjFrom(counts(spark, sfDir))

  /** CountSummary.countsForSubjAction(s, actions...): per-object counts
    * merged across the selected actions - sum of counts, max of times,
    * ≙ query_api.clj `merge-leaves`/`counts-for-actions-map`.
    */
  def countsForSubjActionFrom(state: DataFrame,
                              actions: Seq[String]): DataFrame =
    state.filter(col("a").isin(actions: _*))
      .groupBy(col("s"), col("o"))
      .agg(sum(col("cnt")).as("cnt"), max(col("last_t")).as("last_t"))

  def countsForSubjAction(spark: SparkSession, sfDir: String,
                          actions: Seq[String]): DataFrame =
    countsForSubjActionFrom(counts(spark, sfDir), actions)

  /** CountSummary.sumCounts(s) and sumCounts(s, actions...): total event
    * count per subject, plus the action-filtered total in the same pass
    * (conditional aggregation instead of a second scan).
    */
  def sumCountsFrom(state: DataFrame, actions: Seq[String]): DataFrame =
    state.groupBy(col("s"))
      .agg(sum(col("cnt")).as("total"),
           sum(when(col("a").isin(actions: _*), col("cnt")).otherwise(0L))
             .as("filtered_total"))

  def sumCounts(spark: SparkSession, sfDir: String,
                actions: Seq[String]): DataFrame =
    sumCountsFrom(counts(spark, sfDir), actions)

  /** Queries.tuplesForSubjAction(comparator, subj, actions) with the
    * countTimeComparator(descending) of TupleComparators.java: the
    * flattened [s a o count time] tuples, count-desc then time-desc
    * (key columns break remaining ties deterministically).
    */
  def tuplesSortedFrom(state: DataFrame): DataFrame =
    state.select(col("s"), col("a"), col("o"), col("cnt"), col("last_t"))
      .orderBy(col("cnt").desc, col("last_t").desc,
               col("s"), col("a"), col("o"))

  def tuplesSorted(spark: SparkSession, sfDir: String): DataFrame =
    tuplesSortedFrom(counts(spark, sfDir))

  /** All six TupleComparators orderings (time/count/count-time ×
    * asc/desc, TupleComparators.java) in one relation: each variant
    * tags its rows and ranks them (key columns break ties so the result
    * is deterministic where the reference's comparators were not).
    */
  val sortVariants: Seq[(String, Seq[org.apache.spark.sql.Column])] = {
    import org.apache.spark.sql.functions.{col => c}
    Seq(
      "time_asc" -> Seq(c("last_t").asc),
      "time_desc" -> Seq(c("last_t").desc),
      "count_asc" -> Seq(c("cnt").asc),
      "count_desc" -> Seq(c("cnt").desc),
      "count_time_asc" -> Seq(c("cnt").asc, c("last_t").asc),
      "count_time_desc" -> Seq(c("cnt").desc, c("last_t").desc))
  }

  /** Global rank without the global-window scale-killer: range
    * partition on the full (unique) order key, sort within partitions,
    * then zipWithIndex - rank = partition-local index + the cumulative
    * size of earlier (range-ordered) partitions. A `Window.orderBy`
    * with no partitionBy funnels the whole relation through ONE task;
    * this computes the identical rank with the sort spread across all
    * partitions. zipWithIndex's size-count pass reuses the same shuffle
    * output as the main pass (one RDD lineage), so the partitioning the
    * offsets were computed from is exactly the partitioning the rows
    * carry - unlike a self-join on spark_partition_id(), where the two
    * sides may re-sample different range bounds.
    */
  private def rankedGlobally(state: DataFrame, name: String,
                             order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = state.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = state
      .select(col("s"), col("a"), col("o"), col("cnt"), col("last_t"))
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("rk", LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
      .select(lit(name).as("ordering"), col("rk"),
        col("s"), col("a"), col("o"), col("cnt"), col("last_t"))
  }

  def sortedVariantsFrom(state: DataFrame): DataFrame = {
    // one computation of the count state feeds all six rankings
    // (without the persist each union branch re-aggregates from the
    // events scan)
    val shared = state.persist()
    sortVariants.map { case (name, order) =>
      rankedGlobally(shared, name,
        order ++ Seq(col("s").asc, col("a").asc, col("o").asc))
    }.reduce(_ unionAll _)
  }

  def sortedVariants(spark: SparkSession, sfDir: String): DataFrame =
    sortedVariantsFrom(counts(spark, sfDir))

  /** Distributed top-k per subject by (count desc, time desc) - the
    * scale-out form of sorting a subject's tuples with
    * countTimeComparator and taking the head: rank within each subject
    * partition, no global sort.
    */
  def topKPerSubjFrom(state: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("s"))
      .orderBy(col("cnt").desc, col("last_t").desc, col("a"), col("o"))
    state.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("s"), col("a"), col("o"), col("cnt"), col("last_t"),
              col("rk"))
  }

  def topKPerSubj(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    topKPerSubjFrom(counts(spark, sfDir), k)

  /** Pipeline metrics ≙ protocols.clj `Metrics` callbacks: counters per
    * processing stage plus per-cache recorded counts, as a single
    * relational result.
    */
  def metrics(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Graft.table(spark, sfDir, "events")
    val tuples = Transform.extract(spark, sfDir)
    val xf = Transform(tuples)
    val stage = events.agg(count(lit(1)).as("n"))
      .select(lit("events-received").as("metric"), col("n"))
      .unionAll(tuples.agg(count(lit(1)).as("n"))
        .select(lit("tuples-extracted").as("metric"), col("n")))
      .unionAll(xf.agg(count(lit(1)).as("n"))
        .select(lit("tuples-transformed").as("metric"), col("n")))
    val perCache = xf.groupBy(col("cache")).agg(count(lit(1)).as("n"))
      .select(concat(lit("recorded-"), col("cache")).as("metric"), col("n"))
    stage.unionAll(perCache)
  }

  /** Encode hook ≙ protocols.clj `Encode`: final transformation of the
    * output tuple stream [cache key val time] into an app-facing
    * representation (here a stable delimited string, the analog of the
    * reference's pluggable encoder), in deterministic stream order.
    */
  def encodeOutput(spark: SparkSession, sfDir: String): DataFrame =
    Transform.transformed(spark, sfDir)
      .select(col("seq"), col("cache"),
        concat_ws("|", col("cache"), col("k"),
          coalesce(col("a"), lit("-")), col("v"), col("t").cast(StringType))
          .as("encoded"))
}
