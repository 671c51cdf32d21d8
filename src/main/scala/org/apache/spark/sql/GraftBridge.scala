package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a LogicalPlan
  * (the standard extension-library pattern for custom operators; only
  * `Dataset.ofRows` is touched).
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame from an RDD of InternalRow - keeps derived relations in
    * the Tungsten representation instead of round-tripping through
    * external `Row` ser/de (e.g. the global-rank zip, which would
    * otherwise fall out of codegen'd processing on both edges).
    */
  def ofInternalRows(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Column ⇄ catalyst Expression, for operators whose parameters are
    * not SQL-expressible (e.g. a plan-time centroid matrix).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** True iff the DataFrame's plan is already a materialized leaf
    * (LogicalRDD — what `localCheckpoint`/`ofInternalRows` produce):
    * the signal that a defensive `localCheckpoint()` before an
    * iterative loop would be a pure-overhead second materialization.
    */
  def isMaterializedLeaf(df: DataFrame): Boolean =
    df.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  /** Deterministically release a `localCheckpoint`ed relation's blocks:
    * `Dataset.unpersist` only talks to the CacheManager, so the
    * checkpoint RDD would otherwise stay in `getPersistentRDDs` until
    * the ContextCleaner notices the dropped reference — a release
    * visible only to the GC is not a release a memo teardown can
    * assert on.
    */
  def unpersistMaterialized(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
