package graft.plans

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** User-facing entry for the custom top-k-per-key operator. */
object TopK {

  /** Ensure the planner strategy is installed on this session
    * (idempotent; `GraftExtensions` installs it at build time for
    * sessions constructed with the extension).
    */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[TopKPerKeyStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy(spark)
  }

  /** Top-k rows per key with an appended `rk` rank column (1 = first in
    * `order`). `order` is (columnName, ascending) pairs and must form a
    * total order per key for a deterministic result. Columns are
    * resolved against the (already analyzed) input, so the custom node
    * enters the plan fully bound.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    import org.apache.spark.sql.classic.ClassicConversions._
    val plan = df.queryExecution.analyzed
    val resolve = plan.output.map(a => a.name -> a).toMap
    val keyExprs = keyCols.map(resolve(_))
    val orderExprs = order.map { case (name, asc) =>
      SortOrder(resolve(name), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKeyNode(keyExprs, orderExprs, k, plan))
  }
}
