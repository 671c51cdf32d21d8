package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the declarative per-key top-k idiom
  *
  *   df.withColumn("rk", row_number().over(partitionBy(K).orderBy(O)))
  *     .filter($"rk" <= k)
  *
  * into the bounded-heap `TopKPerKeyNode`. The window formulation must
  * SORT every key's whole partition before discarding all but k rows -
  * O(n log n) work and O(n) memory per key; the custom exec keeps a
  * k-element heap per key instead. Users keep writing the standard
  * idiom; the planner transparently substitutes the scalable operator,
  * which is the Catalyst-native way to ship such an optimization
  * (≙ Spark's own InferWindowGroupLimit, which only pre-filters and
  * still sorts - our node removes the sort entirely).
  *
  * Conservative by construction: fires only on a Filter whose single
  * predicate bounds a lone row_number(), rank() or dense_rank() window
  * expression (rk <= k, rk < k, or the flipped forms), with a positive
  * literal k. rank() maps to the tie-retaining heap variant (boundary
  * ties survive, competition ranks out); dense_rank() maps to the
  * distinct-value-bounded variant (the bound caps distinct order
  * values - locally decidable with a k-entry value-group map, though
  * not with a row-bounded heap). Any `WindowGroupLimit` Spark's own
  * optimizer already inserted below the Window is absorbed (the
  * bounded structures subsume its pre-filtering).
  */
case class TopKWindowRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression): Option[(Attribute, Int)] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(rankFn,
          WindowSpecDefinition(partSpec, orderSpec, _)), _)),
          _, _, windowChild, _))
        if rankFn.isInstanceOf[RowNumber] || rankFn.isInstanceOf[Rank] ||
          rankFn.isInstanceOf[DenseRank] =>
      boundOf(cond) match {
        case Some((attr, k))
            if k > 0 && attr.exprId == alias.exprId &&
              partSpec.nonEmpty =>
          // absorb Spark's own rank-limit pre-filter if present
          val child = windowChild match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          val rankAttr = AttributeReference(alias.name, IntegerType,
            nullable = false)(exprId = alias.exprId)
          // row_number: strict k-bounded heap. rank(): tie-retaining
          // heap (the worst tie group survives until >= k rows strictly
          // beat it). dense_rank(): k-distinct-value group map.
          val semantics = rankFn match {
            case _: Rank => RankSemantics.CompetitionRank
            case _: DenseRank => RankSemantics.DenseRank
            case _ => RankSemantics.RowNumber
          }
          TopKPerKeyNode(partSpec, orderSpec, k, child, rankAttr,
            semantics = semantics)
        case _ => f
      }
  }
}

object TopKWindowRewrite {

  /** Idempotently install the rewrite (and the strategy it plans to)
    * on a session built without `GraftExtensions`.
    */
  def install(spark: SparkSession): Unit = {
    TopK.install(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.exists(_.isInstanceOf[TopKWindowRewrite]))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKWindowRewrite(spark)
  }
}
