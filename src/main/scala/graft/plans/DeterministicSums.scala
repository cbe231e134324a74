package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Engine-level determinism enforcement as an injected optimizer rule.
  *
  * `SUM(double)` accumulates in partition order, so its last-ulp value
  * varies with partitioning — which breaks this engine's hash-compared
  * correctness contract for any query a user writes with a plain `sum`.
  * This rule rewrites every `sum(<double>)` inside an `Aggregate` into
  * `CAST(sum(CAST(x AS DECIMAL(27,6))) AS DOUBLE)`: exact, order-independent
  * accumulation with the result rendered back as double. Output aliases keep
  * their names and expression ids, so downstream plan references are
  * untouched.
  *
  * Registered through the public `spark.experimental.extraOptimizations`
  * hook ([[register]]) — no session rebuild needed; the same class drops
  * into `SparkSessionExtensions.injectOptimizerRule` for cluster-wide
  * deployment. DECIMAL(27,6) bounds: 1e21 absolute sum at µ-precision 1e-6,
  * wide enough for value-like metrics; widen per-deployment if needed.
  */
object DeterministicSums extends Rule[LogicalPlan] {

  private val AccType = DecimalType(27, 6)

  private def rewriteSum(e: Expression): Expression = e match {
    // DISTINCT sums are left alone: the pre-aggregation cast would merge
    // values that differ below the accumulator precision.
    case ae @ AggregateExpression(Sum(child, mode), _, false, _, _)
        if child.dataType == DoubleType =>
      Cast(ae.copy(aggregateFunction = Sum(Cast(child, AccType), mode)),
        DoubleType)
    case other => other.mapChildren(rewriteSum)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.copy(aggregateExpressions = agg.aggregateExpressions.map {
        case a @ Alias(child, name) =>
          val rewritten = rewriteSum(child)
          if (rewritten eq child) a
          else Alias(rewritten, name)(a.exprId, a.qualifier,
            a.explicitMetadata, a.nonInheritableMetadataKeys)
        case other => other.mapChildren(rewriteSum)
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
      })
  }

  /** Idempotently attach to a running session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
