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
  * Deployed through [[GraftExtensions]] (`spark.sql.extensions`, active
  * from the session's first query); [[register]] remains as an idempotent
  * `spark.experimental.extraOptimizations` fallback for sessions built
  * without the extension.
  *
  * == Numeric domain (read before relying on the rewrite) ==
  *
  * DECIMAL(27,6) accumulation changes more than last-ulp ordering for
  * inputs outside the engine's value-metric domain — under non-ANSI casts:
  *
  *  - NaN / ±Infinity cast to NULL and are then *skipped* by Sum, so a sum
  *    over data containing them returns a finite number where plain double
  *    summation would return NaN/Infinity;
  *  - |x| ≥ 1e21 casts to NULL (skipped) — the sum silently drops it;
  *  - |x| < 1e-6 rounds to 0 (micro-precision floor).
  *
  * The engine's own tables hold finite value-like metrics, where the
  * rewrite is exact. Deployments whose data may contain non-finite values
  * must either pre-filter them, enable ANSI mode (the cast then fails
  * loudly instead of skipping), or not inject this rule.
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
