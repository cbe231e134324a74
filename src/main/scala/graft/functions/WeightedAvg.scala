package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Exact weighted average as a `DeclarativeAggregate` — the pure-expression
  * custom-aggregate tier (buffers and transitions are Catalyst expressions,
  * so the whole aggregate lives inside whole-stage codegen; contrast with
  * the imperative [[TopKAggregator]] whose buffer is opaque).
  *
  * Accumulates Σ(value·weight) and Σ(weight) in DECIMAL (order-independent
  * — required by the engine's hash-compared oracle gate) and evaluates to
  * DOUBLE at the edge, matching the oracle's
  * `CAST(SUM(CAST(v*w AS DECIMAL)) AS DOUBLE) / CAST(SUM(...) AS DOUBLE)`.
  *
  * Overflow semantics (mirrors [[graft.plans.DeterministicSums]]'s bound
  * note): DECIMAL(30,8) holds |Σ| < 1e22. Under non-ANSI casts an
  * overflowing accumulator addition yields NULL, which then propagates —
  * the aggregate returns NULL, indistinguishable from the legitimate
  * all-null / zero-weight NULL. Enable ANSI mode to fail loudly on
  * overflow, or widen `sumType` for deployments with larger magnitudes.
  */
case class WeightedAvg(value: Expression, weight: Expression)
    extends DeclarativeAggregate {

  private val sumType = DecimalType(30, 8)

  private lazy val sumVW = AttributeReference("sumVW", sumType)()
  private lazy val sumW = AttributeReference("sumW", sumType)()

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumVW, sumW)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Decimal(0), sumType), Literal(Decimal(0), sumType))

  override lazy val updateExpressions: Seq[Expression] = {
    val vw = (value * weight).cast(sumType)
    val w = weight.cast(sumType)
    Seq(
      If(value.isNull || weight.isNull, sumVW, (sumVW + vw).cast(sumType)),
      If(value.isNull || weight.isNull, sumW, (sumW + w).cast(sumType)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    (sumVW.left + sumVW.right).cast(sumType),
    (sumW.left + sumW.right).cast(sumType))

  override lazy val evaluateExpression: Expression =
    If(sumW === Literal(Decimal(0), sumType),
      Literal(null, DoubleType),
      sumVW.cast(DoubleType) / sumW.cast(DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedAvg =
    copy(value = newChildren(0), weight = newChildren(1))
}

object WeightedAvg {
  val Name = "graft_wavg"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => WeightedAvg(exprs(0), exprs(1)), "built-in")
}
