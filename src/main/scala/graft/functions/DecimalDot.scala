package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd EXACT dot product of two double arrays — the engine's
  * bit-stable-cosine kernel as a native Catalyst `Expression` (SURVEY §7.3
  * tier (b), like [[HammingDistance]]).
  *
  * The contract is the DuckDB oracle's spelling,
  * `CAST(SUM(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE)`: each product is
  * computed in IEEE double, decimalized exactly the way both engines'
  * double→DECIMAL(38,18) cast does (shortest decimal representation —
  * `BigDecimal.valueOf` — rounded to scale 18 HALF_UP), summed EXACTLY
  * (order-independent), and rendered back to double. Spark's
  * posexplode + `sum(decimal)` twin is bit-identical (DecimalDotSpec).
  *
  * This is deliberately NOT equivalent to the interpreted higher-order
  * fold `aggregate(zip_with(...), CAST(0 AS DECIMAL(38,18)), (acc, p) ->
  * CAST(acc + p AS DECIMAL(38,18)))` it replaced: there the intermediate
  * `acc + p` resolves to DECIMAL(38,17) under Spark's decimal-addition
  * precision-loss rule, so the accumulator was rounded to scale 17 at
  * every step — up to a few ulps off the exact sum the oracle computes
  * (hidden in the catalog by `round(cosine, 6)`). The exact loop is both
  * faster and the arithmetic the oracle actually checks.
  *
  * Null semantics mirror zip_with: null arrays, unequal lengths
  * (zip_with pads with null) and null elements all yield null.
  */
case class DecimalDot(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Unequal lengths / null elements produce null even from non-null
    * inputs, so nullability must not be derived from the children (a
    * non-nullable ev.isNull is codegen'd as the literal `false`, which the
    * null-producing branches below would try to assign). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${DecimalDot.Name} expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = java.math.BigDecimal.ZERO
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val p = a.getDouble(i) * b.getDouble(i)
        // a non-finite product decimalizes to null under Spark's non-ANSI
        // double→decimal cast, so the whole sum is null (valueOf would throw)
        if (!java.lang.Double.isFinite(p)) return null
        acc = acc.add(java.math.BigDecimal.valueOf(p)
          .setScale(18, java.math.RoundingMode.HALF_UP))
        i += 1
      }
      acc.doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.math.BigDecimal $acc = java.math.BigDecimal.ZERO;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $p = $a.getDouble($i) * $b.getDouble($i);
         |    if (!java.lang.Double.isFinite($p)) { ${ev.isNull} = true; break; }
         |    $acc = $acc.add(java.math.BigDecimal.valueOf($p)
         |      .setScale(18, java.math.RoundingMode.HALF_UP));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}

object DecimalDot {
  val Name = "graft_dot"

  /** Idempotent fallback registration for sessions built without
    * [[graft.plans.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => DecimalDot(exprs(0), exprs(1)),
      "built-in")
}
