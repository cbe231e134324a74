package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd dot product of two int arrays, accumulated in a long — the
  * scoring kernel for quantized (int8-range) embeddings (SURVEY §7.3 tier
  * (b), same ladder rung as [[DecimalDot]]).
  *
  * Unlike the double kernel there is no rounding question at all: products
  * of int8-range components (|x| ≤ 127) and any realistic dimensionality
  * stay far inside a long (dim 2^46 would be needed to overflow), so the
  * sum is exact integer arithmetic — order-independent by construction,
  * and the DuckDB oracle's `SUM(CAST(a[i] AS BIGINT) * b[i])` is the same
  * integer. This is the point of scalar quantization at 100 TB: scoring
  * becomes one tight integer loop over 4× fewer bytes than the float
  * vectors, with bit-identical results on any engine.
  *
  * Null semantics mirror [[DecimalDot]]: null arrays, unequal lengths and
  * null elements all yield null.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // see DecimalDot: null is produced from non-null inputs (length mismatch,
  // null elements), so nullability must not derive from the children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${IntDot.Name} expects (array<int>, array<int>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = 0L
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getInt(i).toLong * b.getInt(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  val Name = "graft_idot"

  /** Idempotent fallback registration for sessions built without
    * [[graft.plans.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => IntDot(exprs(0), exprs(1)),
      "built-in")
}
