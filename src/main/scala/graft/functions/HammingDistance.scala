package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Hamming distance between two equal-length ASCII strings (the
  * simhash bit-string comparator) — SURVEY §7.3's (b) tier: a native
  * Catalyst `Expression` with `doGenCode`, so the byte loop inlines into
  * whole-stage codegen instead of allocating per-row intermediate arrays the
  * way a UDF or a split/zip/filter higher-order pipeline would.
  *
  * Unequal lengths count the length difference as mismatches — callers
  * compare fixed-width fingerprints, so lengths always match in practice.
  *
  * Exposed through the session `FunctionRegistry` ([[HammingDistance.register]])
  * and used as `expr("graft_hamming(a, b)")`.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_hamming expects (string, string), got " +
          s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val n = math.min(a.length, b.length)
    var d = math.abs(a.length - b.length)
    var i = 0
    while (i < n) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ba = ctx.freshName("ba")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |byte[] $ba = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |int $n = Math.min($ba.length, $bb.length);
         |${ev.value} = Math.abs($ba.length - $bb.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ba[$i] != $bb[$i]) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  val Name = "graft_hamming"

  /** Idempotently register `graft_hamming` in the session's function
    * registry; afterwards usable from any `expr(...)`/SQL in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => HammingDistance(exprs(0), exprs(1)),
      "built-in")
}
