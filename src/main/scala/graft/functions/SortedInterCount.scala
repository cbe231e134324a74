package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection SIZE of two SORTED arrays of struct<long, string>, by a
  * single merge pass — the set-similarity verification kernel.
  *
  * Replaces `size(array_intersect(a, b))`, whose generic evaluator builds
  * a null/NaN-checked OpenHashSet over one side, probes it per element
  * through closure wrappers, and materializes the matched elements as an
  * output array — only for `size` to throw the array away. Sampled stacks
  * on q_setsim_join's verify stage put ~65% of the whole query's runnable
  * time inside that machinery. The merge pass allocates nothing and
  * compares (long, then bytewise string) exactly like sort_array's struct
  * ordering, so on arrays sorted by that ordering with DISTINCT elements
  * (per-document distinct shingles keyed by their global df) the count is
  * identical to the array_intersect spelling — SetSimProbe and the
  * unchanged all-pairs DuckDB oracle both re-prove it.
  *
  * Inputs MUST be sorted ascending under the (field0, field1) struct
  * ordering and duplicate-free; this expression is private engine
  * plumbing for call sites that construct exactly that (sort_array over
  * per-key distinct collections), not a general SQL surface.
  *
  * Null semantics: null array → null (nullIntolerant); elements and
  * fields are non-null by construction at every call site.
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(Array(f1, f2)), _),
            ArrayType(StructType(Array(g1, g2)), _))
        if f1.dataType == LongType && f2.dataType == StringType &&
          g1.dataType == LongType && g2.dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"${SortedInterCount.Name} expects two array<struct<long, string>>, " +
          s"got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var count = 0L
    while (i < na && j < nb) {
      val sa = a.getStruct(i, 2); val sb = b.getStruct(j, 2)
      val da = sa.getLong(0); val db = sb.getLong(0)
      var c = java.lang.Long.compare(da, db)
      if (c == 0)
        c = sa.getUTF8String(1).binaryCompare(sb.getUTF8String(1))
      if (c == 0) { count += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    count
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  val Name = "graft_sorted_inter_count"

  /** Idempotent fallback registration for sessions built without
    * [[graft.plans.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => SortedInterCount(exprs(0), exprs(1)),
      "built-in")
}
