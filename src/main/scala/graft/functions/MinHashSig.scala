package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel: for a document's distinct-shingle array,
  * the [[graft.ops.Dedup.NumHashes]] seed-wise minima
  * `m_j = min over sh of md5("j|" + sh)` (lowercase hex, lexicographic
  * min), computed in ONE pass over the array — the whole signature row in
  * a single expression.
  *
  * Replaces the explode → 8×(concat+md5) → hash-aggregate(8 × min(string))
  * spelling, which at sf0.1 burned 36 s of task time on row machinery: the
  * exploded row stream, eight UTF8String concat+md5-hex allocations per
  * shingle, and the aggregate's per-row string minima. Here one
  * thread-local MessageDigest is reused across all seeds and shingles,
  * candidates are compared as raw digest bytes (hex encoding is
  * order-preserving bytewise, so byte minima == hex-string minima — only
  * the eight winners are hex-encoded at the end), and no intermediate rows
  * exist at all. Same arithmetic, same results (DedupSimilaritySpec pins
  * the twin equality; the q_minhash_* oracle checks the values).
  *
  * Null semantics: null array → null; null elements are skipped (the
  * exploded spelling drops them — explode emits no row for a null element
  * only when the element is filtered; collect from shinglesArr never holds
  * nulls — and min(string) ignores nulls). An empty (or all-null) array
  * yields null minima per seed, which the old groupBy spelling simply
  * never emitted a row for; callers filter `size(shs) >= 1` upstream.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${MinHashSig.Name} expects array<string>, got $t")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = MinHashSig.NumHashes
    val md = MinHashSig.digest.get()
    // running minima as raw 16-byte digests, seed-major
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sh = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(('0' + j).toByte)
          md.update('|'.toByte)
          md.update(sh)
          val d = md.digest()
          if (mins(j) == null || MinHashSig.ltUnsigned(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (mins(j) == null) null
        else UTF8String.fromString(MinHashSig.hex(mins(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val Name = "graft_minhash_sig"

  /** Seed count — must equal [[graft.ops.Dedup.NumHashes]]; kept here as
    * the single constant the expression compiles against (the op asserts
    * equality at call-site build). */
  val NumHashes = 8

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private[functions] def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Unsigned bytewise less-than over equal-length (16-byte) digests —
    * identical order to lexicographic compare of their hex strings. */
  private[functions] def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Idempotent fallback registration for sessions built without
    * [[graft.plans.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => MinHashSig(exprs.head),
      "built-in")
}
