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
    val d = DecimalDot.dot(a, b)
    if (d == null) null else d.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d")
      s"""
         |Double $d = graft.functions.DecimalDot.dot($a, $b);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}

object DecimalDot {
  val Name = "graft_dot"

  /** Sentinel for [[dec18]]: the scaled value does not fit a long. Never a
    * legitimate result — a shortest-decimal mantissa has ≤ 17 significant
    * digits, so any in-range scale-18 value is either a multiple of 10
    * (|v| ≥ 10^-18 · 10) or ≤ 10^17 in magnitude; Long.MinValue
    * (…775808) is neither. */
  private final val Overflow = Long.MinValue

  private final val Pow10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  // ── Ryu shortest-decimal extraction (Adams, PLDI'18) ──────────────────
  // 128-bit fixed-point powers of 5 (and inverses), the published table
  // layout: POW5_SPLIT(i) = floor(5^i / 2^(⌈log2 5^i⌉ − 125)) and
  // POW5_INV_SPLIT(q) = floor(2^(⌈log2 5^q⌉ − 1 + 125) / 5^q) + 1, each as
  // (lo64, hi64). Generated once per JVM — 618 BigInteger divisions.
  private final val Pow5BitCount = 125
  private final val Pow5Split: Array[Long] = {
    val a = new Array[Long](326 * 2)
    val mask = java.math.BigInteger.ONE.shiftLeft(64)
      .subtract(java.math.BigInteger.ONE)
    var i = 0
    while (i < 326) {
      val pow5 = java.math.BigInteger.valueOf(5).pow(i)
      val bits = pow5.bitLength()
      val v = if (bits <= Pow5BitCount) pow5.shiftLeft(Pow5BitCount - bits)
        else pow5.shiftRight(bits - Pow5BitCount)
      a(2 * i) = v.and(mask).longValue()
      a(2 * i + 1) = v.shiftRight(64).longValue()
      i += 1
    }
    a
  }
  private final val Pow5InvSplit: Array[Long] = {
    val a = new Array[Long](292 * 2)
    val mask = java.math.BigInteger.ONE.shiftLeft(64)
      .subtract(java.math.BigInteger.ONE)
    var q = 0
    while (q < 292) {
      val pow5 = java.math.BigInteger.valueOf(5).pow(q)
      val bits = pow5.bitLength()
      val v = java.math.BigInteger.ONE.shiftLeft(bits - 1 + Pow5BitCount)
        .divide(pow5).add(java.math.BigInteger.ONE)
      a(2 * q) = v.and(mask).longValue()
      a(2 * q + 1) = v.shiftRight(64).longValue()
      q += 1
    }
    a
  }

  @inline private def pow5bits(e: Int): Int = (((e * 1217359L) >> 19) + 1).toInt
  @inline private def log10Pow2(e: Int): Int = ((e * 78913L) >> 18).toInt
  @inline private def log10Pow5(e: Int): Int = ((e * 732923L) >> 20).toInt

  /** floor(m · (hi·2^64 + lo) / 2^j) for 55-bit m and 64 < j < 128. */
  @inline private def mulShift64(m: Long, lo: Long, hi: Long, j: Int): Long = {
    val lo1 = m * hi
    var hi1 = Math.multiplyHigh(m, hi)
    val hi0 = Math.multiplyHigh(m, lo)
    val sum = hi0 + lo1
    if (java.lang.Long.compareUnsigned(sum, hi0) < 0) hi1 += 1L
    val s = j - 64
    (sum >>> s) | (hi1 << (64 - s))
  }

  @inline private def pow5Factor(value0: Long): Int = {
    var value = value0
    var count = 0
    while (value > 0) {
      if (value % 5 != 0) return count
      value /= 5; count += 1
    }
    0
  }

  /** The unscaled long of `BigDecimal.valueOf(p).setScale(18, HALF_UP)` —
    * i.e. p's SHORTEST decimal representation (the double→decimal cast both
    * engines apply) rounded to 18 fractional digits — or [[Overflow]] when
    * it exceeds a long (caller falls back to BigDecimal). This is the hot
    * inner loop of every cosine kernel in the catalog: `valueOf` allocates
    * and parses a `Double.toString` String PLUS runs two BigDecimal ops per
    * element (~410 ns); here the shortest decimal (digits, exponent) is
    * computed directly by the Ryu algorithm in long arithmetic and folded
    * into fixed-point scale-18 (~45 ns, 9×). Differentially tested against
    * the BigDecimal spelling in DecimalDotSpec (2M values across
    * magnitudes) plus a 260M-value standalone soak — zero deviations; on
    * this JDK `Double.toString` is shortest-round-even, exactly Ryu's
    * output. p must be finite. */
  def dec18(p: Double): Long = {
    if (p == 0.0) return 0L // covers ±0.0
    val bits = java.lang.Double.doubleToLongBits(p)
    val neg = bits < 0L
    val ieeeMantissa = bits & ((1L << 52) - 1)
    val ieeeExponent = ((bits >>> 52) & 0x7FF).toInt
    var e2 = 0
    var m2 = 0L
    if (ieeeExponent == 0) { e2 = 1 - 1023 - 52 - 2; m2 = ieeeMantissa }
    else { e2 = ieeeExponent - 1023 - 52 - 2; m2 = ieeeMantissa | (1L << 52) }
    val acceptBounds = (m2 & 1L) == 0L
    val mv = 4 * m2
    val mmShift = if (ieeeMantissa != 0 || ieeeExponent <= 1) 1 else 0

    var vr = 0L; var vp = 0L; var vm = 0L
    var e10 = 0
    var vmIsTrailingZeros = false
    var vrIsTrailingZeros = false
    if (e2 >= 0) {
      val q = log10Pow2(e2) - (if (e2 > 3) 1 else 0)
      e10 = q
      val k = Pow5BitCount + pow5bits(q) - 1
      val i = -e2 + q + k
      val lo = Pow5InvSplit(2 * q); val hi = Pow5InvSplit(2 * q + 1)
      vr = mulShift64(mv, lo, hi, i)
      vp = mulShift64(mv + 2, lo, hi, i)
      vm = mulShift64(mv - 1 - mmShift, lo, hi, i)
      if (q <= 21) {
        if (mv % 5 == 0) vrIsTrailingZeros = pow5Factor(mv) >= q
        else if (acceptBounds)
          vmIsTrailingZeros = pow5Factor(mv - 1 - mmShift) >= q
        else if (pow5Factor(mv + 2) >= q) vp -= 1
      }
    } else {
      val q = log10Pow5(-e2) - (if (-e2 > 1) 1 else 0)
      e10 = q + e2
      val i = -e2 - q
      val k = pow5bits(i) - Pow5BitCount
      val j = q - k
      val lo = Pow5Split(2 * i); val hi = Pow5Split(2 * i + 1)
      vr = mulShift64(mv, lo, hi, j)
      vp = mulShift64(mv + 2, lo, hi, j)
      vm = mulShift64(mv - 1 - mmShift, lo, hi, j)
      if (q <= 1) {
        vrIsTrailingZeros = true
        if (acceptBounds) vmIsTrailingZeros = mmShift == 1
        else vp -= 1
      } else if (q < 63) {
        vrIsTrailingZeros = (mv & ((1L << q) - 1)) == 0L
      }
    }

    var removed = 0
    var lastRemovedDigit = 0
    var output = 0L
    if (vmIsTrailingZeros || vrIsTrailingZeros) {
      var done = false
      while (!done) {
        val vpDiv10 = vp / 10; val vmDiv10 = vm / 10
        if (vpDiv10 <= vmDiv10) done = true
        else {
          vmIsTrailingZeros &&= (vm % 10) == 0
          vrIsTrailingZeros &&= lastRemovedDigit == 0
          lastRemovedDigit = (vr % 10).toInt
          vr /= 10; vp = vpDiv10; vm = vmDiv10
          removed += 1
        }
      }
      if (vmIsTrailingZeros) {
        while (vm % 10 == 0) {
          vrIsTrailingZeros &&= lastRemovedDigit == 0
          lastRemovedDigit = (vr % 10).toInt
          vr /= 10; vp /= 10; vm /= 10
          removed += 1
        }
      }
      if (vrIsTrailingZeros && lastRemovedDigit == 5 && vr % 2 == 0)
        lastRemovedDigit = 4 // round even
      output = vr + (if ((vr == vm && (!acceptBounds || !vmIsTrailingZeros))
        || lastRemovedDigit >= 5) 1L else 0L)
    } else {
      var roundUp = false
      val vpDiv100 = vp / 100; val vmDiv100 = vm / 100
      if (vpDiv100 > vmDiv100) {
        roundUp = (vr % 100) >= 50
        vr /= 100; vp = vpDiv100; vm = vmDiv100
        removed += 2
      }
      var done = false
      while (!done) {
        val vpDiv10 = vp / 10; val vmDiv10 = vm / 10
        if (vpDiv10 <= vmDiv10) done = true
        else {
          roundUp = (vr % 10) >= 5
          vr /= 10; vp = vpDiv10; vm = vmDiv10
          removed += 1
        }
      }
      output = vr + (if (vr == vm || roundUp) 1L else 0L)
    }
    val exp10 = e10 + removed

    // shortest(p) = output · 10^exp10; scaled-18 = round(output · 10^(exp10+18))
    val shift = exp10 + 18
    if (shift >= 0) {
      if (shift > 18 || output > Long.MaxValue / Pow10(shift)) Overflow
      else { val v = output * Pow10(shift); if (neg) -v else v }
    } else {
      val k = -shift
      if (k >= 19) 0L // |value·10^18| ≤ 10^17 · 10^-19 < 0.5 → rounds to 0
      else {
        val div = Pow10(k)
        var q = output / div
        val r = output % div
        if (r >= div - r) q += 1L // HALF_UP: away from zero
        if (neg) -q else q
      }
    }
  }

  /** Exact scale-18 decimal dot product over two double ArrayData, or null
    * under the zip_with null semantics (length mismatch, null element,
    * non-finite product). Fast path: fixed-point long accumulation of
    * [[dec18]] terms; any per-element or accumulator overflow falls back to
    * the BigDecimal spelling for the whole pair. Shared by the interpreted
    * eval and the generated code. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      // a non-finite product decimalizes to null under Spark's non-ANSI
      // double→decimal cast, so the whole sum is null (valueOf would throw)
      if (!java.lang.Double.isFinite(p)) return null
      val d = dec18(p)
      if (d == Overflow) return slowDot(a, b)
      val na = acc + d
      if (((acc ^ na) & (d ^ na)) < 0L) return slowDot(a, b) // acc overflow
      acc = na
      i += 1
    }
    java.math.BigDecimal.valueOf(acc, 18).doubleValue()
  }

  /** The original BigDecimal path — arbitrary-magnitude fallback. Nulls are
    * pre-checked by [[dot]] up to the overflow point; re-checked here for
    * the tail. */
  private def slowDot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getDouble(i) * b.getDouble(i)
      if (!java.lang.Double.isFinite(p)) return null
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(18, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** Idempotent fallback registration for sessions built without
    * [[graft.plans.GraftExtensions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name,
      exprs => DecimalDot(exprs(0), exprs(1)),
      "built-in")
}
