package graft

import graft.functions.DecimalDot
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecimalDotSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("bit-identical to the exact decimal SUM (the oracle's arithmetic)") {
    DecimalDot.register(spark)
    val e = Tables.embeddings(spark, GraftSpark.Sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val pairs = e.join(
      e.select(col("vec_id").as("vb"), col("a").as("b")),
      col("vec_id") % 7 === col("vb") % 11)
      .select(col("vec_id"), col("vb"),
        expr(s"${DecimalDot.Name}(a, b)").as("fast"),
        col("a"), col("b"))
    // the Spark twin of the DuckDB oracle spelling:
    // CAST(SUM(CAST(x*y AS DECIMAL(38,18))) AS DOUBLE) — sum(decimal) is
    // exact, so this is the order-independent exact dot product
    val slow = pairs
      .select(col("vec_id"), col("vb"), col("fast"),
        posexplode(expr("zip_with(a, b, (x, y) -> x * y)")).as(Seq("i", "p")))
      .groupBy("vec_id", "vb", "fast")
      .agg(sum(expr("CAST(p AS DECIMAL(38,18))")).cast("double").as("exact"))
    val diff = slow.filter(col("fast") =!= col("exact") ||
      col("fast").isNull =!= col("exact").isNull)
    assert(diff.isEmpty)
  }

  test("NOT the old higher-order fold: its (38,17) accumulator rounds") {
    // documents why the HOF spelling was replaced — Spark types the
    // intermediate acc + p as DECIMAL(38,17) (precision-loss rule), so the
    // fold rounds the accumulator to scale 17 every step; the exact kernel
    // diverges from it by design on real data (by ulps, pre-round(...,6))
    DecimalDot.register(spark)
    val hofDot =
      """CAST(aggregate(zip_with(a, b, (x, y) -> CAST(x * y AS DECIMAL(38,18))),
        |  CAST(0 AS DECIMAL(38,18)),
        |  (acc, p) -> CAST(acc + p AS DECIMAL(38,18)))
        |AS DOUBLE)""".stripMargin
    val e = Tables.embeddings(spark, GraftSpark.Sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val pairs = e.join(
      e.select(col("vec_id").as("vb"), col("a").as("b")),
      col("vec_id") % 7 === col("vb") % 11)
      .select(expr(s"${DecimalDot.Name}(a, b)").as("fast"),
        expr(hofDot).as("hof"))
    assert(pairs.filter(col("fast") =!= col("hof")).count() > 0)
  }

  test("null semantics mirror zip_with: unequal lengths and nulls give null") {
    DecimalDot.register(spark)
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)), // 11.0
      (Seq(1.0), Seq(1.0, 2.0)) // unequal → null
    ).toDF("a", "b")
      .select(expr(s"${DecimalDot.Name}(a, b)").as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    val withNullArr = Seq(1).toDF("x")
      .select(expr(s"${DecimalDot.Name}(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))"))
      .collect()
    assert(withNullArr(0).isNullAt(0))
    val withNullElem = Seq(1).toDF("x")
      .select(expr(
        s"${DecimalDot.Name}(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d))"))
      .collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("non-finite products give null, matching non-ANSI double->decimal cast") {
    DecimalDot.register(spark)
    // the HOF/oracle spelling decimalizes NaN/Inf to null (cast semantics);
    // the kernel must agree, not throw from BigDecimal.valueOf
    val rows = Seq(
      (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),
      (Seq(Double.PositiveInfinity), Seq(2.0)),
      (Seq(Double.MaxValue), Seq(Double.MaxValue)) // product overflows to Inf
    ).toDF("a", "b")
      .select(expr(s"${DecimalDot.Name}(a, b)").as("d")).collect()
    rows.foreach(r => assert(r.isNullAt(0)))
  }

  test("rejects non-array inputs at analysis") {
    DecimalDot.register(spark)
    assertThrows[AnalysisException](
      Seq((1.0, 2.0)).toDF("a", "b")
        .select(expr(s"${DecimalDot.Name}(a, b)")).collect())
  }

  test("dec18 == BigDecimal.valueOf(p).setScale(18, HALF_UP) across magnitudes") {
    // the round-13 fixed-point fast path must be bit-identical to the
    // BigDecimal spelling for every finite double: exhaustive-by-sampling
    // differential check over 2M values spanning subnormals to 1e21, plus
    // the structured edge set (rounding boundaries, overflow edge, ±0)
    val rnd = new scala.util.Random(20260818L)
    def ref(x: Double): Option[Long] =
      try Some(java.math.BigDecimal.valueOf(x)
        .setScale(18, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
      catch { case _: ArithmeticException => None }
    var i = 0
    while (i < 2000000) {
      val x = (rnd.nextDouble() - 0.5) * 2.0 * math.pow(10, rnd.nextInt(44) - 22)
      ref(x) match {
        case Some(w) => assert(DecimalDot.dec18(x) == w, s"x=$x")
        case None => assert(DecimalDot.dec18(x) == Long.MinValue, s"x=$x")
      }
      i += 1
    }
    val edges = Seq(0.0, -0.0, 1e-19, -1e-19, 5e-19, 4.9e-324, -4.9e-324,
      1.5e-18, 0.5, 0.1, 1.0, -1.0, 1e-3, 9.999999999999999e6, 1e7,
      9.223372036854775, -9.223372036854775, 9.3, 123456.78901234567,
      2.5e-18, 3.5e-18, -2.5e-18, 1.0000000000000002, Double.MinPositiveValue)
    edges.foreach { x =>
      ref(x) match {
        case Some(w) => assert(DecimalDot.dec18(x) == w, s"edge x=$x")
        case None => assert(DecimalDot.dec18(x) == Long.MinValue, s"edge x=$x")
      }
    }
  }

  test("overflow fallback: big products and big accumulations stay exact") {
    DecimalDot.register(spark)
    // per-element overflow (|p·1e18| > Long.Max) and accumulator overflow
    // (sum of in-range terms past Long.Max) must both route to the
    // BigDecimal path and agree with the exact decimal SUM spelling
    val rows = Seq(
      (Seq(3e9, 1.0), Seq(4e9, 2.0)), // element 1.2e19 overflows a long
      (Seq(5.0, 5.0, 5.0), Seq(1.0, 1.0, 1.0)), // fits
      (Seq(3.0, 3.0, 3.0, 3.0), Seq(1.0, 1.0, 1.0, 1.0)), // 12: acc 1.2e19 overflows
      (Seq(-3.0, -3.0, -3.0, -3.0), Seq(1.0, 1.0, 1.0, 1.0)),
      (Seq(1e300, 1.0), Seq(1e-300, 1.0))
    ).toDF("a", "b")
    val got = rows.select(expr(s"${DecimalDot.Name}(a, b)").as("fast"),
      posexplode(expr("zip_with(a, b, (x, y) -> x * y)")).as(Seq("i", "p")))
      .groupBy("fast")
      .agg(sum(expr("CAST(p AS DECIMAL(38,18))")).cast("double").as("exact"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }
}
