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
}
