package graft

import graft.ops.{Quantize, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 scalar quantization: range, reconstruction error bound, and
  * ranking agreement with the exact-cosine baseline. */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  private val sf = GraftSpark.Sf

  test("quantized components stay in [-127, 127] and scales are positive") {
    val bad = Quantize.quantizedVectors(spark, sf)
      .filter(expr(s"exists(q, x -> abs(x) > ${Quantize.QMax}) OR maxabs < 0"))
      .count()
    assert(bad === 0L)
  }

  test("reconstruction error per component is bounded by maxabs/254") {
    // |x - q*maxabs/127| <= (maxabs/127)/2 per component, plus one ulp of
    // slack for the rounding of the scaled value
    val viol = Quantize.quantizedVectors(spark, sf)
      .join(Tables.embeddings(spark, sf).select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")),
        Seq("vec_id"))
      .filter(expr(
        s"""exists(zip_with(v, q, (x, c) ->
           |  abs(x - c * maxabs / ${Quantize.QMax}.0D) >
           |    maxabs / ${2 * Quantize.QMax}.0D * 1.0000001D), b -> b)"""
          .stripMargin))
      .count()
    assert(viol === 0L)
  }

  test("standardized embeddings: per-dimension mean 0, variance 1") {
    val z = Quantize.standardizedEmbeddings(spark, sf)
      .select(col("vec_id"), expr("posexplode(z)").as(Seq("i", "x")))
    val stats = z.groupBy("i").agg(
      avg("x").as("m"), expr("avg(x * x)").as("m2"))
      .collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-6)
      // E[z²] = 1 for sd-scaled dims (rounding at 9 digits is far inside
      // this tolerance); a degenerate all-zero dim would read 0 and fail
      assert(math.abs(r.getAs[Double]("m2") - 1.0) < 1e-3)
    }
  }

  test("quantized top-1 agrees with exact cosine top-1 on most probes") {
    val exact = Similarity.bruteForceTopK(spark, sf)
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("neighbor_id").as("exact_nn"))
    val quant = Quantize.quantizedTopNeighbor(spark, sf)
      .select(col("query_id"), col("neighbor_id").as("q_nn"))
    val joined = exact.join(quant, Seq("query_id"))
    val total = joined.count()
    val agree = joined.filter(col("exact_nn") === col("q_nn")).count()
    assert(total > 0)
    // int8 quantization of 64-dim vectors preserves the top neighbor for
    // the large majority of probes; an agreement collapse means the
    // quantization arithmetic broke
    assert(agree.toDouble / total >= 0.8,
      s"quantized ANN agreement $agree/$total below 0.8")
  }
}
