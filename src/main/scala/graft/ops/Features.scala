package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML feature-engineering operators over relational and vector inputs —
  * the feature-preparation passes a training pipeline runs between raw
  * tables and model input (the reference stops at per-entity documents,
  * e.g. `WalletEnricher.scala:1`; these are the standard next steps).
  *
  * Portability discipline matches the rest of the catalog: every mean is a
  * decimal-exact sum divided once in IEEE doubles, every pseudo-random
  * decision is an md5-digit computation both engines spell identically,
  * and no RNG or `ln` appears anywhere.
  */
object Features {

  /** Leave-one-out target encoding of the customer nation against order
    * totals: each order gets the mean `o_totalprice` of all OTHER orders
    * from the same nation — the standard high-cardinality categorical
    * encoding (LOO prevents the row's own target from leaking into its
    * feature; with the row included, a tree can memorize singletons).
    *
    * Shape: one equi-join orders→customer (nation lookup), one grouped
    * decimal aggregate (25 nation rows), broadcast back onto the order
    * stream — a map-side join, so the encode itself adds NO shuffle over
    * the orders scan at any scale. LOO arithmetic is exact: the group sum
    * and the row's own price subtract in DECIMAL(25,2), and the single
    * division `(S−p)/(n−1)` is one IEEE op over exactly-represented
    * operands — bit-identical across engines and partitionings.
    * Singleton groups (n=1) encode as NULL rather than divide by zero. */
  def targetEncodeNation(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(25,2)").as("p"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val keyed = orders.join(cust, Seq("o_custkey"))
    val stats = keyed.groupBy("c_nationkey")
      .agg(sum(col("p")).as("s"), count(lit(1)).as("n"))
    keyed.join(broadcast(stats), Seq("c_nationkey"))
      .select(col("o_orderkey"), col("c_nationkey"),
        when(col("n") > 1,
          (col("s") - col("p")).cast("double") /
            (col("n") - 1).cast("double")).as("loo_mean"))
      .orderBy("o_orderkey")
  }

  /** Output dimensionality of the random projection. */
  val ProjDims = 8

  /** Sign of projection cell (i, j): +1 iff the first hex digit of
    * `md5(i || '_' || j)` is even — a deterministic Rademacher matrix both
    * engines derive from the same md5 string, no RNG state anywhere. */
  private def signExpr(iExpr: String, j: Int): String =
    s"""CASE WHEN substr(md5(concat(CAST($iExpr AS STRING), '_', '$j')), 1, 1)
       |       IN ('0','2','4','6','8','a','c','e')
       |  THEN 1.0 ELSE -1.0 END""".stripMargin

  /** Johnson–Lindenstrauss random projection to [[ProjDims]] dimensions
    * with a ±1 (Rademacher) matrix: `y_j = Σ_i s(i,j)·x_i`. The sketch
    * that makes downstream distance work cheap — an 8-dim projection of a
    * 64-dim vector is 1/8 the bytes through every later shuffle, and JL
    * bounds pairwise-distance distortion independent of corpus size.
    *
    * ZERO-shuffle: signs are computed per component inside the row
    * (`transform` with index) and each output component folds in-row,
    * left-to-right, in IEEE doubles — a FIXED addition order shared with
    * the oracle's `list_reduce` over the identical transformed list, so
    * the result is bit-stable without the decimal detour (a grouped sum
    * would need it; an in-row fold's order is part of the spec). The
    * whole operator is a narrow projection over the embeddings scan. */
  def randomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = (0 until ProjDims).map { j =>
      expr(
        s"""aggregate(
           |  transform(embedding, (x, i) ->
           |    CAST(x AS DOUBLE) * (${signExpr("i", j)})),
           |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
        .as(s"y$j")
    }
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id") +: cols: _*)
      .orderBy("vec_id")
  }
}
