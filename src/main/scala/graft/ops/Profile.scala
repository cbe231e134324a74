package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling (the Deequ/expectations pattern): per-column
  * completeness and uniqueness metrics for any table, computed in ONE
  * aggregation pass and unpivoted to long format — the report a pipeline
  * gates ingest on before committing a batch at scale.
  *
  * Exact `countDistinct` over k columns expands the scan stream k-fold
  * (Spark's multi-distinct rewrite); that is the right trade at audit
  * granularity, and the HLL twin ([[Metrics.hourlyUniqueWalletsApprox]],
  * MetricsSpec's union-merge test) is the fixed-state form for routine
  * monitoring of very wide tables. */
object Profile {

  /** (column_name, n_null, n_distinct) for every column of `df`. */
  def profileOf(df: DataFrame): DataFrame = {
    val cols = df.columns
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.length}, " +
          cols.map(c => s"'$c', ${c}__nulls, ${c}__distinct").mkString(", ") +
          ") AS (column_name, n_null, n_distinct)"))
      .orderBy("column_name")
  }

  def ordersProfile(spark: SparkSession, sfDir: String): DataFrame =
    profileOf(Tables.orders(spark, sfDir))

  /** Shared with the oracle builder so the SQL mirrors the same columns. */
  val OrdersColumns: Seq[String] = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Skew diagnostics: the top-[[HeavyHitterK]] values of a key column with
    * absolute counts, share of the table, and running cumulative share —
    * the profile that decides whether a 100 TB join/agg on this key needs
    * salting or an AQE skew split BEFORE the job is launched. One map-side
    * combinable count + a TakeOrdered of K rows; the share divisions run on
    * the K-row result against a broadcast scalar total (never a wide
    * window). Ties rank deterministically (count desc, value asc). */
  val HeavyHitterK = 20

  def heavyHitters(df: DataFrame, keyCol: String): DataFrame = {
    // ONE scan: the grouped per-key counts (|distinct keys| rows) are
    // persisted and feed BOTH the top-K and the total (Σn = count(*)) — a
    // separate df.count() would re-read the fact table
    val grouped = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = grouped
      .orderBy(col("n").desc, col("key").asc)
      .limit(HeavyHitterK)
    val total = grouped.agg(sum(col("n")).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counts.crossJoin(broadcast(total)) // K rows × 1-row scalar
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)).cast("long"))
      .withColumn("share",
        round(col("n").cast("double") / col("total").cast("double"), 6))
      .withColumn("cum_share",
        round(sum(col("n").cast("double")).over(w)
          / col("total").cast("double"), 6))
      .select("rnk", "key", "n", "share", "cum_share")
      .orderBy("rnk")
  }

  /** Catalog form: receiver-address skew of the transfer fact — the
    * to_address space is hub-heavy by construction, exactly the shape that
    * silently breaks an unsalted 100 TB groupBy. */
  def transferHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    heavyHitters(Tables.transfers(spark, sfDir), "to_address")
}
