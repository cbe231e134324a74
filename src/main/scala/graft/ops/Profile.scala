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
}
