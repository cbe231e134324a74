package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively, built by
  * composition (the brief's preference (a): no custom plan node needed):
  * tag both sides, union, and carry the last observation forward with an
  * ignore-nulls `last` over a (key, time)-ordered running window. Each
  * probe row picks up the latest build-side value at-or-before its
  * timestamp; rows before any observation get null (left semantics).
  *
  * Scale shape: ONE shuffle keyed by the join key for the union'd stream —
  * the same cost as a regular sort-merge join, with no range-explosion. The
  * oracle is DuckDB's native `ASOF LEFT JOIN`, so the composition is proven
  * equivalent to a first-class implementation.
  */
object AsOf {

  /** Sparse "price update" stream derived deterministically from transfers
    * (every 97th block publishes its value as the token price; deduped per
    * (token, ts) so the as-of match is unambiguous). */
  def priceUpdates(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .filter(col("block_number") % 97 === 0)
      .groupBy(col("contract_address"), col("transact_at").as("pt"))
      .agg(max(col("value")).as("price"))

  /** Every transfer priced as-of its timestamp. */
  def transfersWithPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val p = priceUpdates(spark, sfDir).select(
      col("contract_address"), col("pt").as("ts"),
      lit(null).cast("long").as("block_number"),
      lit(null).cast("double").as("value"),
      col("price"), lit(1).as("is_price"))
    val t = Tables.transfers(spark, sfDir).select(
      col("contract_address"), col("transact_at").as("ts"),
      col("block_number"), col("value"),
      lit(null).cast("double").as("price"), lit(0).as("is_price"))
    // price rows sort before transfer rows at equal ts, so a same-second
    // update applies to that second's transfers (DuckDB ASOF `>=` ties)
    val w = Window.partitionBy("contract_address")
      .orderBy(col("ts").asc, col("is_price").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(t)
      .withColumn("price_at", last(col("price"), ignoreNulls = true).over(w))
      .filter(col("is_price") === 0)
      .select(col("contract_address"), col("ts").as("transact_at"),
        col("block_number"), col("value"), col("price_at"))
      .orderBy("contract_address", "transact_at", "block_number")
  }
}
