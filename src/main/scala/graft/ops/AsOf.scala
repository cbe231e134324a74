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

  /** Generic as-of join: every `probes` row gains `outCol` = the latest
    * `updates.valueCol` with `updates.tsCol <= probes.tsCol` on the same
    * `keyCol` (null before the first update — left semantics; same-instant
    * updates apply, matching ASOF `>=` ties: update rows sort before probe
    * rows at equal timestamps). `updates` must be unique per (key, ts). */
  def asofJoin(probes: DataFrame, updates: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val probeExtra = probes.columns.filterNot(c => c == keyCol || c == tsCol)
    val valueType = updates.schema(valueCol).dataType
    val u = updates.select(
      Seq(col(keyCol), col(tsCol)) ++
        probeExtra.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        Seq(col(valueCol).as("__v"), lit(1).as("__upd")): _*)
    val p = probes.select(
      Seq(col(keyCol), col(tsCol)) ++ probeExtra.map(col) ++
        Seq(lit(null).cast(valueType).as("__v"), lit(0).as("__upd")): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__upd").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.unionByName(p)
      .withColumn(outCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__upd") === 0)
      .drop("__v", "__upd")
  }

  /** Every transfer priced by LINEAR INTERPOLATION between the nearest
    * price updates on either side (edges fill with the nearest
    * observation) — time-series resampling onto the transfer timestamps,
    * the companion to [[asofJoin]]'s step-function carry-forward.
    *
    * Same scale shape as the as-of join: tag + union + ONE shuffle on the
    * token key; the backward (last-before) and forward (first-after)
    * observations come from two frames over the SAME window sort, so no
    * second exchange. The interpolation `v0 + (v1-v0)·((t-t0)/(t1-t0))`
    * is a fixed IEEE-double chain over identical inputs — bit-identical
    * in any engine, no decimal detour needed (nothing is re-associated).
    * Probes at an update's exact timestamp take that update (the formula
    * degenerates to v0). `t1 > t0` always: updates are unique per
    * (key, ts) and a same-instant update sorts into the backward frame. */
  def interpolatedPrices(spark: SparkSession, sfDir: String): DataFrame = {
    val probes = Tables.transfers(spark, sfDir)
      .select(col("contract_address"), col("transact_at"),
        col("block_number"), col("value"))
    val updates = priceUpdates(spark, sfDir)
      .withColumnRenamed("pt", "transact_at")
    interpolateJoin(probes, updates, "contract_address", "transact_at",
        "price", "price_interp")
      .orderBy("contract_address", "transact_at", "block_number")
  }

  /** Generic interpolation join (see [[interpolatedPrices]] for the
    * contract): every `probes` row gains `outCol` interpolated between
    * the nearest `updates.valueCol` observations on either side of its
    * `tsCol`. `updates` must be unique per (key, ts); `valueCol` and
    * `tsCol` must be numeric. */
  def interpolateJoin(probes: DataFrame, updates: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val probeExtra = probes.columns.filterNot(c => c == keyCol || c == tsCol)
    val u = updates.select(
      Seq(col(keyCol), col(tsCol)) ++
        probeExtra.map(c => lit(null).cast(probes.schema(c).dataType).as(c)) ++
        Seq(col(valueCol).cast("double").as("__v"), lit(1).as("__upd")): _*)
    val p = probes.select(
      Seq(col(keyCol), col(tsCol)) ++ probeExtra.map(col) ++
        Seq(lit(null).cast("double").as("__v"), lit(0).as("__upd")): _*)
    val order = Seq(col(tsCol).asc, col("__upd").desc)
    val wp = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def updOnly(c: String) = when(col("__upd") === 1, col(c))
    u.unionByName(p)
      .withColumn("__t0", last(updOnly(tsCol), ignoreNulls = true).over(wp))
      .withColumn("__v0", last(updOnly("__v"), ignoreNulls = true).over(wp))
      .withColumn("__t1", first(updOnly(tsCol), ignoreNulls = true).over(wn))
      .withColumn("__v1", first(updOnly("__v"), ignoreNulls = true).over(wn))
      .filter(col("__upd") === 0)
      .withColumn(outCol,
        when(col("__t0").isNull, col("__v1"))
          .when(col("__t1").isNull, col("__v0"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            ((col(tsCol) - col("__t0")) / (col("__t1") - col("__t0")))))
      .drop("__v", "__upd", "__t0", "__v0", "__t1", "__v1")
  }

  /** Every transfer priced as-of its timestamp. */
  def transfersWithPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val probes = Tables.transfers(spark, sfDir)
      .select("contract_address", "transact_at", "block_number", "value")
    val updates = priceUpdates(spark, sfDir)
      .withColumnRenamed("pt", "transact_at")
    asofJoin(probes, updates, "contract_address", "transact_at",
        "price", "price_at")
      .select("contract_address", "transact_at", "block_number", "value",
        "price_at")
      .orderBy("contract_address", "transact_at", "block_number")
  }
}
