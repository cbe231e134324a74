package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join via bin-and-refine.
  *
  * A naive range join (`a.ts BETWEEN iv.s AND iv.e`) plans as a broadcast
  * nested-loop — O(|facts|·|intervals|) comparisons, a non-starter at scale.
  * When intervals are bounded by a bin (here: each campaign window lies
  * inside one calendar day), the join becomes an EQUI-join on (key, bin)
  * followed by a cheap range refine — hash join cost, and the refine prunes
  * locally. Intervals spanning bins generalize by exploding the interval
  * into its overlapped bins first. The oracle runs the plain inequality
  * join, proving the bin-and-refine rewrite exact.
  */
object Intervals {

  /** Deterministic campaign windows: every third day per token, 06:00-18:00. */
  def campaignIntervals(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(col("contract_address"),
        Num.dayBucket(col("transact_at")).as("day"))
      .distinct()
      .filter((col("day") / 86400).cast("long") % 3 === 0)
      .select(col("contract_address"), col("day"),
        (col("day") + 21600).as("s"), (col("day") + 64800).as("e"))

  /** Per-campaign transfer volume through the equi-join-on-bin + refine. */
  def campaignVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
      .select(col("contract_address"),
        Num.dayBucket(col("transact_at")).as("day"),
        col("transact_at"), col("value"))
    t.join(campaignIntervals(spark, sfDir), Seq("contract_address", "day"))
      .filter(col("transact_at") >= col("s") && col("transact_at") < col("e"))
      .groupBy("contract_address", "s")
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("volume"))
      .orderBy("contract_address", "s")
  }
}
