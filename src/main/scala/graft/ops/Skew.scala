package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling patterns, demonstrated with oracle-proven equivalence to
  * their naive formulations.
  *
  * The transfers fact table has only 5 token values, so any shuffle keyed by
  * `contract_address` alone concentrates the whole table on 5 reducers — at
  * 100 TB, 5 straggler tasks. Both operators below spread each hot key over
  * [[Salts]] deterministic salt buckets first. (Salts derive from data
  * columns, not `rand()`: the correctness gate hash-compares results, and
  * nondeterministic salting would still be *correct* but untestable —
  * determinism costs nothing here.)
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles the
  * same problem reactively at runtime; explicit salting is the declarative
  * form that also covers aggregations, which AQE does not split.
  */
object Skew {
  import Num._

  val Salts = 16

  /** Rows one reducer task should own before a key gets salted. Tiny here
    * so test data produces a non-trivial plan; at scale it is the rows
    * that fit a task's memory/runtime budget. */
  val TargetRowsPerTask = 2000L

  /** Salting-factor plan from the key histogram — the PLANNING half of the
    * salted-agg/join pair: one cheap grouped count over the fact table
    * (map-side combinable; the histogram is |keys|-sized, not |rows|-sized)
    * emits per key its row count and `ceil(rows/target)` salt buckets.
    * Keys that fit one task keep factor 1 (salting them would only buy
    * shuffle overhead). At 100 TB this query IS the driver of adaptive
    * salting: run it on a sample or yesterday's stats, broadcast the
    * factors, and the salted operators consume them instead of a global
    * constant. */
  def skewPlan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy("contract_address")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("salt_factor",
        expr(s"(n_rows + $TargetRowsPerTask - 1) div $TargetRowsPerTask"))
      .withColumn("salted", col("salt_factor") > 1)
      .orderBy("contract_address")

  /** Two-phase salted aggregation: partial per (token, salt) — 5×16 groups
    * spread across the cluster — then final per token. Result provably equal
    * to the direct single-key aggregation (same oracle). */
  def saltedVolume(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .withColumn("salt", col("block_number") % Salts)
      .groupBy("contract_address", "salt")
      .agg(dsumDec(col("value")).as("pvol"), count(lit(1)).as("pn"))
      .groupBy("contract_address")
      .agg(sum(col("pvol")).cast("double").as("volume"), sum(col("pn")).as("n"))
      .orderBy("contract_address")

  /** Salted join: the skewed fact side salts its key; the (replicable) dim
    * side explodes once per salt value, so the join key (token, salt) spreads
    * each hot token over [[Salts]] partitions. With a 5-row dim you would
    * broadcast instead — this shape is for a dim too large to broadcast
    * joined against a skewed fact. Oracle: the plain join. */
  def saltedJoinVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val market = tokenMarket(spark)
      .withColumn("salt", explode(sequence(lit(0L), lit(Salts - 1L))))
    Tables.transfers(spark, sfDir)
      .withColumn("salt", col("block_number") % Salts)
      .join(market, Seq("contract_address", "salt"))
      .groupBy("contract_address", "circulating_supply")
      .agg(dsum(col("value")).as("volume"))
      .withColumn("volume_share",
        round(col("volume") / col("circulating_supply"), 6))
      .orderBy("contract_address")
  }

  /** Value-tier table for the theta-join demo: (tier, lo, hi) half-open
    * ranges covering every FINITE double (±1e308 bounds; NaN compares
    * false against both bounds in both engines and matches no tier — the
    * oracle mirrors the same literals, so the two sides agree exactly). */
  val ValueTiers: Seq[(String, Double, Double)] = Seq(
    ("t1_small", -1e308, 10.0), ("t2_mid", 10.0, 100.0), ("t3_large", 100.0, 1e308))

  /** Salted THETA join: a pure non-equi predicate (`value ∈ [lo, hi)`, no
    * equality key) that Spark would otherwise run as a nested-loop join —
    * fine when one side broadcasts, a single-task disaster when neither
    * does. The salt becomes a synthetic equi key: the fact side salts
    * round-robin, the predicate side replicates once per salt, and the
    * equi-join on `salt` spreads the cartesian pairing across [[Salts]]
    * buckets with the theta predicate refining inside each — the
    * distributed nested-loop pattern for two large sides. Oracle: the
    * plain inequality join. */
  def saltedThetaTiers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiers = ValueTiers.toDF("tier", "lo", "hi")
      .withColumn("salt", explode(sequence(lit(0L), lit(Salts - 1L))))
    Tables.transfers(spark, sfDir)
      // pmod + null fallback: plain % is negative for negative keys and
      // null for null keys — either would silently drop the row from the
      // equi-join (tiers only carry salts 0..Salts-1)
      .withColumn("salt",
        coalesce(pmod(col("block_number"), lit(Salts.toLong)), lit(0L)))
      .join(tiers, Seq("salt"))
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("volume"))
      .orderBy("tier")
  }

  /** Literal market lookup — stands in for the reference's per-token
    * Coingecko HTTP fetches (reference: common/Coingecko.scala:8-55:
    * circulating supply + id/name/symbol/logo), modeled as a joinable table.
    * Mirrored in the oracle as VALUES. */
  val TokenMarket: Seq[(String, Double)] = Seq(
    ("click", 125000.0), ("error", 50000.0), ("purchase", 350000.0),
    ("signup", 75000.0), ("view", 500000.0))

  /** (token, name, symbol, decimals, logo) — the tokensCollection scalars
    * (reference: databases/Arango.scala:16-25). */
  val TokenInfo: Seq[(String, String, String, Int, String)] = Seq(
    ("click", "Click Token", "CLK", 18, "clk.png"),
    ("error", "Error Token", "ERR", 18, "err.png"),
    ("purchase", "Purchase Token", "PUR", 8, "pur.png"),
    ("signup", "Signup Token", "SGN", 18, "sgn.png"),
    ("view", "View Token", "VIW", 6, "viw.png"))

  def tokenMarket(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TokenMarket.toDF("contract_address", "circulating_supply")
  }

  def tokenInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TokenInfo.toDF("contract_address", "name", "symbol", "decimals", "logo")
  }
}
