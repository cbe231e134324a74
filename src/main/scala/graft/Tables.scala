package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders and the token-transfer view.
  *
  * The reference engine reads token-transfer edges from ArangoDB through a
  * handwritten AQL filter (reference: src/main/scala/etl/BaseEnricher.scala:27-59)
  * and from Postgres through a JDBC subquery
  * (reference: src/main/scala/etl/TransferEnricher.scala:36-51). Here every
  * source is a columnar parquet scan; plain `.filter`/`.select` on top lets
  * Catalyst push predicates and projected columns down to the parquet reader
  * (row-group skipping), which replaces both handwritten source-side filters
  * and scales to arbitrarily many files/partitions on a real cluster.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads with
    * the nanos-as-long legacy flag; [[events]] reads it as epoch-nanos long
    * and exposes `ts_sec` (epoch seconds, exact integer division — a double
    * division at 1e18 magnitude would lose sub-second precision) plus a
    * microsecond-precision `ts_t` timestamp for window/streaming use. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Deterministic token-transfer fact view over `events` (FIXTURES.md §C).
    *
    * Mirrors the reference's transfer schema
    * (reference: databases/Arango.scala:27-39): sender, receiver, token
    * contract, block, log index, amount, epoch-second timestamp. The mapping
    * is pure arithmetic so the DuckDB oracle can derive the identical view
    * (see [[Oracle.transfersCte]]).
    */
  def transfers(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("user_id").cast("string").as("from_address"),
      ((col("user_id") * 7 + col("event_id")) % 1000).cast("string").as("to_address"),
      col("event_type").as("contract_address"),
      col("event_id").as("block_number"),
      (col("event_id") % 100).as("log_index"),
      col("value"),
      col("ts_sec").as("transact_at"))

  /** Token whose analytics the per-token queries compute (the reference loops
    * over a hard-coded token list, reference: constants/Common.scala:4-10;
    * our grouped queries instead keep `contract_address` as a grouping column
    * — scale note SURVEY.md §7.4.6 — but single-token variants exercise
    * predicate pushdown). */
  val FocusToken = "purchase"

  /** Whale balance threshold: stands in for circulatingSupply × threshold the
    * reference fetches from Coingecko per token
    * (reference: common/Coingecko.scala:50-55,
    * src/main/scala/etl/WalletEnricher.scala:24-25). Modeled as a constant
    * lookup so the oracle can repeat it. */
  val WhaleThreshold = 150.0

  /** Holder threshold (reference: constants, holder flag
    * src/main/scala/etl/BaseEnricher.scala:141-155). */
  val HolderThreshold = 100.0

  /** Wallet-cluster bucket bounds (reference: constants/Common.scala:14-15:
    * <10 LOW, [10,20) MEDIUM, >=20 HIGH). */
  val ClusterLow = 10
  val ClusterHigh = 20

  /** Literal dapp registry: stands in for the reference's multiline-JSON dapp
    * source (reference: src/main/scala/etl/DappEnricher.scala:29,
    * utils/Extract0x38Dapp.scala:12-43). Each dapp owns a set of contract
    * addresses; transfers whose counterparty is in the set count as dapp
    * interactions. Mirrored verbatim in [[Oracle.dappsCte]]. */
  val DappRegistry: Seq[(String, String, Seq[String])] = Seq(
    ("d01", "AlphaSwap", Seq("1", "8", "15", "103", "204", "305", "406")),
    ("d02", "BetaLend",  Seq("22", "33", "44", "155", "266", "377", "488")),
    ("d03", "GammaNft",  Seq("5", "55", "505", "550", "555")),
    ("d04", "DeltaDao",  Seq("7", "77", "177", "277", "777", "877", "977")),
    ("d05", "EpsBridge", Seq("12", "120", "212", "312", "412", "512", "612", "712")))

  def dapps(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DappRegistry.toDF("dapp_id", "dapp_name", "addresses")
  }

  /** Dapp images with gaps — exercises null-fill defaulting (reference:
    * src/main/scala/etl/DappEnricher.scala:47-48). Mirrored in oracle SQL. */
  val DappImages: Seq[(String, Option[String])] = Seq(
    ("d01", Some("alpha.png")),
    ("d02", None),
    ("d03", Some("gamma.png")),
    ("d04", None),
    ("d05", Some("eps.png")))
}
