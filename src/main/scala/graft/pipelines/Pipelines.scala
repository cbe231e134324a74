package graft.pipelines

import graft.Tables
import graft.io.Sinks
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's four executable pipelines as library entry points — a
  * user of the reference can call these instead of its `App` objects
  * (reference: src/main/scala/etl/{TransferEnricher,WalletEnricher,
  * DappEnricher,EnhanceTokenEnricher}.scala).
  *
  * Key structural change (SURVEY §7.4.6): no driver-side token loops — every
  * stage keeps `contract_address` as a grouping column and computes ALL
  * tokens in one distributed pass; per-token whale thresholds come from a
  * joined market lookup instead of per-token HTTP fetches
  * (reference: common/Coingecko.scala). Sinks are upsert-by-key parquet
  * (idempotent under retry — the property the reference's wall-clock keys
  * break, SURVEY §4.6).
  */
object Pipelines {

  private val Dec = DecimalType(25, 2)
  val HolderThreshold = 100.0
  /** Whale ratio applied to each token's circulating supply (reference:
    * src/main/scala/etl/WalletEnricher.scala:24-25 semantics). */
  val WhaleRatio = 0.001

  /** Raw load (TransferEnricher): deterministic edge rows, upserted by
    * `_key` — re-running the load is a no-op. */
  def rawLoad(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Sinks.upsertParquet(spark, Keys.transferEdges(spark, sfDir),
      "_key", "block_number", s"$outDir/transfers")

  /** Double-entry legs for all tokens: (token, address, t, delta). */
  private def legsAll(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    t.select(col("contract_address"), col("from_address").as("address"),
        Num.hourBucket(col("transact_at")).as("t"), negate(col("value")).as("delta"))
      .unionByName(
        t.select(col("contract_address"), col("to_address").as("address"),
          Num.hourBucket(col("transact_at")).as("t"), col("value").as("delta")))
  }

  /** Per-(token, wallet, hour) running balance with holder/whale flags —
    * the all-token generalization of [[graft.ops.Balances]]; one shuffle
    * keyed by (token, address), window reuses it. */
  def walletStates(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("contract_address", "address").orderBy("t")
    val market = Skew.tokenMarket(spark)
      .withColumn("whale_threshold", col("circulating_supply") * WhaleRatio)
      .select("contract_address", "whale_threshold")
    legsAll(spark, sfDir)
      .groupBy("contract_address", "address", "t")
      .agg(sum(col("delta").cast(Dec)).as("ddelta"))
      .withColumn("balance",
        sum(col("ddelta")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .withColumn("prev_balance", lag(col("balance"), 1).over(w))
      .join(broadcast(market), Seq("contract_address"))
      .withColumn("is_holder",
        when(col("balance") > HolderThreshold
          || (col("prev_balance") > HolderThreshold && col("balance").isNull), true)
          .otherwise(false))
      .withColumn("is_whale", col("balance") >= col("whale_threshold"))
  }

  /** Wallet enrichment (WalletEnricher): one document per (token, wallet)
    * with the `map<t, struct(is_whale, balance)>` change log. */
  def walletDocuments(spark: SparkSession, sfDir: String): DataFrame =
    ChangeLogs.perKey(
        walletStates(spark, sfDir)
          .withColumn("k", concat_ws("_", col("contract_address"), col("address"))),
        col("k"), col("t"),
        struct(col("is_whale"), col("balance")), "balanceChangeLogs")
      .withColumnRenamed("k", "_key")
      .withColumn("address", substring_index(col("_key"), "_", -1))

  def enrichWallets(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Sinks.upsertParquet(spark,
      walletDocuments(spark, sfDir).withColumn("ver", lit(1L)),
      "_key", "ver", s"$outDir/wallets")

  /** Dapp enrichment (DappEnricher): one document per (token, dapp) with the
    * sorted counterparty wallet list (deterministic; the reference's
    * collect_list order is run-dependent). */
  def dappDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = Tables.dapps(spark)
      .select(col("dapp_id"), col("dapp_name"), explode(col("addresses")).as("address"))
    legsAll(spark, sfDir)
      .join(broadcast(reg), Seq("address"))
      .groupBy("contract_address", "dapp_id", "dapp_name")
      .agg(sort_array(collect_set(col("address"))).as("address"),
        count(lit(1)).as("n_interactions"))
      .select(
        concat_ws("_", col("contract_address"), col("dapp_id")).as("_key"),
        col("dapp_id").as("idCMC"), col("dapp_name").as("name"),
        col("address"), col("n_interactions"))
  }

  def enrichDapps(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Sinks.upsertParquet(spark,
      dappDocuments(spark, sfDir).withColumn("ver", lit(1L)),
      "_key", "ver", s"$outDir/dapps")

  /** Token enrichment (EnhanceTokenEnricher): one document per token holding
    * every change-log map the reference stores — computed as grouped
    * aggregations over shared scans and stitched with tiny per-token joins
    * (5 rows a side, broadcast), not the reference's 9-frame
    * monotonically_increasing_id reduce-join. */
  def tokenDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    val tok = col("contract_address")

    // volume + tx-count maps from ONE scan/shuffle: both change logs
    // aggregate out of the same hourly frame in a single pass (the reference
    // re-scans its source once per metric — SURVEY §4, caching absent).
    val volumeAndTxMaps = ChangeLogs.perKeyMulti(
      t.groupBy(tok, Num.hourBucket(col("transact_at")).as("t"))
        .agg(Num.dsum(col("value")).as("volume"), count(lit(1)).as("n")),
      tok, col("t"), Seq(
        col("volume") -> "tradingVolumeChangeLogs",
        col("n") -> "numberOfTransferChangeLogs"))

    // one grouped (token, hour, address) frame feeds BOTH the unique-wallet
    // map (rows per (token, hour) = distinct addresses) and the cluster map.
    val perAddrHourly = t
      .select(tok, Num.hourBucket(col("transact_at")).as("t"),
        explode(array(col("from_address"), col("to_address"))).as("address"))
      .groupBy(tok, col("t"), col("address"))
      .agg(count(lit(1)).as("n"))

    val uniqueMap = ChangeLogs.perKey(
      perAddrHourly.groupBy(tok, col("t")).agg(count(lit(1)).as("u")),
      tok, col("t"), col("u"), "numberOfAddressChangeLogs")

    val avgMap = ChangeLogs.perKey(
      t.groupBy(tok, Num.dayBucket(col("transact_at")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("avg", col("n").cast("double") / 24.0), // reference quirk C3
      tok, col("d"), col("avg"), "averageNumberOfTransactionPerDay")

    val reg = Tables.dapps(spark)
      .select(col("dapp_id"), explode(col("addresses")).as("address"))
    val dappMap = ChangeLogs.perKey(
      legsAll(spark, sfDir)
        .join(broadcast(reg), Seq("address"))
        .groupBy(tok, col("t"))
        .agg(countDistinct("dapp_id").as("nd")),
      tok, col("t"), col("nd"), "numberOfDappChangeLogs")

    // holder + whale maps share the (expensive) windowed wallet-state
    // subtree: one pass produces both counts, then both maps.
    val holderAndWhaleMaps = ChangeLogs.perKeyMulti(
      walletStates(spark, sfDir)
        .groupBy(tok, col("t"))
        .agg(sum(col("is_holder").cast("int")).as("h"),
          sum(col("is_whale").cast("int")).as("w")),
      tok, col("t"), Seq(
        col("h") -> "numberOfHolderChangeLogs",
        col("w") -> "numberOfWhaleWalletChangeLogs"))

    val empty = array().cast("array<string>")
    val clusterMap = ChangeLogs.perKey(
      perAddrHourly
        .withColumn("cluster", Clusters.clusterOf(col("n")))
        .groupBy(tok, col("t"))
        .pivot("cluster", Seq("LOW", "MEDIUM", "HIGH"))
        .agg(sort_array(collect_list(col("address"))))
        .select(tok, col("t"), struct(
          struct(coalesce(col("LOW"), empty).as("addresses")).as("LOW"),
          struct(coalesce(col("MEDIUM"), empty).as("addresses")).as("MEDIUM"),
          struct(coalesce(col("HIGH"), empty).as("addresses")).as("HIGH"))
          .as("clusters")),
      tok, col("t"), col("clusters"), "walletClusterByNumberOfTransfer")

    val info = Skew.tokenMarket(spark)
      .join(Skew.tokenInfo(spark), Seq("contract_address"))
      .select(tok, col("contract_address").as("address"),
        col("circulating_supply"), col("name"), col("symbol"),
        col("decimals"), col("logo"))

    Seq(volumeAndTxMaps, uniqueMap, avgMap, dappMap, holderAndWhaleMaps,
        clusterMap)
      .foldLeft(info)((acc, m) => acc.join(m, Seq("contract_address"), "left"))
      .withColumn("_key", col("contract_address"))
      .orderBy("contract_address")
  }

  def enrichTokens(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Sinks.upsertParquet(spark,
      tokenDocuments(spark, sfDir).withColumn("ver", lit(1L)),
      "_key", "ver", s"$outDir/tokens")
}
