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

  // ── Shared per-metric frames for the token documents ─────────────────
  // Each is one grouped aggregation; BOTH document renderings (map-typed
  // library form and JSON-string driver form) assemble from these, so the
  // expensive subtrees exist exactly once in the code.

  private val tok = col("contract_address")

  /** (token, hour, exact-decimal volume, tx count) — one scan/shuffle feeds
    * both the volume and tx-count change logs (the reference re-scans its
    * source once per metric — SURVEY §4, caching absent). */
  private def hourlyVolTx(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(tok, Num.hourBucket(col("transact_at")).as("t"))
      .agg(Num.dsumDec(col("value")).as("volume"), count(lit(1)).as("n"))

  /** One grouped (token, hour, address) frame feeds BOTH the unique-wallet
    * map (rows per (token, hour) = distinct addresses) and the cluster map. */
  private def perAddrHourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .select(tok, Num.hourBucket(col("transact_at")).as("t"),
        explode(array(col("from_address"), col("to_address"))).as("address"))
      .groupBy(tok, col("t"), col("address"))
      .agg(count(lit(1)).as("n"))

  /** (token, day, avg = n/24.0) — the reference's /24 quirk (C3). */
  private def dailyAvg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.transfers(spark, sfDir)
      .groupBy(tok, Num.dayBucket(col("transact_at")).as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("avg", col("n").cast("double") / 24.0)

  /** (token, hour, distinct interacting dapps). */
  private def dappHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = Tables.dapps(spark)
      .select(col("dapp_id"), explode(col("addresses")).as("address"))
    legsAll(spark, sfDir)
      .join(broadcast(reg), Seq("address"))
      .groupBy(tok, col("t"))
      .agg(countDistinct("dapp_id").as("nd"))
  }

  /** (token, hour, holder count, whale count) — one pass over the
    * (expensive) windowed wallet-state subtree produces both counts. */
  private def holderWhaleHourly(spark: SparkSession, sfDir: String): DataFrame =
    walletStates(spark, sfDir)
      .groupBy(tok, col("t"))
      .agg(sum(col("is_holder").cast("int")).as("h"),
        sum(col("is_whale").cast("int")).as("w"))

  /** (token, hour, LOW/MEDIUM/HIGH sorted wallet lists). */
  private def clusterArrays(spark: SparkSession, sfDir: String): DataFrame = {
    val empty = array().cast("array<string>")
    perAddrHourly(spark, sfDir)
      .withColumn("cluster", Clusters.clusterOf(col("n")))
      .groupBy(tok, col("t"))
      .pivot("cluster", Seq("LOW", "MEDIUM", "HIGH"))
      .agg(sort_array(collect_list(col("address"))))
      .select(tok, col("t"),
        coalesce(col("LOW"), empty).as("LOW"),
        coalesce(col("MEDIUM"), empty).as("MEDIUM"),
        coalesce(col("HIGH"), empty).as("HIGH"))
  }

  /** Per-token market/info scalars (broadcastable 5-row dimension). */
  private def infoFrame(spark: SparkSession): DataFrame =
    Skew.tokenMarket(spark)
      .join(Skew.tokenInfo(spark), Seq("contract_address"))
      .select(tok, col("contract_address").as("address"),
        col("circulating_supply"), col("name"), col("symbol"),
        col("decimals"), col("logo"))

  /** Token enrichment (EnhanceTokenEnricher): one document per token holding
    * every change-log map the reference stores — computed as grouped
    * aggregations over shared scans and stitched with tiny per-token joins
    * (5 rows a side, broadcast), not the reference's 9-frame
    * monotonically_increasing_id reduce-join. */
  def tokenDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val volumeAndTxMaps = ChangeLogs.perKeyMulti(
      hourlyVolTx(spark, sfDir)
        .withColumn("volume", col("volume").cast("double")),
      tok, col("t"), Seq(
        col("volume") -> "tradingVolumeChangeLogs",
        col("n") -> "numberOfTransferChangeLogs"))

    val uniqueMap = ChangeLogs.perKey(
      perAddrHourly(spark, sfDir).groupBy(tok, col("t")).agg(count(lit(1)).as("u")),
      tok, col("t"), col("u"), "numberOfAddressChangeLogs")

    val avgMap = ChangeLogs.perKey(dailyAvg(spark, sfDir),
      tok, col("d"), col("avg"), "averageNumberOfTransactionPerDay")

    val dappMap = ChangeLogs.perKey(dappHourly(spark, sfDir),
      tok, col("t"), col("nd"), "numberOfDappChangeLogs")

    val holderAndWhaleMaps = ChangeLogs.perKeyMulti(
      holderWhaleHourly(spark, sfDir),
      tok, col("t"), Seq(
        col("h") -> "numberOfHolderChangeLogs",
        col("w") -> "numberOfWhaleWalletChangeLogs"))

    val clusterMap = ChangeLogs.perKey(
      clusterArrays(spark, sfDir)
        .select(tok, col("t"), struct(
          struct(col("LOW").as("addresses")).as("LOW"),
          struct(col("MEDIUM").as("addresses")).as("MEDIUM"),
          struct(col("HIGH").as("addresses")).as("HIGH"))
          .as("clusters")),
      tok, col("t"), col("clusters"), "walletClusterByNumberOfTransfer")

    Seq(volumeAndTxMaps, uniqueMap, avgMap, dappMap, holderAndWhaleMaps,
        clusterMap)
      .foldLeft(infoFrame(spark))((acc, m) =>
        acc.join(m, Seq("contract_address"), "left"))
      .withColumn("_key", col("contract_address"))
      .orderBy("contract_address")
  }

  /** [[tokenDocuments]] with every change-log map rendered as a sorted JSON
    * string — the driver-verifiable form of the flagship document (reference
    * EnhanceTokenEnricher shape): byte-identical to a DuckDB string_agg
    * oracle. Rendering rules: volumes stay DECIMAL into the string, counts
    * are integers, the /24 average renders through fixed `%.6f` (raw double
    * toString differs across engines), cluster lists are sorted JSON string
    * arrays. Tokens missing a metric coalesce to the empty object. */
  def tokenDocumentsJson(spark: SparkSession, sfDir: String): DataFrame = {
    val volumeAndTxJson = hourlyVolTx(spark, sfDir)
      .groupBy(tok)
      .agg(
        ChangeLogs.jsonLog(col("t"), col("volume").cast("string"))
          .as("tradingVolumeChangeLogs"),
        ChangeLogs.jsonLog(col("t"), col("n").cast("string"))
          .as("numberOfTransferChangeLogs"))

    val uniqueJson = perAddrHourly(spark, sfDir)
      .groupBy(tok, col("t")).agg(count(lit(1)).as("u"))
      .groupBy(tok)
      .agg(ChangeLogs.jsonLog(col("t"), col("u").cast("string"))
        .as("numberOfAddressChangeLogs"))

    val avgJson = dailyAvg(spark, sfDir)
      .groupBy(tok)
      .agg(ChangeLogs.jsonLog(col("d"), format_string("%.6f", col("avg")))
        .as("averageNumberOfTransactionPerDay"))

    val dappJson = dappHourly(spark, sfDir)
      .groupBy(tok)
      .agg(ChangeLogs.jsonLog(col("t"), col("nd").cast("string"))
        .as("numberOfDappChangeLogs"))

    val holderWhaleJson = holderWhaleHourly(spark, sfDir)
      .groupBy(tok)
      .agg(
        ChangeLogs.jsonLog(col("t"), col("h").cast("string"))
          .as("numberOfHolderChangeLogs"),
        ChangeLogs.jsonLog(col("t"), col("w").cast("string"))
          .as("numberOfWhaleWalletChangeLogs"))

    val clusterJson = clusterArrays(spark, sfDir)
      .groupBy(tok)
      .agg(ChangeLogs.jsonLog(col("t"), concat(
        lit("{\"LOW\":{\"addresses\":"), ChangeLogs.jsonStrArray(col("LOW")),
        lit("},\"MEDIUM\":{\"addresses\":"), ChangeLogs.jsonStrArray(col("MEDIUM")),
        lit("},\"HIGH\":{\"addresses\":"), ChangeLogs.jsonStrArray(col("HIGH")),
        lit("}}")))
        .as("walletClusterByNumberOfTransfer"))

    val logCols = Seq("tradingVolumeChangeLogs", "numberOfTransferChangeLogs",
      "numberOfAddressChangeLogs", "averageNumberOfTransactionPerDay",
      "numberOfDappChangeLogs", "numberOfHolderChangeLogs",
      "numberOfWhaleWalletChangeLogs", "walletClusterByNumberOfTransfer")

    Seq(volumeAndTxJson, uniqueJson, avgJson, dappJson, holderWhaleJson,
        clusterJson)
      .foldLeft(infoFrame(spark))((acc, m) =>
        acc.join(m, Seq("contract_address"), "left"))
      .select(col("contract_address") +: col("address") +:
        col("circulating_supply") +: col("name") +: col("symbol") +:
        col("decimals") +: col("logo") +:
        logCols.map(c => coalesce(col(c), lit("{}")).as(c)): _*)
      .withColumn("_key", col("contract_address"))
      .orderBy("contract_address")
  }

  def enrichTokens(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Sinks.upsertParquet(spark,
      tokenDocuments(spark, sfDir).withColumn("ver", lit(1L)),
      "_key", "ver", s"$outDir/tokens")

  /** Fifth pipeline — the training-corpus store: the applied dedup decision
    * ([[graft.ops.Dedup.dedupedCorpus]]: exact-dup keepers minus near-dup
    * cluster losers) joined back to the document text and written
    * lang/source-partitioned. Partition values prune at scan time (a reader
    * of one language touches only its directories), and dynamic partition
    * overwrite makes re-runs idempotent: unchanged partitions rewrite to
    * identical content, partitions absent from the batch are left alone.
    *
    * Returns write metrics collected via `Dataset.observe` — counts and
    * text mass ride along on the write job itself (observed aggregates
    * accumulate per task, no second scan of the pipeline), the pattern a
    * production run uses to alert on empty/shrunken batches. */
  def enrichCorpus(spark: SparkSession, sfDir: String,
      outDir: String): Map[String, Long] = {
    val obs = org.apache.spark.sql.Observation("corpus_write")
    Sinks.writePartitioned(
      Dedup.dedupedCorpus(spark, sfDir)
        .join(Tables.documents(spark, sfDir).select("doc_id", "text"),
          Seq("doc_id"))
        .observe(obs,
          count(lit(1)).as("rows_written"),
          sum(length(col("text")).cast("long")).as("chars_written"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id")),
      s"$outDir/corpus", Seq("lang", "source"))
    obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
  }
}
