package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dapp-interaction analytics (reference:
  * src/main/scala/etl/DappEnricher.scala and
  * src/main/scala/etl/BaseEnricher.scala:328-389): which registered dapps a
  * token's transfer counterparties touch.
  *
  * The membership join is J1 — both sides exploded to (key, address) rows,
  * then an equi-join. The registry side is a handful of rows, so it is
  * explicitly `broadcast()`: at 100 TB the fact legs never shuffle for this
  * join — each executor hash-probes the tiny registry locally.
  */
object Dapps {
  import Num._

  /** Registry exploded to one row per (dapp, address). */
  private def dappAddresses(spark: SparkSession): DataFrame =
    Tables.dapps(spark).select(
      col("dapp_id"), col("dapp_name"),
      explode(col("addresses")).as("address"))

  /** Both transfer legs as (t, address) rows — the reference unions a
    * from-leg and a to-leg before the membership join (U1,
    * reference: src/main/scala/etl/BaseEnricher.scala:333-343). */
  private def legs(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    t.select(hourBucket(col("transact_at")).as("t"),
        col("from_address").as("address"))
      .unionByName(
        t.select(hourBucket(col("transact_at")).as("t"),
          col("to_address").as("address")))
  }

  /** Distinct dapps touched per hour (J1 + A4, reference :345-368). */
  def hourlyDappCounts(spark: SparkSession, sfDir: String): DataFrame =
    legs(spark, sfDir)
      .join(broadcast(dappAddresses(spark)), Seq("address"))
      .groupBy("t")
      .agg(countDistinct("dapp_id").as("n_dapps"),
        count(lit(1)).as("n_interactions"))
      .orderBy("t")

  /** Per-dapp totals: interactions and distinct counterparty wallets. */
  def dappTotals(spark: SparkSession, sfDir: String): DataFrame =
    legs(spark, sfDir)
      .join(broadcast(dappAddresses(spark)), Seq("address"))
      .groupBy("dapp_id", "dapp_name")
      .agg(count(lit(1)).as("n_interactions"),
        countDistinct("address").as("n_wallets"))
      .orderBy("dapp_id")

  /** Distinct wallets per dapp, exploded (DappEnricher's collect_list output
    * in relational form; A7 distinct, reference:
    * src/main/scala/etl/DappEnricher.scala:31-40). */
  def dappWallets(spark: SparkSession, sfDir: String): DataFrame =
    legs(spark, sfDir)
      .join(broadcast(dappAddresses(spark)), Seq("address"))
      .select("dapp_id", "address").distinct()
      .orderBy("dapp_id", "address")

  /** Registry with missing images defaulted (F9 na.fill, reference:
    * src/main/scala/etl/DappEnricher.scala:47-48). */
  def dappInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Tables.DappImages.toDF("dapp_id", "image")
      .na.fill(Map("image" -> "default.png"))
      .orderBy("dapp_id")
  }

  /** Audience overlap between dapp pairs: |users(a) ∩ users(b)| and the
    * exact Jaccard numerator/denominator — "which dapps share a user
    * base", the co-usage matrix partnerships and ring analysis read. A
    * dapp's AUDIENCE is the set of counterparty wallets on transfers
    * touching its registered addresses (the dapp contracts themselves
    * are membership, not audience — and registry address sets are
    * disjoint, so contract-level overlap is vacuously empty). The pair
    * intersection is an equi-join on the WALLET key (each wallet fans
    * out only to its own dapp pairs — bounded by registry² per wallet,
    * never |wallets|²). Jaccard is emitted as an exact fraction
    * (inter, union) — no float ratio in the contract. */
  def dappOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    val reg = broadcast(dappAddresses(spark).select("dapp_id", "address"))
    val dw = t.select(col("to_address").as("address"),
        col("from_address").as("wallet"))
      .unionByName(t.select(col("from_address").as("address"),
        col("to_address").as("wallet")))
      .join(reg, Seq("address"))
      .select(col("dapp_id"), col("wallet").as("address"))
      .distinct()
    val sizes = dw.groupBy("dapp_id").agg(count(lit(1)).as("n"))
    val pairs = dw.toDF("da", "address")
      .join(dw.toDF("db", "address"), Seq("address"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.toDF("da", "na"), Seq("da"))
      .join(sizes.toDF("db", "nb"), Seq("db"))
      .select(col("da"), col("db"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_n"))
      .orderBy("da", "db")
  }

  /** Dapp-audience conversion funnel: per dapp, how many of the wallets
    * that transacted WITH its contract addresses also made a `purchase`
    * event — the attribution question a dapp BD team actually asks
    * ("does touching us correlate with converting"), in exact per-mille.
    * Audience via the broadcast registry membership join (fact legs never
    * shuffle); conversion via one left join against the distinct-buyer
    * set keyed on the wallet. */
  def dappFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.transfers(spark, sfDir)
    val aud = t.select(col("from_address").as("wallet"),
        col("to_address").as("address"))
      .unionByName(t.select(col("to_address").as("wallet"),
        col("from_address").as("address")))
      .join(broadcast(dappAddresses(spark)), Seq("address"))
      .select("dapp_id", "dapp_name", "wallet").distinct()
    val buyers = t.filter(col("contract_address") === "purchase")
      .select(col("from_address").as("wallet")).distinct()
      .withColumn("hit", lit(1L))
    aud.join(buyers, Seq("wallet"), "left")
      .groupBy("dapp_id", "dapp_name")
      .agg(count(lit(1)).as("n_audience"),
        sum(coalesce(col("hit"), lit(0L))).as("n_purchasers"))
      .withColumn("purchase_pml",
        expr("n_purchasers * 1000 div n_audience"))
      .orderBy("dapp_id")
  }
}
