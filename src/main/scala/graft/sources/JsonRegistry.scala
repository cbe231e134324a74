package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multiline-JSON registry source + the registry-cleaning transformation.
  *
  * Mirrors the reference's dapp-registry intake: a multiline JSON scan (S5,
  * reference: src/main/scala/etl/DappEnricher.scala:29) followed by the
  * driver-side play-json cleanup re-expressed as higher-order column
  * functions (S6, reference: utils/Extract0x38Dapp.scala:12-43 — drop
  * records sourced from "nft", drop records without contract addresses,
  * keep only addresses with the target prefix). Runs fully distributed and
  * codegen'd instead of on the driver.
  */
object JsonRegistry {

  val Path = "/root/repo/src/main/resources/dapp_registry.json"

  def raw(spark: SparkSession): DataFrame =
    spark.read.option("multiline", "true").json(Path)

  /** Cleaned registry exploded to (id, name, address), prefix-filtered. */
  def cleaned(spark: SparkSession): DataFrame =
    raw(spark)
      .filter(!array_contains(col("sources"), "nft"))
      .filter(col("contract_addresses").isNotNull)
      .select(col("id"), col("name"),
        explode(col("contract_addresses")).as("address"))
      .filter(col("address").startsWith("1"))
      .orderBy("id", "address")
}
