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

  /** Embedded-JSON field extraction over the event stream: `events.props`
    * is a per-row JSON payload (the semi-structured column every event
    * pipeline drags along); `get_json_object` pulls the numeric field and
    * the rollup summarizes it per event type. The path-extraction runs
    * inside whole-stage codegen on the scan — no UDF, no intermediate
    * parse tree materialized — and malformed payloads degrade to NULL
    * (skipped by the aggregates), never to a crash.
    *
    * Exactness: integer field, integer sum/min/max; the mean is one
    * double division + round. */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        round(sum(col("k")).cast("double") / count(lit(1)), 6).as("k_avg"))
      .orderBy("event_type")
}
