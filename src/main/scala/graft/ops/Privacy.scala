package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data release: column-level PII redaction,
  * deterministic pseudonymization, numeric generalization, and k-anonymity
  * cell suppression. The reference engine has no privacy surface; these are
  * the operations a corpus pipeline runs before data leaves the boundary.
  *
  * Everything is deterministic and oracle-mirrored: masking is a portable
  * RE2-safe regex (no lookaround — DuckDB's regex engine has none),
  * pseudonyms are salted-hash prefixes (same input ⇒ same token, so
  * referential integrity survives anonymization), and banding uses only
  * IEEE-exact ops (divide / floor / multiply). At 100 TB redaction is a
  * pure projection (zero shuffles, whole-stage codegen); k-anonymity is one
  * map-side-combinable aggregation over the quasi-identifier.
  */
object Privacy {

  /** Pepper for pseudonymization — a deployment would inject a secret; the
    * catalog uses a fixed literal so the oracle can mirror it. */
  val Salt = "graft_pepper_v1"

  /** Minimum quasi-identifier group size a published cell must have. */
  val KAnon = 10L

  /** Row-level redaction over `customer`: digit runs in the name masked to
    * `<ID>`, a salted md5 pseudonym that joins consistently across tables,
    * and the account balance generalized to a 1000-wide band. */
  def redactCustomers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), lit("[0-9]+"), lit("<ID>"))
          .as("name_masked"),
        concat(lit("cust_"),
          substring(md5(concat(col("c_name"), lit(Salt))), 1, 12))
          .as("pseudonym"),
        (floor(col("c_acctbal") / 1000.0) * 1000.0).as("acctbal_band"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** k-anonymity cell suppression: publish the (nation, segment) histogram
    * only where the cell holds at least [[KAnon]] customers; all smaller
    * cells collapse into one residual `(-1, '*')` row so no rare
    * combination is disclosed while the published total stays exact. */
  def kAnonHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.customer(spark, sfDir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_rows"))
    val published = cells.filter(col("n_rows") >= KAnon)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"), col("n_rows"))
    val residual = cells.filter(col("n_rows") < KAnon)
      .agg(sum("n_rows").as("n_rows"))
      .filter(col("n_rows").isNotNull)
      .select(lit(-1L).as("nation"), lit("*").as("segment"), col("n_rows"))
    published.unionByName(residual).orderBy("nation", "segment")
  }

  /** Minimum distinct sensitive values a publishable group needs. */
  val LDiversity = 3L

  /** l-diversity audit over the k-anonymity quasi-identifier groups:
    * k-anonymity alone still leaks when a group, however large, is
    * HOMOGENEOUS in the sensitive attribute (everyone in the cell shares
    * one balance band ⇒ membership reveals the band). A cell is
    * publishable only if it holds ≥ [[KAnon]] rows AND the sensitive
    * attribute (the 1000-wide balance band [[redactCustomers]] publishes)
    * takes ≥ [[LDiversity]] distinct values. One grouped aggregate with a
    * count-distinct — map-side combinable, no second pass. */
  def lDiversityAudit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        (floor(col("c_acctbal") / 1000.0) * 1000.0).as("band"))
      .groupBy("nation", "segment")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("band")).as("n_bands"))
      .withColumn("publishable",
        col("n_rows") >= KAnon && col("n_bands") >= LDiversity)
      .orderBy("nation", "segment")
}
