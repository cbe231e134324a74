package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** t-closeness threshold, in ppm of the [0,1] ordered-EMD scale. */
  val TClosenessPpm = 250000L

  /** t-closeness audit — the third rung of the privacy ladder (k-anonymity
    * → l-diversity → t-closeness): even a large, diverse group leaks when
    * its sensitive-value DISTRIBUTION skews far from the global one
    * (everyone in the cell is rich ⇒ membership reveals wealth). For an
    * ORDERED sensitive attribute (the published 1000-wide balance band)
    * the distance is the ordered Earth-Mover's Distance
    * `EMD = Σᵢ|P_cdf(i) − Q_cdf(i)| / (m−1)`, and with counts that is
    * exact rational arithmetic: `|Cᵢ/n − Dᵢ/N| = |N·Cᵢ − n·Dᵢ|/(n·N)`, so
    * `emd_ppm = 10⁶·Σ|N·Cᵢ − n·Dᵢ| div (n·N·(m−1))` — pure integers, no
    * float ever enters the audit. Cost: the global band histogram is m
    * rows (broadcast); groups zero-fill against it through a small
    * dimension cross join; cumulative sums are per-group windows over m
    * rows. Nothing customer-sized shuffles twice. */
  def tClosenessAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
    val global = rows.groupBy("band").agg(count(lit(1)).as("gc"))
    val totals = global.agg(sum(col("gc")).as("nn"),
      count(lit(1)).as("m"))
    val gcum = global
      .withColumn("dd", sum(col("gc")).over(
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)))
      .select("band", "dd")
    val groups = rows.groupBy("nation", "segment")
      .agg(count(lit(1)).as("n_rows"))
    val cells = rows.groupBy("nation", "segment", "band")
      .agg(count(lit(1)).as("c"))
    val filled = groups.crossJoin(broadcast(gcum.select("band")))
      .join(cells, Seq("nation", "segment", "band"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cc", sum(col("c")).over(
        Window.partitionBy("nation", "segment").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(gcum), Seq("band"))
    filled.crossJoin(broadcast(totals))
      .groupBy("nation", "segment")
      // DECIMAL(38,0) end to end: nn·cc terms reach ~1e18 each and the
      // band sum, the ×1e6, and the n_rows·nn·(m−1) denominator all
      // overflow Long at warehouse row counts — non-ANSI Long arithmetic
      // would wrap silently (the assocRules lift_ppm lesson applied here)
      .agg(first(col("n_rows")).as("n_rows"),
        sum(abs(col("nn").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("cc") - col("n_rows")
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("dd")))
          .as("emd_num"),
        first(col("nn")).as("nn"), first(col("m")).as("m"))
      .withColumn("emd_ppm",
        when(col("m") > 1,
          expr("CAST(emd_num * 1000000 div" +
            " (CAST(n_rows AS DECIMAL(38,0)) * nn * (m - 1)) AS BIGINT)"))
          .otherwise(lit(0L)))
      .select(col("nation"), col("segment"), col("n_rows"), col("emd_ppm"),
        (col("emd_ppm") <= TClosenessPpm && col("n_rows") >= KAnon)
          .as("publishable"))
      .orderBy("nation", "segment")
  }

  /** Noise bound of [[noiseRelease]]: additive integer noise in [-3, 3]. */
  val NoiseHalfWidth = 3L

  /** Seeded-noise count release — the differential-privacy release
    * pipeline SHAPE (per-cell histogram, additive integer noise, clamp at
    * zero) with DETERMINISTIC stand-in noise derived from the md5 of the
    * cell key. This is NOT differential privacy (DP requires calibrated
    * random noise; a keyed PRF of the cell name is obfuscation at best) —
    * it exists so the distributed mechanics are real and testable: one
    * map-side-combinable aggregate over (token, day), noise applied inside
    * the same projection, no second pass, nothing driver-side. Swapping
    * the hash for a Laplace sampler is a one-expression change.
    *
    * Released cells keep the true count beside the noisy one because the
    * oracle gate needs both; a production release would drop `n`. */
  def noiseRelease(spark: SparkSession, sfDir: String): DataFrame = {
    val w = 2 * NoiseHalfWidth + 1
    Tables.transfers(spark, sfDir)
      .groupBy(col("contract_address"),
        Num.dayBucket(col("transact_at")).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise",
        expr("CAST(conv(substr(md5(concat(contract_address, '|', " +
          s"CAST(d AS STRING), '|rel')), 1, 2), 16, 10) AS BIGINT) % $w") -
          NoiseHalfWidth)
      .withColumn("released", greatest(col("n") + col("noise"), lit(0L)))
      .orderBy("contract_address", "d")
  }
}
