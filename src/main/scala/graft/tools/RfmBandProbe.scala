package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for [[graft.ops.Wallet.rfmBandTable]]'s bucket occupancy
  * (round-13 verdict directive #5): the two-phase rank buckets each RFM
  * metric's DISTINCT-value frame into 256 VALUE-RANGE buckets, and for a
  * heavy-tailed metric (per-wallet volume `mon`) most distinct values
  * could land in bucket 0 — re-serializing the phase-2
  * `Window.partitionBy("rb")` through one task. The frame is |distinct
  * values|, not |rows|, so it only binds at large wallet universes: this
  * probe measures the ACTUAL max-bucket share on a ScaleGen 100× dir so
  * the quantile-bounds swap is a data-driven decision, not a guess.
  * Prints, per metric: distinct values, nonempty buckets, and the
  * largest bucket's share of distinct values under the shipped linear
  * bounds. */
object RfmBandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale100ev")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = graft.ops.Wallet.rfmMetrics(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (metric <- Seq("rec_days", "freq", "mon")) {
      // same bucketing spelling as rfmBandTable's phase 1
      val dist = metrics.groupBy(metric).agg(count(lit(1)).as("c"))
      val bounds = dist.agg(
        min(col(metric).cast("double")).as("mnd"),
        max(col(metric).cast("double")).as("mxd"))
      val occ = dist.crossJoin(broadcast(bounds))
        .withColumn("rb", least(
          floor((col(metric).cast("double") - col("mnd")) * 256 /
            greatest(col("mxd") - col("mnd"), lit(1e-12))).cast("int"),
          lit(255)))
        .groupBy("rb").agg(count(lit(1)).as("nd"), sum(col("c")).as("nr"))
      val row = occ.agg(
        sum(col("nd")).as("distinct_total"),
        count(lit(1)).as("buckets_nonempty"),
        max(col("nd")).as("max_bucket_distinct"),
        max(col("nr")).as("max_bucket_rows")).head()
      val total = row.getLong(0)
      val share = row.getLong(2).toDouble / math.max(total, 1L)
      println(f"[probe] $metric%-8s distinct=$total%9d " +
        f"nonempty_buckets=${row.getLong(1)}%3d " +
        f"max_bucket_distinct=${row.getLong(2)}%9d (share=$share%.3f) " +
        f"max_bucket_rows=${row.getLong(3)}%9d")
    }
    spark.stop()
  }
}
