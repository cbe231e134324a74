package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage attribution for the warmup `dedup_spine` part (round-14 target
  * #3): times each layer of the shared-build chain separately, in build
  * order, so the 7-10 s warmup cost is attributed to tokenize+shingle vs
  * minhash signatures vs banded pairs vs the CC loop.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.tools.SpineProbe"
  */
object SpineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "4")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[spine] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  ($n rows)")
    }
    // in build order, so each timing is that layer's INCREMENTAL cost on
    // top of the already-shared lower layers
    t("shingles_arr")(graft.ops.TextAnalysis.shinglesArr(spark, sfDir).count())
    t("sig_rows(+explode)")(
      graft.ops.Dedup.minhashSignatures(spark, sfDir).count())
    t("banded_pairs")(graft.ops.Dedup.minhashPairs(spark, sfDir).count())
    t("cc_labels")(graft.ops.Dedup.clusterLabels(spark, sfDir).count())
    println(s"[spine] cc ${graft.ops.Graph.CcStats}")
    spark.stop()
  }
}
