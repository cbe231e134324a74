package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only phase profiler for q_mis (never part of the catalog): times
  * the shared symmetric-edge build, the initial live-vertex cut, and each
  * incremental Luby round so a regression names the phase it lives in
  * instead of one opaque 8-second number. */
object MisProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("MIS_PROBE_CACHED_AQE", "true")) // A/B knob
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val audit = new StageAudit(spark)
    def t[A](label: String)(f: => A): A = audit.timed(label)(f)
    val sym = t("sym_edges build+count") {
      val d = graft.ops.Wallet.transferEdgesSym(spark, sfDir); d.count(); d
    }
    println(s"[misprobe] sym edge rows = ${sym.count()}")
    println(s"[misprobe] vertices = ${sym.select("src").distinct().count()}")
    for (iter <- 1 to 2) {
      for (r <- 1 to 3)
        t(s"iter$iter mis rounds=$r") {
          graft.ops.Graph
            .maximalIndependentSet(sym, rounds = r, symmetricInput = true)
            .count()
        }
      graft.ops.QueryLocal.release(spark)
    }
    spark.stop()
  }
}
