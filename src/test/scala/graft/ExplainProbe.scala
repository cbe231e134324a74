package graft
/** Ad-hoc: run named catalog queries (twice) and dump timing + executed
  * plan — spot-check tool, not a test. sfDir via SPARK_GRAFT_SF_DIR. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("ck").toString)
    for (n <- args; r <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sf)
      df.count()
      println(f"=== $n r$r ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      if (r == 2 && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString.take(40000))
    }
    spark.stop()
  }
}
