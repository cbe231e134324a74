package graft
/** Ad-hoc: run heavy queries twice in one JVM to split warmup from steady cost. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val sf = "/root/testdata/sf0.1"
    val names = Seq("q_minhash_pairs", "q_jaccard_top1", "q_embedding_topk",
      "q_embedding_topk_agg", "q_bucketed_ann", "q_simhash_pairs",
      "q_kmeans_assign", "q_kmeans_iter3",
      "q_densified_balance", "q_stream_volume_hourly", "q_txcount_hourly",
      "q_token_documents_full", "q_pricing_summary", "q_revenue_by_nation")
    for (round <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).count()
      println(f"r$round $n ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // exchange reuse check on the self-join
    val p = SparkEntry.queries("q_minhash_pairs")(spark, sf)
    p.count()
    val plan = p.queryExecution.executedPlan.toString
    println("minhash_pairs ReusedExchange: " + plan.contains("ReusedExchange"))
    spark.stop()
  }
}
