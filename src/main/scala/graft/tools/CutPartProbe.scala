package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Validation probe for the round-14 iterative-loop partitioning work:
  * does a `repartition(key)` BEFORE [[graft.ops.LineageCut.cut]] survive
  * the localCheckpoint into the LogicalRDD's outputPartitioning, so a
  * later equi-join on `key` skips the cut frame's Exchange? Prints the
  * join plans with and without the pre-partitioning, Exchange counts, and
  * wall times for a 10-round join loop under both shapes.
  */
object CutPartProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.LineageCut

    val edges = spark.range(200000).select(
      (col("id") % 5000).as("src"), ((col("id") * 7) % 5000).as("dst"))

    def loop(e: org.apache.spark.sql.DataFrame, label: String): Unit = {
      // representative round shape: join on src + agg by dst + cut
      var labels = LineageCut.cut(
        e.select(col("src").as("v")).distinct()
          .withColumn("r", col("v") * 1L), LineageCut.Local)
      // print round-1 plan once
      val round1 = e.join(labels.select(col("v").as("src"), col("r")),
        Seq("src")).groupBy(col("dst").as("v")).agg(min("r").as("r"))
      val plan = round1.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).size
      println(s"[$label] round-plan exchanges=$nEx")
      if (sys.env.contains("CUTPART_PLANS")) println(plan)
      val t0 = System.nanoTime()
      for (_ <- 1 to 10) {
        val next = LineageCut.cut(
          e.join(labels.select(col("v").as("src"), col("r")), Seq("src"))
            .groupBy(col("dst").as("v")).agg(min("r").as("r")),
          LineageCut.Local)
        LineageCut.release(labels)
        labels = next
      }
      println(f"[$label] 10 rounds: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warmup JIT/codegen on a throwaway shape
    loop(LineageCut.cut(edges, LineageCut.Local), "warmup")
    loop(LineageCut.cut(edges, LineageCut.Local), "plain_cut")
    loop(LineageCut.cut(edges.repartition(col("src")), LineageCut.Local),
      "prepart_cut")
    spark.stop()
  }
}
