package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off lifecycle timing for a single bounded streaming query: where
  * does the wall OUTSIDE `triggerExecution` go (start / drain / stop /
  * sink read)? Round-14 measurement aid for the stream family — the
  * StreamProfile durations cover only the trigger loop.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.tools.StreamPhases [hourly|bounded|interval]"
  */
object StreamPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = args.headOption.getOrElse("bounded")
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // run twice: first pass is cold (JIT/codegen), second is the shape the
    // bench prices
    for (pass <- Seq("cold", "warm")) {
      println(s"=== $mode / $pass ===")
      mode match {
        case "hourly" => // memory sink, complete mode
          val stream = graft.Tables.eventsStream(spark, sfDir)
            .select(col("event_type").as("contract_address"), col("ts_t"),
              col("value"))
            .groupBy(col("contract_address"), window(col("ts_t"), "1 hour"))
            .agg(sum(col("value")
              .cast(org.apache.spark.sql.types.DecimalType(25, 2)))
              .as("dvolume"))
          val q = t("start") {
            stream.writeStream.outputMode("complete").format("memory")
              .queryName(s"sp_$pass").start()
          }
          t("drain")(q.processAllAvailable())
          t("stop")(q.stop())
          t("read")(spark.table(s"sp_$pass").count())
        case _ => // parquet sink, append, AvailableNow (bounded shape)
          val out = graft.util.TempDirs.scratch("sp_sink")
          val ckpt = graft.util.TempDirs.scratch("sp_ckpt")
          val plan = graft.streaming.StreamingMetrics
            .hourlyVolumeBounded(graft.Tables.eventsStream(spark, sfDir))
          val q = t("start") {
            plan.writeStream.outputMode("append").format("parquet")
              .option("path", out).option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
          }
          t("await")(q.awaitTermination())
          t("read")(spark.read.parquet(out).orderBy("contract_address", "t")
            .count())
      }
      graft.streaming.StreamState.unloadQuietly()
      graft.util.TempDirs.sweep()
    }
    spark.stop()
  }
}
