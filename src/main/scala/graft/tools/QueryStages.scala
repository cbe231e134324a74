package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-STAGE cost print for a handful of catalog queries — the drill-down
  * one level below [[CatalogProfile]] (which aggregates a query's stages
  * into totals). Guide §1.1/§7.1: once the profiler names a query, the
  * stage table names the operator — which stage owns the task-ms, whether
  * it is wide or serial, and what it shuffles.
  *
  * Usage: `QUERY_STAGES_ONLY='^q_jaccard_top1$' sbt "runMain
  * graft.tools.QueryStages"` (regex over catalog names; each matching
  * query runs cold then warm, stages of both passes printed with pass
  * labels). `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as in Bench.
  */
object QueryStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.getOrElse("QUERY_STAGES_ONLY", "^q_jaccard_top1$").r
    // knob A/B harness: QUERY_STAGES_CONFS="k=v;k=v" applied on top of the
    // Bench baseline, so a config's effect is measured on the same pass
    // discipline before touching the Bench session itself
    val extra = sys.env.getOrElse("QUERY_STAGES_CONFS", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // sort-based shuffle writer for wide exchanges: the bypass writer
      // opens one file per reducer per map task and NIO-merges them
      // (32 partitions x 32 map tasks = 1024 creates+mmaps per exchange) --
      // measured 42% of warm wall on the shuffle-heavy catalog subset. At
      // production partition counts (>200) bypass never engages, so this
      // pins wide local exchanges to the same writer path a cluster run
      // uses. 4 = the streaming state shard count: state exchanges (tiny
      // rows, many micro-batches) stay on the bypass path, where a
      // file per reducer is mild and the sort writer's per-task
      // buffering measured 1.4-3.9x worse on the stream-join family --
      // while batch exchanges stay sort-based even in the driver's
      // LOWER-core-count scaling run (8 cores -> 8 shuffle partitions,
      // which a threshold of 8 would have flipped back to bypass;
      // measured -17% on the shuffle-heavy subset at 8 cores).
      .config("spark.shuffle.sort.bypassMergeThreshold", "4")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val audit = new StageAudit(spark)

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.findFirstIn(n).isDefined }
    names.foreach { case (n, fn) =>
      Seq("cold", "warm").foreach { pass =>
        audit.setLabel(s"$n/$pass")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        val rows = audit.drainRowsSettled(settleMs = 200, timeoutMs = 3000)
          .filter(_.label == s"$n/$pass")
        println(f"== $n/$pass wall=${wallMs}ms stages=${rows.size} " +
          f"taskMs=${rows.map(_.taskMs).sum} gcMs=${rows.map(_.gcMs).sum} " +
          f"sreadMB=${rows.map(_.sReadB).sum >> 20} " +
          f"swriteMB=${rows.map(_.sWriteB).sum >> 20}")
        rows.sortBy(-_.taskMs).foreach { r =>
          println(f"  stageMs=${r.ms}%6d tasks=${r.tasks}%4d " +
            f"taskMs=${r.taskMs}%7d gc=${r.gcMs}%5d " +
            f"sread=${r.sReadB >> 10}%8dKB swrite=${r.sWriteB >> 10}%8dKB " +
            f"${r.desc}")
        }
      }
      graft.ops.QueryLocal.release(spark)
      graft.streaming.StreamState.unloadQuietly()
      graft.util.TempDirs.sweep()
      graft.ops.Shared.drainHeals()
    }
    spark.stop()
  }
}
