package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one catalog query's warm pass in a tight loop so an external
  * profiler (jstack sampling, async-profiler) can attribute where the
  * warm-pass wall actually goes — the drill-down below [[QueryStages]]
  * when stage metrics alone cannot name the cost (guide §7.3).
  *
  * `SPIN_PROBE_QUERY` (exact name, default q_setsim_join),
  * `SPIN_PROBE_ITERS` (default 15). QueryLocal caches are released
  * between iterations, Shared frames persist — the bench's steady-state
  * warm regime.
  */
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPIN_PROBE_QUERY", "q_setsim_join")
    val iters = sys.env.getOrElse("SPIN_PROBE_ITERS", "15").toInt
    val spark = SparkSession.builder()
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val fn = graft.SparkEntry.queries(name)
    var i = 0
    while (i <= iters) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[spin] $name iter=$i wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.ops.QueryLocal.release(spark)
      graft.streaming.StreamState.unloadQuietly()
      graft.util.TempDirs.sweep()
      i += 1
    }
    spark.stop()
  }
}
