package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only stage-level profiler shared by [[MisProbe]] and [[QueryProbe]]:
  * registers a listener once, then reports per labeled block the stage
  * count, task count, summed stage wall, and the heaviest stages with RDD
  * chain + task metrics — the attribution that separates "this query is
  * compute-bound" (task time tracks bytes) from "this query is a parade of
  * tiny stages" (tasks ≫ data, the cached-plan partition-pinning shape
  * round 10 caught on q_mis). */
final class StageAudit(spark: SparkSession) {
  private val stages =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      val ms = (for {s <- i.submissionTime; c <- i.completionTime}
        yield c - s).getOrElse(-1L)
      val m = i.taskMetrics
      val desc = i.rddInfos.sortBy(_.id).map(_.name).mkString(">").take(70) +
        f" | task=${m.executorRunTime}ms deser=${m.executorDeserializeTime}ms " +
        f"gc=${m.jvmGCTime}ms sRead=${m.shuffleReadMetrics.totalBytesRead} " +
        f"sWrite=${m.shuffleWriteMetrics.bytesWritten}"
      stages.add((desc, ms, i.numTasks))
    }
  })

  /** Time `f`, then print `[probe] <label> <sec> | stages/tasks/stageMs`
    * and the `top` heaviest stages. Stage attribution assumes blocks run
    * one at a time (dev probes do). */
  def timed[A](label: String, top: Int = 6)(f: => A): A = {
    stages.clear()
    val t0 = System.nanoTime(); val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val ss = stages.asScala.toSeq
    println(f"[probe] $label%-28s $sec%.2f s | stages=${ss.size} " +
      f"stageMs=${ss.map(_._2).sum} tasks=${ss.map(_._3).sum}")
    ss.sortBy(-_._2).take(top).foreach { case (n, ms, nt) =>
      println(f"[probe]    ${ms}%6d ms ${nt}%4d tasks  $n") }
    r
  }
}

/** Stage-audited runner for arbitrary catalog queries:
  * `QUERY_PROBE_ONLY='^(q_ktruss|q_scc)$' sbt "runMain graft.tools.QueryProbe"`.
  * Runs the Bench shared warmup first (so Shared-frame costs don't land on
  * the probed query), then 3 audited passes per query with the harness's
  * per-query release discipline between queries. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.getOrElse("QUERY_PROBE_ONLY", "^q_nothing$").r
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("QUERY_PROBE_CACHED_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val audit = new StageAudit(spark)
    audit.timed("shared_warmup", top = 0) {
      graft.ops.Dedup.clusterLabels(spark, sfDir).count()
      graft.ops.Similarity.bruteForceTopK(spark, sfDir).count()
      graft.ops.Similarity.labelCentroids(spark, sfDir).count()
      graft.ops.Wallet.transferPageRank(spark, sfDir).count()
      graft.ops.Wallet.transferCommunities(spark, sfDir).count()
      graft.ops.Wallet.transferEdgesSym(spark, sfDir).count()
    }
    graft.ops.QueryLocal.drain(spark)
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
        if only.findFirstIn(name).isDefined) {
      for (pass <- 1 to 3)
        audit.timed(s"$name pass$pass")(fn(spark, sfDir).count())
      graft.ops.QueryLocal.release(spark)
      graft.streaming.StreamState.unloadQuietly()
      graft.util.TempDirs.sweep()
    }
    spark.stop()
  }
}
