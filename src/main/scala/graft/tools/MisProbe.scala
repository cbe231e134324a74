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
        sys.env.getOrElse("MIS_PROBE_CACHED_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-level attribution: names the slow stages instead of one number
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {s <- i.submissionTime; c <- i.completionTime}
            yield c - s).getOrElse(-1L)
          val m = i.taskMetrics
          val desc = i.rddInfos.sortBy(_.id).map(_.name).mkString(">").take(80) +
            f" | task=${m.executorRunTime}ms deser=${m.executorDeserializeTime}ms " +
            f"gc=${m.jvmGCTime}ms sRead=${m.shuffleReadMetrics.totalBytesRead} " +
            f"sWrite=${m.shuffleWriteMetrics.bytesWritten}"
          stages.add((desc, ms, i.numTasks))
        }
      })
    def t[A](label: String)(f: => A): A = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      println(f"[misprobe] $label%-28s $sec%.2f s | stages=${ss.size} " +
        f"stageMs=${ss.map(_._2).sum} tasks=${ss.map(_._3).sum}")
      ss.sortBy(-_._2).take(6).foreach { case (n, ms, nt) =>
        println(f"[misprobe]    ${ms}%6d ms ${nt}%4d tasks  $n") }
      r
    }
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
