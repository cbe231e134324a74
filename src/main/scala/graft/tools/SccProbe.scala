package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for q_scc's round structure (round-11 verdict directive #5):
  * runs [[graft.ops.Graph.stronglyConnectedComponents]] over the transfers
  * digraph with [[graft.ops.Graph.SccStats]] round counters and a
  * [[StageAudit]], printing per-pass wall, stage/task totals, and how many
  * trim / coloring / sweep rounds each outer round spends — the number
  * that decides whether a per-round restructure can move the floor or the
  * cost is the algorithm's round count itself. */
object SccProbe {
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
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val audit = new StageAudit(spark)
    val edges = graft.Tables.transfers(spark, sfDir)
      .select(col("from_address").as("src"), col("to_address").as("dst"))
    val passes = sys.env.getOrElse("SCC_PROBE_PASSES", "3").toInt
    for (pass <- 1 to passes) {
      graft.ops.Graph.SccStats.reset()
      audit.drainRows()
      audit.setLabel(s"pass$pass")
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.stronglyConnectedComponents(edges).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = audit.drainRowsSettled()
      println(f"[probe] scc pass$pass  ${sec}%.2f s | rows=$n " +
        f"stages=${rows.size} tasks=${rows.map(_.tasks).sum} " +
        f"stageMs=${rows.map(_.ms).sum} " +
        f"sReadMB=${rows.map(_.sReadB).sum >> 20} " +
        f"sWriteMB=${rows.map(_.sWriteB).sum >> 20} " +
        f"gcMs=${rows.map(_.gcMs).sum}")
      rows.sortBy(-_.ms).take(4).foreach { s =>
        println(f"[probe]    ${s.ms}%6d ms ${s.tasks}%4d tasks  ${s.desc}") }
      println(s"[probe]    rounds: ${graft.ops.Graph.SccStats}")
    }
    spark.stop()
  }
}
