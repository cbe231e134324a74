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
    for (pass <- 1 to 3) {
      graft.ops.Graph.SccStats.reset()
      audit.timed(s"scc pass$pass", top = 4) {
        graft.ops.Graph.stronglyConnectedComponents(edges).count()
      }
      println(s"[probe]    rounds: ${graft.ops.Graph.SccStats}")
    }
    spark.stop()
  }
}
