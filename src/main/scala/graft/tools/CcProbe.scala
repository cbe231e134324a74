package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for the connectedComponents round structure (round-12
  * verdict directive #3): CC is the dedup spine's clustering — the
  * load-bearing step of near-dup removal at 100 TB — and its round-11
  * restructure (one union-agg pass per round, convergence observed during
  * the round's one materialization) shipped with only a structural scale
  * claim because ambient blocked the measurement session. This probe runs
  * [[graft.ops.Graph.connectedComponents]] over the transfers digraph of
  * `SPARK_GRAFT_SF_DIR` (point it at a ScaleGen 100× events dir, e.g.
  * /tmp/scale100ev) with a [[StageAudit]] and [[graft.ops.Graph.CcStats]]
  * round counters, printing per-pass wall, stage/task totals, shuffle
  * bytes, rounds, and whether each round's convergence flag rode the
  * materialization (`observed`) or paid the fallback probe. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale100ev")
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
    val passes = sys.env.getOrElse("CC_PROBE_PASSES", "3").toInt
    for (pass <- 1 to passes) {
      graft.ops.Graph.CcStats.reset()
      audit.drainRows()
      audit.setLabel(s"pass$pass")
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.connectedComponents(edges).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = audit.drainRowsSettled()
      println(f"[probe] cc pass$pass  ${sec}%.2f s | rows=$n " +
        f"stages=${rows.size} tasks=${rows.map(_.tasks).sum} " +
        f"stageMs=${rows.map(_.ms).sum} " +
        f"sReadMB=${rows.map(_.sReadB).sum >> 20} " +
        f"sWriteMB=${rows.map(_.sWriteB).sum >> 20} " +
        f"gcMs=${rows.map(_.gcMs).sum}")
      rows.sortBy(-_.ms).take(4).foreach { s =>
        println(f"[probe]    ${s.ms}%6d ms ${s.tasks}%4d tasks  ${s.desc}") }
      println(s"[probe]    rounds: ${graft.ops.Graph.CcStats}")
    }
    spark.stop()
  }
}
