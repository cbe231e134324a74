package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ops.{Graph, Wallet}

/** Dev probe for the k-truss peel's scale posture (round-13 verdict
  * directive #1): q_ktruss is the most expensive catalog query and the
  * one heavy iterative spine without a measured 100× profile — and its
  * cost is O(triangles), which the ScaleGen hub shape (1000 receiver
  * hubs on a fixed vertex universe) densifies superlinearly, exactly
  * where a hidden scale-killer would live. This probe runs
  * [[graft.ops.Graph.kTruss]] at the catalog's (k, rounds) over the
  * transfers digraph of `SPARK_GRAFT_SF_DIR` (point it at a ScaleGen
  * 100× events dir, e.g. /tmp/scale100ev) with a [[StageAudit]] and
  * [[graft.ops.Graph.TrussStats]] counters, printing per-pass wall,
  * stage/task totals, shuffle bytes, the enumerated triangle count
  * (3×triangles rides the initial materialization's observe), per-round
  * deletion counts, and whether each round's statistic rode the
  * materialization (`observed`) or paid the fallback count.
  *
  * Needs `SPARK_DRIVER_MEM=16g` (or more) at 100×: triangle-support
  * state is O(triangles) and local mode concentrates the whole graph's
  * ~39 M-triangle checkpoint plus 32 concurrent hash-agg tasks in one
  * JVM — at the 8 GiB default the support aggregation cannot acquire a
  * page (measured, PERF.md round-13 posture row); on a cluster the same
  * plan spreads |T|/executors per JVM, so the cliff is a local-mode
  * artifact, not a plan property. */
object KtrussProbe {
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
    val passes = sys.env.getOrElse("KTRUSS_PROBE_PASSES", "3").toInt
    // k/rounds knobs: the catalog's k=3 converges in one peel round at
    // both scales, so the incremental-maintenance path (work ∝ deletions)
    // barely runs — k=4+ forces real deletion volume and peel rounds,
    // which is what a posture claim about the peel needs
    val k = sys.env.getOrElse("KTRUSS_PROBE_K", Wallet.KTrussK.toString).toInt
    val rounds = sys.env.getOrElse("KTRUSS_PROBE_ROUNDS",
      Wallet.KTrussRounds.toString).toInt
    for (pass <- 1 to passes) {
      Graph.TrussStats.reset()
      audit.drainRows()
      audit.setLabel(s"pass$pass")
      val t0 = System.nanoTime()
      val n = Graph.kTruss(edges, k, rounds).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = audit.drainRowsSettled()
      println(f"[probe] ktruss(k=$k,r=$rounds) pass$pass  ${sec}%.2f s | " +
        f"rows=$n stages=${rows.size} tasks=${rows.map(_.tasks).sum} " +
        f"stageMs=${rows.map(_.ms).sum} " +
        f"sReadMB=${rows.map(_.sReadB).sum >> 20} " +
        f"sWriteMB=${rows.map(_.sWriteB).sum >> 20} " +
        f"gcMs=${rows.map(_.gcMs).sum}")
      rows.sortBy(-_.ms).take(8).foreach { s =>
        println(f"[probe]    ${s.ms}%6d ms ${s.tasks}%4d tasks " +
          f"sR=${s.sReadB >> 20}%5d MB sW=${s.sWriteB >> 20}%5d MB  " +
          s.desc.take(60)) }
      println(s"[probe]    rounds: ${Graph.TrussStats}")
    }
    spark.stop()
  }
}
