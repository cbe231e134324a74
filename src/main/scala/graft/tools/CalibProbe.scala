package graft.tools

import org.apache.spark.sql.SparkSession

/** THE fixed ambient-calibration probe — constant CPU+shuffle work with
  * no data or cache dependence. Bench runs it at session start/end (and
  * mid-session on a warm-pass anomaly), PostureCheck stamps every posture
  * report with it; cross-session and cross-round comparisons divide it
  * out (r8: unchanged code re-measured 1.6× slower between driver
  * sessions — the probe is the yardstick that retires that class of
  * false regression).
  *
  * ONE definition on purpose: the comparability contract is that every
  * probe reading anywhere measures IDENTICAL work — round 9 carried two
  * verbatim copies (Bench + PostureCheck), where an edit to one would
  * silently invalidate the yardstick. Do not fork this. */
object CalibProbe {

  /** One probe reading in seconds. The FIRST reading of a session pays
    * JIT/codegen (exactly not ambient) — use [[warmed]] at session start,
    * or discard the first [[run]] manually. */
  def run(spark: SparkSession, cpus: Int): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 50000000L, 1L, cpus)
      .selectExpr("id % 997 AS b", "xxhash64(id) AS h")
      .groupBy("b").agg(org.apache.spark.sql.functions.sum("h"))
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Discard one JIT-warmup reading, return the next. */
  def warmed(spark: SparkSession, cpus: Int): Double = {
    run(spark, cpus)
    run(spark, cpus)
  }

  /** The reference reading other sessions normalize against —
    * `total_steady_min_calib_adj = total × RefCalibSec / session_calib`.
    * Pinned to the round-9 DRIVER session's mean ([0.57, 0.61] →  0.59;
    * the builder's controlled 24 g session read the same 0.55/0.63), the
    * session the round-over-round ratio table anchors on. A constant, not
    * a config: changing it rescales every adjusted total ever reported. */
  val RefCalibSec = 0.59
}
