package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[ops.LineageCut.cutObserved]] — the round-11 move that collects
  * an iterative round's convergence statistic DURING its one
  * materialization action (removing a scan job per round for every
  * cutCounted consumer): the metrics arrive, the count is exact, and the
  * cut frame stays a usable, released-on-demand local checkpoint. */
class LineageCutObserveSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("cutCounted count rides the materialization and is exact") {
    val df = (1 to 1234).toDF("x").repartition(4)
    val (cut, n) = ops.LineageCut.cutCounted(df, ops.LineageCut.Local)
    assert(n == 1234)
    // the frame is a real lineage cut: still fully readable
    assert(cut.as[Int].collect().sorted.toSeq == (1 to 1234))
    ops.LineageCut.release(cut)
  }

  test("cutObserved returns caller metrics alongside the cut frame") {
    val df = (1 to 100).toDF("x")
    val (cut, m) = ops.LineageCut.cutObserved(df, ops.LineageCut.Local,
      Seq(count(lit(1)).as("n"), max(col("x")).as("mx")))
    // the metrics MUST arrive on an idle local session — a guard here
    // would let a delivery regression (wrong listener registration, the
    // observe node optimized away) ship silently behind the count
    // fallback, re-growing the per-round scan job this mechanism removed
    assert(m.nonEmpty,
      "observation metrics did not arrive within the bounded await")
    assert(m("n") == 100L)
    assert(m("mx") == 100)
    assert(cut.count() == 100)
    ops.LineageCut.release(cut)
  }

  test("observation breaker re-arms after its cooldown (burst-tolerant)") {
    // round 12: one await timeout used to disable observation for the
    // REST OF THE JVM — on this box that means one co-tenant burst early
    // in a 341-query session silently degraded every later iterative
    // query to the extra-count-job shape. The breaker is now a cooldown:
    // tripped → fall back to plain cut (empty metrics), past the
    // deadline → re-armed (logged), metrics flow again.
    val df = (1 to 50).toDF("x")
    val saved = ops.LineageCut.observeCooldownNanos
    try {
      ops.LineageCut.observeCooldownNanos = 50L * 1000 * 1000 // 50 ms
      ops.LineageCut.tripObservationForTest()
      assert(!ops.LineageCut.observeArmed, "trip must disable immediately")
      val (cut1, m1) = ops.LineageCut.cutObserved(df, ops.LineageCut.Local,
        Seq(count(lit(1)).as("n")))
      assert(m1.isEmpty, "tripped breaker must fall back to plain cut")
      assert(cut1.count() == 50) // fallback frame still correct
      ops.LineageCut.release(cut1)
      Thread.sleep(150)
      assert(ops.LineageCut.observeArmed, "cooldown elapsed — must re-arm")
      val (cut2, m2) = ops.LineageCut.cutObserved(df, ops.LineageCut.Local,
        Seq(count(lit(1)).as("n")))
      assert(m2.get("n").contains(50L),
        "metrics must ride the materialization again after the re-arm")
      ops.LineageCut.release(cut2)
    } finally ops.LineageCut.observeCooldownNanos = saved
  }

  test("empty frame: count 0, convergence-style max metric is null") {
    val df = spark.range(0).selectExpr("id AS x")
    val (cut, m) = ops.LineageCut.cutObserved(df, ops.LineageCut.Local,
      Seq(max(when(col("x") > 0, lit(1)).otherwise(lit(0))).as("chg")))
    assert(m.nonEmpty,
      "observation metrics did not arrive within the bounded await")
    assert(m("chg") == null) // max over zero rows
    assert(cut.count() == 0)
    ops.LineageCut.release(cut)
  }
}
