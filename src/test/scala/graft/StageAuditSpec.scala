package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[tools.StageAudit]] contract Bench's elevated-minimum
  * attribution depends on: completed stages are stamped with the
  * caller-set label active at the time, drainRows clears, and Row.json
  * emits valid JSON (quotes/backslashes in RDD names escaped). */
class StageAuditSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark

  test("stages are stamped with the active label and drain clears") {
    val audit = new tools.StageAudit(spark)
    audit.drainRows()
    audit.setLabel("blockA")
    spark.range(0, 100000, 1, 4).selectExpr("id % 7 AS k")
      .groupBy("k").count().count()
    // stage-completion events ride the async listener bus — poll briefly.
    // The shared test SparkContext can deliver stragglers from OTHER
    // suites' stages submitted before this audit's first setLabel; those
    // are correctly labeled "" (the initial label) and filtered out.
    var rows = Seq.empty[tools.StageAudit.Row]
    var waited = 0
    while (rows.count(_.label == "blockA") < 2 && waited < 5000) {
      Thread.sleep(50); waited += 50
      rows = rows ++ audit.drainRows()
    }
    val mine = rows.filter(_.label == "blockA")
    assert(mine.size >= 2, "a groupBy query must complete >= 2 stages")
    assert(rows.forall(r => r.label == "blockA" || r.label.isEmpty),
      s"unexpected labels: ${rows.map(_.label).distinct}")
    assert(mine.map(_.tasks).sum >= 5) // 4 map + >=1 reduce
    // drained means drained
    assert(audit.drainRows().isEmpty)
  }

  test("rows keep the submit-time label across a later label change") {
    // stage-completion events ride the ASYNC listener bus: under the old
    // delivery-time stamping, a pass's final stages delivered after the
    // next setLabel carried the WRONG label and Bench's best-pass filter
    // came up empty on exactly the laggy busy-box sessions the
    // elevated-minimum feature diagnoses. Rows are now bucketed by the
    // stage's own submission wall-clock against the label-transition
    // history, so this is deterministic: every stage below was submitted
    // while "passX" was active, and the immediate label flip before any
    // draining must not re-attribute a single row.
    val audit = new tools.StageAudit(spark)
    audit.drainRows()
    audit.setLabel("passX")
    spark.range(0, 100000, 1, 4).selectExpr("id % 13 AS k")
      .groupBy("k").count().count()
    audit.setLabel("calib") // the elevated branch's probe, in Bench terms
    var rows = Seq.empty[tools.StageAudit.Row]
    var waited = 0
    while (rows.count(_.label == "passX") < 2 && waited < 5000) {
      Thread.sleep(50); waited += 50
      rows = rows ++ audit.drainRows()
    }
    assert(rows.count(_.label == "passX") >= 2,
      "a groupBy query must complete >= 2 stages under the submit label")
    // the mislabeling the fix prevents: NOTHING submitted during passX
    // may surface as "calib" just because delivery happened after the
    // flip (foreign pre-label stragglers surface as "", which is fine)
    assert(!rows.exists(_.label == "calib"),
      s"delivery-lag mislabeling: ${rows.map(_.label).distinct}")
  }

  test("Row.json escapes quotes and backslashes in stage descriptions") {
    val r = tools.StageAudit.Row("""l""", """Rdd"with\quote""", 12, 3,
      34, 5, 6L << 20, 7L << 20)
    val j = r.json
    assert(j.contains("\"desc\":\"Rdd\\\"with\\\\quote\""))
    assert(j.contains("\"ms\":12") && j.contains("\"tasks\":3"))
    assert(j.contains("\"sread_mb\":6") && j.contains("\"swrite_mb\":7"))
  }
}
