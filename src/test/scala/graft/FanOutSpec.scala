package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.fanOut]]'s widen-only contract: an under-partitioned
  * frame is repartitioned to the session's core count, and a frame
  * already at-or-past core count passes through UNTOUCHED (same object —
  * no exchange added), which is what makes the helper safe to leave on a
  * production path. */
class FanOutSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("an under-partitioned frame widens to defaultParallelism") {
    val cores = spark.sparkContext.defaultParallelism
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assume(cores > 1) // local[4] in GraftSpark
    val wide = Tables.fanOut(narrow)
    assert(wide.rdd.getNumPartitions == cores)
    // values survive the round-robin untouched
    assert(wide.as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("a frame at or past core count passes through with no exchange") {
    val cores = spark.sparkContext.defaultParallelism
    val already = (1 to 100).toDF("x").repartition(cores)
    assert(Tables.fanOut(already) eq already)
    val wider = (1 to 100).toDF("x").repartition(cores * 2)
    assert(Tables.fanOut(wider) eq wider)
  }
}
