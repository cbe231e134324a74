package graft

import graft.ops.Shared
import org.scalatest.funsuite.AnyFunSuite

class SharedSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("frame builds once per key and clear() evicts") {
    var builds = 0
    def build = { builds += 1; Seq((1L, "a")).toDF("id", "s") }
    val tag = s"shared_spec_${System.nanoTime()}"
    val f1 = Shared.frame(spark, "/tmp/sfA", tag)(build)
    val f2 = Shared.frame(spark, "/tmp/sfA", tag)(build)
    assert(builds == 1)
    assert(f1 eq f2) // the SAME persisted frame, not a plan-equal copy
    // a different sfDir is a different key
    Shared.frame(spark, "/tmp/sfB", tag)(build)
    assert(builds == 2)
    Shared.clear(spark)
    Shared.frame(spark, "/tmp/sfA", tag)(build)
    assert(builds == 3) // rebuilt after eviction
    Shared.clear(spark) // leave no test frames pinned for other suites
  }
}
