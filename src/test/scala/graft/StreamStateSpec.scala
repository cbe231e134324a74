package graft

import org.scalatest.funsuite.AnyFunSuite

/** The harness-side state-store unload actually empties Spark's JVM-wide
  * provider registry (the reflective call could otherwise silently no-op
  * if the method moved — this pins it to the running Spark version). */
class StreamStateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def loadedProviderCount: Int = {
    val cls = Class.forName(
      "org.apache.spark.sql.execution.streaming.state.StateStore$")
    val mod = cls.getField("MODULE$").get(null)
    // loadedProviders is a private HashMap field; size via reflection
    val f = cls.getDeclaredFields.find(_.getName.contains("loadedProviders"))
      .getOrElse(fail("loadedProviders field not found on StateStore"))
    f.setAccessible(true)
    f.get(mod).asInstanceOf[scala.collection.mutable.Map[_, _]].size
  }

  test("unloadQuietly drops the providers a drained bounded stream leaves") {
    // a stateful bounded stream run loads providers and leaves them
    // registered after the drain
    streaming.StreamingMetrics
      .streamBoundedHourly(spark, GraftSpark.Sf).count()
    assert(loadedProviderCount > 0,
      "expected the drained stream to leave providers registered")
    streaming.StreamState.unloadQuietly()
    assert(loadedProviderCount == 0,
      "unloadQuietly must empty the JVM-wide provider registry")
  }

  test("loadedProviderCount mirrors the registry (the bench's evidence)") {
    // the bench logs this count after every query as registry-empty
    // PROOF — pin the production probe to the same reflective truth the
    // spec-local reader sees, at both a loaded and an emptied registry
    streaming.StreamingMetrics
      .streamBoundedHourly(spark, GraftSpark.Sf).count()
    assert(streaming.StreamState.loadedProviderCount() == loadedProviderCount)
    assert(streaming.StreamState.loadedProviderCount() > 0)
    streaming.StreamState.unloadQuietly()
    assert(streaming.StreamState.loadedProviderCount() == 0)
  }

  test("stream scratch dirs register with TempDirs and sweep cleanly") {
    util.TempDirs.sweep() // drain whatever earlier suites left behind
    val before = util.TempDirs.pending()
    assert(before == 0)
    streaming.StreamingMetrics
      .streamBoundedHourly(spark, GraftSpark.Sf).count()
    assert(util.TempDirs.pending() > 0,
      "bounded stream runners must register their sink+ckpt scratch dirs")
    assert(util.TempDirs.sweep() > 0)
    assert(util.TempDirs.pending() == 0)
  }
}
