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

  test("an externally-dropped cache entry self-heals on next access") {
    // the round-9 driver-bench eviction class: some OTHER actor owns or
    // drops the shared frame's CacheManager entry (same-canonical-plan
    // persist races, a query-local release, LRU churn) — the holder used
    // to keep handing out the dead frame, silently re-running its lineage
    // for every consumer until session end
    Shared.drainHeals() // start clean
    val tag = s"shared_heal_${System.nanoTime()}"
    val f = Shared.frame(spark, "/tmp/sfHeal", tag)(
      Seq((1L, "a")).toDF("id", "s"))
    f.count()
    assert(f.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // an outside unpersist (not via Shared.clear) kills the cache entry
    f.unpersist(true)
    assert(f.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // next access re-persists and logs the heal under the frame's tag
    val f2 = Shared.frame(spark, "/tmp/sfHeal", tag)(
      fail("self-heal must re-persist, not rebuild the DataFrame"))
    assert(f2 eq f)
    assert(f2.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(Shared.drainHeals() == Seq(tag))
    // a healthy access heals nothing and the drained log stays drained
    Shared.frame(spark, "/tmp/sfHeal", tag)(fail("cached")).count()
    assert(Shared.drainHeals().isEmpty)
    Shared.clear(spark)
  }

  test("peek also self-heals") {
    Shared.drainHeals()
    val tag = s"shared_heal_peek_${System.nanoTime()}"
    val f = Shared.frame(spark, "/tmp/sfHeal", tag)(
      Seq((1L, "a")).toDF("id", "s"))
    f.unpersist(true)
    val p = Shared.peek(spark, "/tmp/sfHeal", tag)
    assert(p.exists(_ eq f))
    assert(f.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    assert(Shared.drainHeals() == Seq(tag))
    Shared.clear(spark)
  }

  test("liveTags reports registered entries and drops on unpersist") {
    // the bench's eviction-audit downgrade rule: a `gone` RDD under a
    // label whose tag is still live here was a superseded build
    // intermediate; a tag ABSENT here means the frame's entry is really
    // gone (a genuine eviction stays flagged)
    val tag = s"shared_live_${System.nanoTime()}"
    val f = Shared.frame(spark, "/tmp/sfLive", tag)(
      Seq((1L, "a")).toDF("id", "s"))
    assert(Shared.liveTags(spark, "/tmp/sfLive").contains(tag))
    assert(!Shared.liveTags(spark, "/tmp/sfOther").contains(tag))
    f.unpersist(true)
    assert(!Shared.liveTags(spark, "/tmp/sfLive").contains(tag))
    Shared.clear(spark)
  }

  test("sessions cycling over one context are LRU-evicted past the cap") {
    // the round-4 leak: newSession() frames accumulated until context end
    Shared.clear(spark) // main session must not be the LRU victim below
    val tag = s"shared_lru_${System.nanoTime()}"
    var builds = 0
    def build = { builds += 1; Seq((1L, "a")).toDF("id", "s") }
    val s0 = spark.newSession()
    Shared.frame(s0, "/tmp/sfLru", tag)(build)
    assert(builds == 1)
    // s0's frame stays cached while the session count is within the cap...
    Shared.frame(s0, "/tmp/sfLru", tag)(build)
    assert(builds == 1)
    // ...then MaxSessionsPerContext newer sessions push s0 out as the LRU
    val extras = (1 to Shared.MaxSessionsPerContext).map { _ =>
      val s = spark.newSession()
      Shared.frame(s, "/tmp/sfLru", tag)(build)
      s
    }
    assert(builds == 1 + Shared.MaxSessionsPerContext)
    Shared.frame(s0, "/tmp/sfLru", tag)(build)
    assert(builds == 2 + Shared.MaxSessionsPerContext) // s0 was evicted
    (s0 +: extras).foreach(Shared.clear)
  }
}
