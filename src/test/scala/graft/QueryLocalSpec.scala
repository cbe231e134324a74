package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The tracked-persist registry contract: build sites register, the
  * harness decides when execution is over and releases. */
class QueryLocalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("persistTracked caches; release unpersists and empties the registry") {
    import spark.implicits._
    val df = ops.QueryLocal.persistTracked(Seq(1L, 2L, 3L).toDF("x"))
    df.count()
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    ops.QueryLocal.release(spark)
    assert(df.storageLevel == StorageLevel.NONE)
    // registry drained: a second release touches nothing (no throw, no-op)
    ops.QueryLocal.release(spark)
  }

  test("drain hands ownership to the caller without unpersisting") {
    import spark.implicits._
    val df = ops.QueryLocal.persistTracked(Seq(4L, 5L).toDF("x"))
    df.count()
    val drained = ops.QueryLocal.drain(spark)
    assert(drained.exists(_ eq df))
    // still cached — the caller decides (Bench keeps pass-1 frames for
    // pass 2's cache hits)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    drained.foreach(ops.QueryLocal.unpersistQuietly)
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("persistTracked passes an already-cached plan through untracked") {
    import spark.implicits._
    // simulate a session-shared frame: cached, NOT owned by the registry
    val shared = Seq(7L, 8L).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    shared.count()
    try {
      // a query-local site wrapping the shared frame (the r8 setSimJoin
      // bug shape) must neither track it nor let release evict it —
      // including via a DIFFERENT Dataset with the same canonical plan
      val againSamePlan = Seq(7L, 8L).toDF("x")
      ops.QueryLocal.persistTracked(shared)
      ops.QueryLocal.persistTracked(againSamePlan)
      ops.QueryLocal.release(spark)
      assert(shared.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "release evicted a cache entry the registry never owned")
    } finally shared.unpersist()
  }

  test("release after a catalog query leaves no tracked frames behind") {
    // q_mis tracks its per-round decided unions; after release the
    // registry must be empty (drain returns nothing)
    SparkEntry.queries("q_mis")(spark, GraftSpark.Sf).count()
    ops.QueryLocal.release(spark)
    assert(ops.QueryLocal.drain(spark).isEmpty)
  }
}
