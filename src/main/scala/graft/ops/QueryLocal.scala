package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of QUERY-LOCAL persisted frames — persists whose only consumer
  * is the lazy DataFrame a single catalog entry returns (MIS round unions,
  * the set-sim join's per-doc prefix frame, per-query bigram tables, …).
  *
  * Such a frame cannot unpersist itself: at build time nothing has run yet,
  * and after the driver materializes the query nobody holds the reference.
  * Left alone, a 288-query session accumulates dozens of dead cache entries
  * whose eviction pressure measurably slows LATER queries (r6: q_mis ran
  * 4.9 s cold but 6.9 s warm purely from cache churn). So the build sites
  * register here, and the harness drains the registry when it KNOWS a
  * query's execution finished:
  *
  *  - `Verify` releases after every query — the 25-min full-catalog run
  *    holds at most one query's working set beyond the [[Shared]] frames;
  *  - `Bench` releases after every run in every pass: each pass pays its
  *    own local cache builds (the honest single-query price), and live
  *    pressure stays bounded by one query's working set. (Round 7 kept
  *    pass-1 entries alive as pass-2 cache hits; the catalog-wide pileup
  *    at the pass boundary taxed the heavy queries 2-4×.)
  *
  * Frames that several catalog entries share deliberately (the similarity
  * base vectors, LSH buckets, the [[Shared]] holder's iterative results)
  * must NOT be tracked here — this registry is for single-consumer caches
  * only. Unreleased entries (test suites, library users who never drain)
  * are no worse off than before: the frames just live until session end. */
object QueryLocal {

  private val frames = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, Long), DataFrame]
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Register a query-local persisted frame; returns it unchanged. */
  def track(df: DataFrame): DataFrame = {
    frames.put((df.sparkSession, tick.incrementAndGet()), df)
    df
  }

  /** Remove and return every frame tracked for `spark` since the last
    * drain, oldest first. The caller owns the unpersist decision. */
  def drain(spark: SparkSession): Seq[DataFrame] = {
    val ks = frames.keys.filter(_._1 eq spark).toSeq.sortBy(_._2)
    ks.flatMap(frames.remove(_))
  }

  /** Persist at MEMORY_AND_DISK and track — the chainable spelling for
    * query-local cache sites: `.transform(QueryLocal.persistTracked)`.
    *
    * A frame whose canonicalized plan is ALREADY cached (a [[Shared]]
    * spine, another query's still-live local frame, a raw session-level
    * persist like the similarity base vectors) passes through untouched:
    * persisting it would be a no-op, but tracking it would hand its cache
    * entry to [[release]] — Spark's CacheManager keys entries by
    * canonical plan, so the unpersist after this one query would evict
    * the OWNER's cache and every later consumer would silently rebuild
    * (r8: setSimJoin tracked the shared shingle spine this way, evicting
    * it for the rest of the 341-query session). */
  def persistTracked(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else track(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Drain and unpersist (non-blocking) every tracked frame of `spark`. */
  def release(spark: SparkSession): Unit =
    drain(spark).foreach(unpersistQuietly)

  /** Unpersist swallowing the races a dead/stopped session can throw. */
  def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(false) catch { case _: Throwable => () }
}
