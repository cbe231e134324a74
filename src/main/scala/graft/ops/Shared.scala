package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-shared materialized frames, keyed (session, sfDir, tag).
  *
  * Iterative algorithms cut lineage with checkpoints, and checkpointed
  * RDDs are invisible to Spark's CacheManager (unlike a persist, a
  * checkpoint is never matched by canonicalized-plan lookup across
  * invocations) — so when several catalog entries consume one expensive
  * iterative result (the MinHash→CC dedup labels; the transfer-graph
  * PageRank and LPA frames), each would silently re-run the whole subtree.
  * This holder materializes such a frame once per (session, sfDir). Most
  * shared frames are summary-sized (labels/ranks — one row per entity);
  * the two deliberate exceptions are SPINE INPUTS consumed by a dozen
  * catalog entries each (the per-doc shingle arrays and MinHash signature
  * rows) — compact one-row-per-doc forms at MEMORY_AND_DISK, which on a
  * cluster are the explicitly managed scan-once caches a production
  * dedup pipeline would maintain anyway.
  *
  * Assumes data under an sfDir is immutable for the session's lifetime
  * (true for the driver's generated parquet; a mutated sfDir would serve
  * stale results until [[clear]]). Eviction is two-level: everything goes
  * when the owning SparkContext ends, and a long-lived context that cycles
  * many sessions (`spark.newSession()`, test suites) keeps at most
  * [[MaxSessionsPerContext]] sessions' frames — beyond that the
  * least-recently-used session's frames are unpersisted and its reference
  * released. (A weak-keyed map cannot do this: the cached DataFrames
  * strongly reference their owning session, so weak keys would never
  * clear.) */
object Shared {

  /** Per-context cap on sessions with live shared frames; the LRU session
    * past the cap is evicted on the next [[frame]] call. */
  val MaxSessionsPerContext = 4

  private val frames = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]
  // eviction hook is PER CONTEXT, not per session: a per-session listener
  // would itself pin every evicted session on the listener bus forever
  private val evictionHooked = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.SparkContext, Unit]
  private val lastUsed = scala.collection.concurrent.TrieMap
    .empty[SparkSession, Long]
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)
  private val heals = new java.util.concurrent.ConcurrentLinkedQueue[String]

  /** SELF-HEAL a shared frame whose CacheManager entry was dropped
    * behind the holder's back: re-persist and record the event.
    *
    * The holder owns its frames' persists, but Spark's cache registry is
    * keyed by CANONICAL PLAN, session-wide — so an outside actor can drop
    * a shared frame's entry without touching the holder: a caller
    * unpersisting a same-plan Dataset it built independently, or (the
    * round-8/9 bench lesson) a query-local persist registered FIRST on
    * the same plan, making the holder's later `.persist` a no-op and the
    * query's post-run release the cache owner. Before this check, such a
    * drop was PERMANENT: [[frame]] memoizes the DataFrame object, so every
    * later consumer silently re-ran the frame's whole iterative lineage
    * for the rest of the session — the exact signature of a warm pass
    * costing multiples of the cold one. `storageLevel` is a cheap
    * canonical-plan lookup; healing re-persists (the next action will
    * rebuild once, then hit cache again) and logs the tag so the bench
    * can ATTRIBUTE the rebuild instead of leaving a mystery elevation. */
  private def healed(tag: String, df: DataFrame): DataFrame = {
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      heals.add(tag)
      try df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    df
  }

  /** Drain the self-heal event log (tags, oldest first) — the bench reads
    * this after every query so a heal is attributed to the query that
    * triggered it. */
  def drainHeals(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var t = heals.poll()
    while (t != null) { out += t; t = heals.poll() }
    out.toSeq
  }

  /** Tags of `spark`'s shared frames for `sfDir` whose CacheManager entry
    * is still registered (storage level non-NONE). The bench's eviction
    * audit uses this to tell a real shared-frame eviction (entry dropped →
    * tag absent here) from ContextCleaner collection of SUPERSEDED build
    * intermediates that carry the same warmup label: while the entry
    * lives, the InMemoryRelation pins its cache RDD, so an RDD leaving the
    * storage registry under a still-live tag cannot be the frame itself. */
  def liveTags(spark: SparkSession, sfDir: String): Set[String] =
    frames.collect {
      case ((s, d, tag), df) if (s eq spark) && d == sfDir &&
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => tag
    }.toSet

  /** Drop (and unpersist) every shared frame owned by `spark`. */
  def clear(spark: SparkSession): Unit = {
    frames.keys.filter(_._1 eq spark).foreach { k =>
      frames.remove(k).foreach(df => try df.unpersist(false)
        catch { case _: Throwable => () })
    }
    lastUsed.remove(spark)
  }

  /** The cached frame for (session, sfDir, tag) if one exists — for
    * multi-frame producers (the ANF sketch rounds) that build all their
    * frames in one pass and stash each under its own tag: peek first,
    * rebuild-and-stash only on a full miss. */
  def peek(spark: SparkSession, sfDir: String, tag: String): Option[DataFrame] =
    frames.get((spark, sfDir, tag)).map(healed(tag, _))

  /** The frame for (session, sfDir, tag), building and persisting it on
    * first access. A concurrent first-build race persists both candidates
    * but releases the loser's cache entry. */
  def frame(spark: SparkSession, sfDir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    lastUsed.put(spark, tick.incrementAndGet())
    // LRU-evict whole sessions past the per-context cap (never the caller)
    val ctx = spark.sparkContext
    val sessions = lastUsed.keys.filter(s =>
      (s ne spark) && (s.sparkContext eq ctx)).toSeq
    if (sessions.size >= MaxSessionsPerContext)
      clear(sessions.minBy(s => lastUsed.getOrElse(s, 0L)))
    val key = (spark, sfDir, tag)
    frames.get(key).map(healed(tag, _)).getOrElse {
      // one listener per CONTEXT (not per session): it sweeps every session
      // of that context at application end, and session churn never stacks
      // additional listeners on the bus
      if (evictionHooked.putIfAbsent(ctx, ()).isEmpty)
        ctx.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              lastUsed.keys.filter(_.sparkContext eq ctx).foreach(clear)
              evictionHooked.remove(ctx)
            }
          })
      val built = build
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frames.putIfAbsent(key, built) match {
        case None => built
        case Some(winner) => // lost a concurrent first-build race: release ours
          built.unpersist(false); winner
      }
    }
  }
}
