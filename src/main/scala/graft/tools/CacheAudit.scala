package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side RDD-storage audit for the bench: WHO dropped WHOSE cached
  * blocks, WHEN, while WHICH query ran.
  *
  * Round 9's official bench artifact showed the backwards shape — a warm
  * pass costing multiples of its adjacent cold pass (q_setsim_join 8.7 s
  * cold → 56.6 s warm) plus a cluster of queries elevated only in the
  * driver session — and the round-9 verdict's first directive is to name
  * the mechanism with instrumentation instead of inference. This audit is
  * that instrument: snapshots of `sc.getRDDStorageInfo` around every
  * bench pass, diffed, with every RDD id labeled by the warmup part or
  * query that created it, so a storage event reads as
  * "q_X pass 2: shared:dedup_spine lost 412 MB of memory (now on disk)"
  * rather than an unattributable slowdown.
  *
  * Event kinds:
  *  - `mem_drop`    — a pre-existing cached RDD lost memory bytes while
  *                    still registered (LRU eviction under pressure; the
  *                    blocks usually reappear on disk);
  *  - `parts_lost`  — cached partitions disappeared without a matching
  *                    disk copy (a rebuild will recompute them);
  *  - `gone`        — the RDD left the registry entirely. Expected for a
  *                    query's own frames at its post-group release and
  *                    for ContextCleaner GC of dead lineage-cut blocks;
  *                    flagged only for `shared:*`-labeled frames, whose
  *                    storage nothing should ever drop mid-session.
  *  - `cleanup`     — a `gone` the bench downgraded after checking the
  *                    labeled Shared frames still hold live CacheManager
  *                    entries ([[graft.ops.Shared.liveTags]]): the
  *                    departed RDD was a superseded build intermediate
  *                    (dead lineage-cut round block), not the frame.
  *                    Informational; excluded from `evict_shared_n`.
  *
  * Everything here is driver-local metadata (no jobs, no RDD reads): a
  * snapshot walks the block-manager master's per-RDD aggregates, ~O(#live
  * cached RDDs), a few dozen entries in a bench session. */
object CacheAudit {

  final case class Snap(id: Int, name: String, parts: Int, cachedParts: Int,
      mem: Long, disk: Long)

  final case class Event(query: String, pass: String, label: String,
      rddId: Int, kind: String, memBeforeMb: Long, memAfterMb: Long,
      diskAfterMb: Long) {
    def json: String =
      s"""{"q":"$query","pass":"$pass","label":"$label","rdd":$rddId,""" +
        s""""kind":"$kind","mem_mb":[$memBeforeMb,$memAfterMb],""" +
        s""""disk_mb":$diskAfterMb}"""
  }

  def snapshot(spark: SparkSession): Map[Int, Snap] =
    spark.sparkContext.getRDDStorageInfo.map(i =>
      i.id -> Snap(i.id, i.name, i.numPartitions, i.numCachedPartitions,
        i.memSize, i.diskSize)).toMap

  /** Top cached frames by storage memory at a snapshot, aggregated by
    * creator label (round-12 verdict: the driver session's 641 MB storage
    * peak was benign but unattributed — name the frames). Pure over the
    * snapshot + label map so the aggregation is spec-testable; ids the
    * labeler never saw report as "?". */
  def topFrames(snap: Map[Int, Snap],
      labels: scala.collection.Map[Int, String], k: Int): Seq[(String, Long)] =
    snap.values.toSeq.groupBy(s => labels.getOrElse(s.id, "?"))
      .map { case (l, ss) => l -> ss.map(_.mem).sum / (1024L * 1024) }
      .toSeq.filter(_._2 > 0)
      .sortBy { case (l, m) => (-m, l) }.take(k)

  /** Driver storage-memory in use (MB) — max minus remaining across the
    * block managers; in local mode that is the one driver JVM. */
  def storageUsedMb(spark: SparkSession): Long =
    spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)

  /** Total JVM GC time so far (seconds) — per-pass deltas separate "the
    * query got slower" from "the heap did". */
  def gcSec(): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum / 1e3
  }

  private def mb(b: Long): Long = b / (1024 * 1024)

  /** Diff two snapshots into attributed events. `labels` maps RDD id →
    * creator ("shared:dedup_spine", "q:q_setsim_join", …); unknown ids
    * report as "?". `gone` events are emitted only for labels matching
    * `flagGone` (the post-release sweep legitimately drops query-local
    * frames — only shared frames vanishing is a finding). */
  def diff(before: Map[Int, Snap], after: Map[Int, Snap],
      labels: collection.Map[Int, String], query: String, pass: String,
      flagGone: String => Boolean): Seq[Event] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Event]
    for ((id, b) <- before) {
      val label = labels.getOrElse(id, "?")
      after.get(id) match {
        case None =>
          if (flagGone(label) && (b.mem > 0 || b.disk > 0))
            out += Event(query, pass, label, id, "gone", mb(b.mem), 0, 0)
        case Some(a) =>
          if (a.mem < b.mem && b.mem - a.mem >= 1024 * 1024)
            out += Event(query, pass, label, id,
              if (a.cachedParts < b.cachedParts && a.disk <= b.disk)
                "parts_lost" else "mem_drop",
              mb(b.mem), mb(a.mem), mb(a.disk))
      }
    }
    out.toSeq
  }

  /** Ids present in `after` but not `before` — label assignment hook. */
  def newIds(before: Map[Int, Snap], after: Map[Int, Snap]): Seq[Int] =
    (after.keySet -- before.keySet).toSeq.sorted
}
