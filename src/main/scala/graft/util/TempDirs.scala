package graft.util

/** Registry of per-invocation SCRATCH directories (bounded-stream sinks
  * and checkpoints) so the harness can sweep them once the query that
  * created them has fully materialized.
  *
  * The catalog's ~25 bounded streaming runners each create a fresh temp
  * sink + checkpoint per invocation (fresh dirs are what make the runs
  * deterministic and re-runnable); nothing reads the dirs again after the
  * run drains and the caller materializes the returned frame. Left alone,
  * a full bench session (341 queries × 2–3 passes) strews several hundred
  * dead directories across `/tmp` — harmless to correctness, but exactly
  * the kind of unaccounted environment drift a cross-session benchmark
  * comparison cannot afford (and on a shared production cluster, leaked
  * scratch is an operational bug outright).
  *
  * Contract mirrors [[graft.ops.QueryLocal]]: runner build sites call
  * [[scratch]] instead of `Files.createTempDirectory`; the harness
  * (Bench/Verify) calls [[sweep]] only AFTER the query's result is
  * materialized (counted or written) — the returned DataFrames read the
  * sink dir lazily, so sweeping early would yield empty reads. Library
  * users who never sweep are exactly where they were before: dirs live
  * until the OS cleans its temp space.
  *
  * NOT for the session checkpoint dir or source staging dirs whose frames
  * may be re-scanned later (a [[graft.ops.Shared]] rebuild re-reads its
  * whole lineage); only register directories that are garbage the moment
  * the creating query finishes. */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  /** Create and register a scratch directory; returns its path string. */
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Delete (recursively, best-effort) every directory registered since
    * the last sweep; returns how many were removed. Failures are ignored
    * — a dir that cannot be deleted is no worse than the pre-sweep
    * behavior (it waits for OS temp cleanup). */
  def sweep(): Int = {
    var n = 0
    var p = dirs.poll()
    while (p != null) {
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        n += 1
      } catch { case scala.util.control.NonFatal(_) => () }
      p = dirs.poll()
    }
    n
  }

  /** Number of registered, not-yet-swept directories (test/report hook). */
  def pending(): Int = dirs.size()
}
