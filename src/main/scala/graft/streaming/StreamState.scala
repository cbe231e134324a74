package graft.streaming

/** Harness-side state-store hygiene for the catalog's BOUNDED streaming
  * runs (AvailableNow / processAllAvailable over throwaway temp
  * checkpoints).
  *
  * Spark keeps every state-store provider a query loaded in a JVM-wide
  * registry; a background maintenance task sweeps them (snapshot + file
  * cleanup) on `spark.sql.streaming.stateStore.maintenanceInterval`
  * (60 s). That design serves LONG-RUNNING queries, which revisit their
  * providers every micro-batch. The catalog's stream queries are the
  * opposite shape: each run drains in seconds against a fresh temp
  * checkpoint that is never read again — its providers are pure garbage
  * the moment the query stops, yet they stay registered until a sweep
  * notices they're inactive. Over a 341-query bench session the stream
  * family leaves hundreds of dead providers, and the 60-second sweep over
  * that backlog (snapshot file I/O under the registry lock) collided with
  * whichever query was running when it fired — r9 measured
  * q_stream_interval_join at 3.2 s in isolation but 22-23 s on the two
  * passes that overlapped a sweep in the full session.
  *
  * [[unloadQuietly]] empties the registry; the harness (Bench/Verify)
  * calls it after each query, exactly like [[graft.ops.QueryLocal]]'s
  * release — the sweep then always runs over an empty or one-query-sized
  * set. A LIBRARY user running a real continuous query must NOT call this
  * mid-flight (an active query would just reload its providers from the
  * checkpoint on the next batch — correct, but a latency blip); that is
  * why it lives in the harness path, not inside the runners.
  *
  * `StateStore.unloadAll` and the provider registry are `private[sql]`,
  * so access goes through reflection on the module instance (JVM-public);
  * a REFLECTION failure — method renamed in a future Spark, module shape
  * changed — degrades to the pre-fix behavior (providers wait for the
  * sweep). Fatal JVM errors (OutOfMemoryError & friends) and interrupts
  * are NOT swallowed: an OOM mid-unload must fail the run, and an
  * interrupt must keep its status (round-9 caught all Throwable here,
  * which would have let a corrupted run keep going). */
object StreamState {

  private val StateStoreModule =
    "org.apache.spark.sql.execution.streaming.state.StateStore$"

  private def module(): AnyRef = {
    val cls = Class.forName(StateStoreModule)
    cls.getField("MODULE$").get(null)
  }

  /** Rethrow preserving the reflection wrapper's cause: fatal errors and
    * interrupts propagate (interrupt status restored); everything
    * non-fatal degrades quietly. */
  private def degrade(t: Throwable): Unit = t match {
    case ite: java.lang.reflect.InvocationTargetException
        if ite.getCause != null => degrade(ite.getCause)
    case _: InterruptedException => Thread.currentThread().interrupt()
    case t if !scala.util.control.NonFatal(t) => throw t
    case _ => ()
  }

  def unloadQuietly(): Unit =
    try {
      val m = module()
      m.getClass.getMethod("unloadAll").invoke(m)
    } catch { case t: Throwable => degrade(t) }

  /** Size of the JVM-wide loaded-provider registry, or -1 when the
    * private field cannot be read (field renamed, reflection denied).
    * This is the bench's registry-empty EVIDENCE: after each query's
    * [[unloadQuietly]] the count must be 0 — a nonzero reading names the
    * query whose providers survived the unload (i.e. the maintenance
    * backlog is building again) instead of leaving a later slowdown
    * unattributed. */
  def loadedProviderCount(): Int =
    try {
      val m = module()
      // name-contains, not exact: Scala private vals can mangle the name
      val f = m.getClass.getDeclaredFields
        .find(_.getName.contains("loadedProviders"))
        .getOrElse(return -1)
      f.setAccessible(true)
      f.get(m) match {
        case map: scala.collection.Map[_, _] => map.size
        case map: java.util.Map[_, _] => map.size
        case _ => -1
      }
    } catch {
      case t: Throwable => degrade(t); -1
    }
}
