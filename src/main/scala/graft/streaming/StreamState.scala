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
  * `StateStore.unloadAll` is `private[sql]`, so the call goes through
  * reflection on the module instance (JVM-public); any failure — method
  * renamed in a future Spark, registry empty, context gone — degrades to
  * the pre-fix behavior (providers wait for the sweep), never an error. */
object StreamState {
  def unloadQuietly(): Unit =
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      cls.getMethod("unloadAll").invoke(cls.getField("MODULE$").get(null))
    } catch { case _: Throwable => () }
}
