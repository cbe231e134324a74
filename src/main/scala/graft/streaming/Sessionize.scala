package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization of the events stream via
  * `flatMapGroupsWithState` — the Structured Streaming replacement for the
  * reference's driver-side incremental loop state (SURVEY §2.12). One state
  * object per user lives in the checkpointed state store; sessions close
  * when the event-time gap exceeds [[GapSeconds]] and are emitted downstream.
  */
object Sessionize {

  val GapSeconds = 1800L

  final case class Event(user_id: Long, ts_sec: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start: Long, end: Long, n_events: Int,
      total_value: Double)

  /** Per-group transition: fold sorted events into the open session, emitting
    * closed sessions. Pure w.r.t. (events, prior state, watermark) —
    * unit-testable without a streaming query.
    *
    * State lifecycle: every open session arms an event-time timeout at
    * `last + gap`; when the watermark passes it with no new events, the
    * session is emitted on the timeout path and its state removed — so the
    * final session of an idle user is not withheld forever and state-store
    * size is bounded by the number of *currently open* sessions, not the
    * stream's lifetime. */
  def fold(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed last + gap with no new events: close and evict
      val s = state.get
      state.remove()
      return Iterator.single(Session(userId, s.start, s.last, s.n, s.total))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_sec, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_sec - s.last <= GapSeconds =>
          open = Some(SessionState(s.start, e.ts_sec, s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += Session(userId, s.start, s.last, s.n, s.total)
          open = Some(SessionState(e.ts_sec, e.ts_sec, 1, e.value))
        case None =>
          open = Some(SessionState(e.ts_sec, e.ts_sec, 1, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // timeout must sit past the current watermark (late-arriving groups
        // could otherwise arm a timestamp the engine rejects)
        state.setTimeoutTimestamp(math.max((s.last + GapSeconds) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Wire [[fold]] into a streaming Dataset: watermark on the event time
    * (derived from `ts_sec`) + event-time timeout, so idle sessions are
    * closed, emitted, and their state evicted. */
  def sessions(spark: SparkSession, events: Dataset[Event]): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .withColumn("ts_t", timestamp_seconds(col("ts_sec")))
      .withWatermark("ts_t", s"$GapSeconds seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
