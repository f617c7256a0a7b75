package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user-activity event (the `events` table shape, nanos epoch ts). */
final case class UserEvent(userId: Long, tsNanos: Long, eventType: String, value: Double)

/** Accumulating per-user session state. */
final case class SessionState(startNanos: Long, lastNanos: Long, nEvents: Int,
    totalValue: Double)

/** An emitted (closed or in-progress) session. */
final case class SessionOut(userId: Long, startNanos: Long, endNanos: Long,
    nEvents: Int, totalValue: Double, closed: Boolean)

/** Custom stateful streaming: gap-based sessionization with
  * flatMapGroupsWithState + processing-time timeouts — the
  * KeyValueGroupedDataset state primitive (bounded per-key state; sessions
  * close either by an explicit gap in event time or by state timeout when a
  * user goes quiet). The batch analog is harness query q26_sessionize.
  */
object Sessionize {

  val GAP_NANOS: Long = 3600L * 1000000000L // 1 hour

  def updateSession(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, s.startNanos, s.lastNanos, s.nEvents,
        s.totalValue, closed = true))
    }
    val sorted = events.toArray.sortBy(_.tsNanos)
    if (sorted.isEmpty) return Iterator.empty
    val out = collection.mutable.ArrayBuffer.empty[SessionOut]
    var cur = state.getOption.orNull
    for (e <- sorted) {
      if (cur == null) {
        cur = SessionState(e.tsNanos, e.tsNanos, 1, e.value)
      } else if (e.tsNanos - cur.lastNanos > GAP_NANOS) {
        out += SessionOut(userId, cur.startNanos, cur.lastNanos, cur.nEvents,
          cur.totalValue, closed = true)
        cur = SessionState(e.tsNanos, e.tsNanos, 1, e.value)
      } else {
        cur = SessionState(cur.startNanos, e.tsNanos, cur.nEvents + 1,
          cur.totalValue + e.value)
      }
    }
    state.update(cur)
    // only applies under ProcessingTimeTimeout (flushQuietUsers mode)
    try state.setTimeoutDuration("30 seconds") catch {
      case _: UnsupportedOperationException => ()
    }
    out.iterator
  }

  /** Streaming sessionization over a stream of UserEvents. Output: closed
    * sessions (append semantics via flatMap emission).
    * @param flushQuietUsers enable processing-time timeouts so sessions of
    *   users who go quiet flush after 30s. Note: timeout scheduling keeps
    *   the micro-batch engine triggering, so `processAllAvailable` never
    *   quiesces — use only with an explicit processing-time trigger. */
  def sessions(events: Dataset[UserEvent],
      flushQuietUsers: Boolean = false): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (flushQuietUsers) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout)(updateSession)
  }
}
