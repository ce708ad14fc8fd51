package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire (input to the stateful sessionizer). */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Accumulating per-user session state. */
final case class SessionState(
    startUs: Long, lastUs: Long, nEvents: Long, totalValue: Double)

/** One closed session (output). */
final case class ClosedSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long,
    session_value: Double)

/**
 * Custom-state sessionization via `flatMapGroupsWithState` (SURVEY §2.8's
 * "custom state" row): where `session_window` (graft.streaming.Sessions)
 * lets Spark manage session state declaratively, this variant owns the
 * state machine — the shape needed when sessions carry bespoke state
 * (funnels in progress, per-session ML features, fraud counters) that a
 * windowed aggregate can't express.
 *
 * Semantics match the batch `sessionize_30min` catalog query: a gap
 * STRICTLY greater than `gapMinutes` closes the session. Sessions also
 * close on event-time timeout once the watermark passes last-event +
 * gap (bounding state at 100 TB/day: one small SessionState per active
 * user, dropped at timeout).
 */
object StatefulSessions {

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000 * 1000

    // full microsecond precision (getTime truncates to millis; sub-ms
    // digits live in getNanos) — gap arithmetic must match the catalog's
    // unix_micros to the microsecond at session boundaries
    def us(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: emit and drop the session
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue))
          } else {
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            // micro-batches are not time-ordered within a group: sort here
            batch.toSeq.sortBy(e => (us(e.ts), e.value)).foreach { e =>
              val t = us(e.ts)
              cur match {
                case Some(s) if t - s.lastUs > gapUs =>
                  closed += ClosedSession(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) if s.startUs - t > gapUs =>
                  // out-of-order event a full gap BEFORE the open session:
                  // its own session, emitted one-shot (a later out-of-order
                  // neighbor can no longer merge with it — the documented
                  // trade of incremental state vs session_window's buffering)
                  closed += ClosedSession(userId, t, t, 1, e.value)
                case Some(s) =>
                  // out-of-order (non-late) events within the gap may precede
                  // the current session start — widen both bounds
                  cur = Some(SessionState(math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.nEvents + 1, s.totalValue + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when no event for `gap` in event time
              state.setTimeoutTimestamp((s.lastUs / 1000) + gapMinutes * 60L * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch twin for spec cross-checks: run the same state machine over a
    * bounded Dataset (flatMapGroupsWithState requires a streaming Dataset,
    * so batch uses plain groupByKey + the same fold). */
  def sessionizeBatch(events: Dataset[SessionEvent], gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[SessionEvent]) =>
        def usOf(t: Timestamp): Long =
          math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        val sorted = it.toSeq.sortBy(e => (usOf(e.ts), e.value))
        val out = Seq.newBuilder[ClosedSession]
        var cur: Option[SessionState] = None
        sorted.foreach { e =>
          val t = usOf(e.ts)
          cur match {
            case Some(s) if t - s.lastUs > gapUs =>
              out += ClosedSession(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(SessionState(s.startUs, t, s.nEvents + 1, s.totalValue + e.value))
            case None => cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach(s =>
          out += ClosedSession(userId, s.startUs, s.lastUs, s.nEvents, s.totalValue))
        out.result().iterator
      }.toDF()
  }
}
