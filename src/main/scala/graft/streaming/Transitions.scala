package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event on the wire (input to the transition tracker). */
final case class TypedEvent(
    user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

/** Per-user tracker state: the last event seen, by (ts, event_id) order. */
final case class LastSeen(tsUs: Long, eventId: Long, eventType: String)

/** One observed first-order transition. */
final case class Transition(user_id: Long, prev_type: String, next_type: String)

/**
 * Streaming twin of the oracle-checked `events_markov_transitions` catalog
 * query: per user, emit every consecutive (prev -> next) event-type step as
 * it happens. Downstream, `counts` folds the step stream into the same
 * (prev_type, next_type, n) matrix the batch query produces — the
 * continuously-maintained input of a next-action model.
 *
 * State budget: ONE small [[LastSeen]] record per user with any activity
 * inside the idle horizon — `flatMapGroupsWithState` with an event-time
 * timeout drops users idle past `idleMinutes` once the watermark passes
 * (the transition chain simply restarts on their next event; a Markov
 * estimate doesn't want week-old context anyway). That keeps state
 * proportional to ACTIVE users, not all-time users — the 100 TB/day
 * requirement.
 *
 * Ordering contract: events within one micro-batch are sorted by
 * (ts, event_id) before stepping the chain, so in-batch disorder is
 * invisible. An event that arrives in a LATER micro-batch but is
 * event-time-older than the state's last event steps the chain in arrival
 * order (the incremental-state trade, same as StatefulSessions' one-shot
 * branch) — with the watermark bounding how stale such stragglers can be.
 */
object Transitions {

  // full microsecond precision (getTime truncates to millis; sub-ms digits
  // live in getNanos) — chain order must match the catalog's
  // (ts, event_id) to the microsecond
  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def track(events: Dataset[TypedEvent], idleMinutes: Int = 120,
            watermark: String = "1 hour"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[TypedEvent], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            // idle horizon passed: drop the chain (no emission — a timeout
            // ends context, it is not itself a transition)
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[Transition]
            var last = state.getOption
            batch.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
              last.foreach(l => out += Transition(userId, l.eventType, e.event_type))
              last = Some(LastSeen(us(e.ts), e.event_id, e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(l.tsUs / 1000 + idleMinutes * 60L * 1000)
            }
            out.result().iterator
          }
      }
  }

  /** Fold a transition stream into the running (prev, next, n) matrix
    * (complete-mode aggregate over the bounded type-pair domain). */
  def counts(transitions: Dataset[Transition]): DataFrame =
    transitions.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))

  /** Batch twin of [[track]] with no idle horizon: the exact per-user
    * (ts, event_id)-ordered step sequence — equality with the catalog
    * query's lag-window formulation is the StatefulTransitionsSpec gate. */
  def trackBatch(events: Dataset[TypedEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, it: Iterator[TypedEvent]) =>
        val sorted = it.toSeq.sortBy(e => (us(e.ts), e.event_id))
        sorted.iterator.zip(sorted.iterator.drop(1)).map { case (a, b) =>
          Transition(userId, a.event_type, b.event_type)
        }
      }
  }
}
