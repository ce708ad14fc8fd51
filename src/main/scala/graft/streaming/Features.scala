package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One valued event on the wire (input to the feature maintainer). */
final case class FeatureEvent(
    user_id: Long, ts: Timestamp, event_id: Long, event_type: String,
    value: Double)

/** Per-user running feature state. Spend is held in integer CENTS — the
  * lake's `value` column is 2-decimal-clean, so the running sum stays
  * exact across any arrival order or micro-batch split (the streaming
  * image of graft.ops.Exact's decimal-sum discipline). */
final case class FeatureState(
    nEvents: Long, nPurchases: Long, valueCents: Long,
    firstUs: Long, lastUs: Long)

/** The emitted per-user feature row (one per user per touched batch). */
final case class UserFeatureRow(
    user_id: Long, n_events: Long, n_purchases: Long, event_value: Double,
    first_us: Long, last_us: Long)

/**
 * Streaming twin of the event-behavior half of the oracle-checked
 * `train_user_features` catalog query: a continuously-maintained per-user
 * feature row (volume, purchases, exact running spend, recency bounds) —
 * the online feature store a serving-time model reads, updated as events
 * arrive instead of recomputed nightly.
 *
 * State budget: one fixed-width [[FeatureState]] per user with activity
 * inside the idle horizon; `mapGroupsWithState` with an event-time timeout
 * evicts users idle past `idleDays` once the watermark passes, keeping
 * state proportional to ACTIVE users. Every update is associative
 * arithmetic on the state record (counts, integer cents, min/max), so the
 * emitted row after any sequence of micro-batches equals the batch
 * aggregate over the same events — FeaturesSpec's gate.
 */
object Features {

  // full microsecond precision: getTime is millis-truncated, the sub-ms
  // digits live in getNanos (unix_micros parity with the catalog query)
  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def step(s: FeatureState, e: FeatureEvent): FeatureState =
    FeatureState(
      nEvents = s.nEvents + 1,
      nPurchases = s.nPurchases + (if (e.event_type == "purchase") 1 else 0),
      valueCents = s.valueCents + math.round(e.value * 100),
      firstUs = math.min(s.firstUs, us(e.ts)),
      lastUs = math.max(s.lastUs, us(e.ts)))

  private val empty = FeatureState(0L, 0L, 0L, Long.MaxValue, Long.MinValue)

  private def row(userId: Long, s: FeatureState): UserFeatureRow =
    UserFeatureRow(userId, s.nEvents, s.nPurchases, s.valueCents / 100.0,
      s.firstUs, s.lastUs)

  def track(events: Dataset[FeatureEvent], idleDays: Int = 30,
            watermark: String = "1 hour"): Dataset[UserFeatureRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[FeatureState, UserFeatureRow](
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[FeatureEvent],
         state: GroupState[FeatureState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            row(userId, last) // final snapshot on eviction
          } else {
            val s = batch.foldLeft(state.getOption.getOrElse(empty))(step)
            state.update(s)
            state.setTimeoutTimestamp(s.lastUs / 1000 + idleDays * 86400000L)
            row(userId, s)
          }
      }
  }

  /** Batch twin: the same fold over all events at once — equality with
    * [[track]]'s final emissions (and with the catalog query's event-side
    * columns) is FeaturesSpec's gate. */
  def trackBatch(events: Dataset[FeatureEvent]): Dataset[UserFeatureRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroups { (userId: Long, it: Iterator[FeatureEvent]) =>
        row(userId, it.foldLeft(empty)(step))
      }
  }
}
