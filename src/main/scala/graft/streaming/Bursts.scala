package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One timed event on the wire (input to the burst tracker). */
final case class BurstEvent(user_id: Long, ts: Timestamp)

/** Per-user tracker state: `recentUs` (ascending) holds only events that can
  * still support a not-yet-final trailing window — everything older than
  * (watermark − 24 h) is folded into `finalMax` and evicted, so state is
  * bounded by one user's 24 h + lateness-horizon traffic, never their
  * history. */
final case class BurstState(recentUs: List[Long], finalMax: Long, nEvents: Long)

/** The emitted per-user row (one per touched user per micro-batch; the
  * last emission matches the batch/catalog answer). */
final case class BurstRow(
    user_id: Long, max_burst_24h: Long, n_events: Long, flag_burst: Int)

/**
 * Streaming twin of the oracle-checked `events_user_burst` catalog query:
 * each user's maximum event count inside any trailing 24-hour window,
 * maintained online — the rate-limit / bot-flag signal evaluated as events
 * arrive instead of in a nightly window scan.
 *
 * Exactness under out-of-order arrival: a window ending at event-time `t`
 * is complete once the watermark passes `t` (later-arriving rows below the
 * watermark are dropped by the engine), so ends ≤ watermark fold into
 * `finalMax` and events ≤ (watermark − 24 h) — which can no longer fall in
 * any live frame — are evicted. Pending ends re-count from the retained
 * buffer on every batch, so the per-user snapshot is monotone and its last
 * value equals the batch fold over the same events regardless of
 * micro-batch split or (watermark-admissible) arrival order — BurstsSpec's
 * gate, including a late event that retro-raises an earlier pending window.
 */
object Bursts {

  /** events_user_burst's frame: [t − 86399999999 µs, t], flag at ≥10. */
  val WindowUs = 86399999999L
  val FlagAt = 10L

  // full microsecond precision: getTime is millis-truncated, the sub-ms
  // digits live in getNanos (unix_micros parity with the catalog query)
  private def us(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** counts(i) = events inside the trailing frame ending at sorted(i). */
  private def burstCounts(sorted: IndexedSeq[Long]): IndexedSeq[Long] = {
    var lo = 0
    sorted.zipWithIndex.map { case (t, i) =>
      while (sorted(lo) < t - WindowUs) lo += 1
      (i - lo + 1).toLong
    }
  }

  private def row(userId: Long, mx: Long, n: Long): BurstRow =
    BurstRow(userId, mx, n, if (mx >= FlagAt) 1 else 0)

  def track(events: Dataset[BurstEvent],
            watermark: String = "1 hour"): Dataset[BurstRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, BurstRow](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[BurstEvent],
         state: GroupState[BurstState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + 24 h: every window is final
            val s = state.get
            state.remove()
            val mx = if (s.recentUs.isEmpty) s.finalMax
              else math.max(s.finalMax, burstCounts(s.recentUs.toIndexedSeq).max)
            Iterator(row(userId, mx, s.nEvents))
          } else {
            val s = state.getOption.getOrElse(BurstState(Nil, 0L, 0L))
            val newUs = batch.map(e => us(e.ts)).toSeq
            val merged = (s.recentUs ++ newUs).sorted.toIndexedSeq
            val counts = burstCounts(merged)
            val wUs = state.getCurrentWatermarkMs() * 1000L
            var finalMax = s.finalMax
            var snapshot = s.finalMax
            merged.indices.foreach { i =>
              if (merged(i) <= wUs) finalMax = math.max(finalMax, counts(i))
              snapshot = math.max(snapshot, counts(i))
            }
            val keep = merged.filter(_ > wUs - WindowUs).toList
            val n = s.nEvents + newUs.size
            state.update(BurstState(keep, finalMax, n))
            state.setTimeoutTimestamp(merged.last / 1000L + WindowUs / 1000L + 2L)
            Iterator(row(userId, snapshot, n))
          }
      }
  }

  /** Batch twin: the same two-pointer count over all events at once —
    * equality with [[track]]'s final emissions AND with the catalog
    * query is BurstsSpec's gate. */
  def trackBatch(events: Dataset[BurstEvent]): Dataset[BurstRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).mapGroups { (userId, it) =>
      val sorted = it.map(e => us(e.ts)).toIndexedSeq.sorted
      row(userId, burstCounts(sorted).max, sorted.size.toLong)
    }
  }
}
