package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-user score state: non-purchase activity vs purchase count, the
  * confusion cell the user currently occupies (None before first event),
  * and the last event time in millis (event-time timeout anchor). */
final case class ScoreState(score: Long, np: Long, cell: Option[String],
                            lastMs: Long)

/** One confusion-cell delta: fold `delta` by `cell` downstream and the
  * running sums ARE the live confusion matrix (a retraction stream — the
  * streaming image of an upsert into a 4-cell scoreboard). */
final case class CellDelta(user_id: Long, cell: String, delta: Int)

/**
 * Streaming twin of `eval_confusion_threshold`'s scoreboard: the live
 * confusion matrix of the high-activity heuristic predicting the
 * heavy-purchaser label, maintained as a DELTA STREAM. Each user occupies
 * one of tp/fp/fn/tn at any moment; when new events move them across a
 * threshold, the maintainer RETRACTS the old cell (−1) and asserts the new
 * (+1). Any additive sink (a dashboard counter, a compacted changelog)
 * folds the deltas into current totals without ever rescanning users —
 * the pattern every continuously-monitored model-quality board needs.
 *
 * Dials: the batch query thresholds on corpus MEDIANS, which no
 * single-pass stream can know; the streaming twin takes FIXED integer
 * thresholds (deployments freeze them from the last batch run — the same
 * frozen-reference posture as [[Drift]]'s reference mix). ScoreboardSpec
 * gates stream-fold == batch at identical thresholds.
 *
 * State budget: one fixed-width [[ScoreState]] per active user;
 * event-time timeout evicts users idle past the horizon, and eviction
 * RETRACTS the user's current cell (−1) as it drops the state. Watermarks
 * bound late data, not future events — a user can always return after the
 * idle horizon — so a freeze-on-evict rule would double-count returners
 * (fresh +1 with no retraction of the frozen cell) and reclassify them
 * from zeroed counts. With retract-on-evict every assertion is eventually
 * matched by a retraction, so the folded matrix is exactly the confusion
 * matrix over users ACTIVE WITHIN THE HORIZON: idle users age out of the
 * board, and a returner re-enters cleanly from zero. State stays bounded
 * by the active-user count (no tombstones). ScoreboardSpec gates both the
 * no-eviction stream-fold == batch equality and the evict/return path.
 */
object Scoreboard {

  private def cellOf(s: ScoreState, predT: Long, labelT: Long): String = {
    val pred = s.score > predT
    val label = s.np > labelT
    if (pred && label) "tp"
    else if (pred && !label) "fp"
    else if (!pred && label) "fn"
    else "tn"
  }

  private def step(s: ScoreState, e: FeatureEvent): ScoreState = {
    val bumped =
      if (e.event_type == "purchase") s.copy(np = s.np + 1)
      else s.copy(score = s.score + 1)
    bumped.copy(lastMs = math.max(s.lastMs, e.ts.getTime))
  }

  def track(events: Dataset[FeatureEvent], predThreshold: Long,
            labelThreshold: Long, idleDays: Int = 30,
            watermark: String = "1 hour"): Dataset[CellDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScoreState, CellDelta](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[FeatureEvent],
         state: GroupState[ScoreState]) =>
          if (state.hasTimedOut) {
            // retract the evicted user's cell: the board tracks users
            // active within the horizon, and a returner must not
            // double-count (their re-entry +1 starts from this clean slate)
            val out = state.getOption.flatMap(_.cell)
              .map(c => CellDelta(userId, c, -1)).iterator
            state.remove()
            out
          } else {
            val prev = state.getOption
              .getOrElse(ScoreState(0L, 0L, None, Long.MinValue))
            val next0 = batch.foldLeft(prev)(step)
            val cell = cellOf(next0, predThreshold, labelThreshold)
            val next = next0.copy(cell = Some(cell))
            state.update(next)
            state.setTimeoutTimestamp(
              next.lastMs + idleDays.toLong * 86400000L)
            prev.cell match {
              case Some(old) if old == cell => Iterator.empty
              case Some(old) => Iterator(
                CellDelta(userId, old, -1), CellDelta(userId, cell, +1))
              case None => Iterator(CellDelta(userId, cell, +1))
            }
          }
      }
  }

  /** Batch twin: each user's FINAL cell, +1 each — what the delta stream
    * must fold to. Equality (per cell, any micro-batch split) is
    * ScoreboardSpec's gate. */
  def trackBatch(events: Dataset[FeatureEvent], predThreshold: Long,
                 labelThreshold: Long): Dataset[CellDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroups { (userId: Long, it: Iterator[FeatureEvent]) =>
        val s = it.foldLeft(ScoreState(0L, 0L, None, Long.MinValue))(step)
        CellDelta(userId, cellOf(s, predThreshold, labelThreshold), +1)
      }
  }
}
