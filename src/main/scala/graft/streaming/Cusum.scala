package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a monitored metric (e.g. a day's revenue cents). */
final case class MetricPoint(metric: String, ts: Timestamp, value: Long)

/** Two one-sided CUSUM accumulators + points since the last reset;
  * `lastMs` is the newest event time ever folded, carried so a micro-batch
  * of watermark-admissible LATE stragglers cannot rewind the idle-eviction
  * horizon (same discipline as [[Scoreboard]]'s `ScoreState.lastMs`). */
final case class CusumState(sp: Long, sn: Long, n: Long, lastMs: Long = 0L)

/** A change alarm: the metric drifted `side` ("up"/"down") of the
  * reference mean; `stat` is the accumulated evidence at crossing,
  * `n_since_reset` how many points it took. */
final case class CusumAlarm(metric: String, ts: Timestamp, side: String,
                            stat: Long, n_since_reset: Long)

/**
 * Streaming CUSUM change detection (Page 1954) — the ONLINE twin of the
 * batch `ts_cusum_changepoint` locator: that query finds where a level
 * shift happened in a closed series; this operator raises the alarm WHILE
 * it is happening, the standard sequential test a metrics pipeline runs on
 * daily revenue / volume / error-rate streams. Two one-sided accumulators
 * per metric:
 *
 *   S⁺ ← max(0, S⁺ + (x − μ₀ − κ))   alarm "up"   when S⁺ > h
 *   S⁻ ← max(0, S⁻ + (μ₀ − κ − x))   alarm "down" when S⁻ > h
 *
 * with reference mean μ₀, slack κ (half the shift magnitude worth
 * detecting) and decision threshold h — all LONG parameters, so the state
 * fold is pure int64 like the batch twin (no IEEE anywhere). After an
 * alarm both sides reset (Page's restart), so repeated shifts re-alarm.
 *
 * Frozen-reference posture: a single-pass stream cannot know the series
 * mean, so μ₀ is a FIXED parameter (deployments freeze it from the last
 * batch run — exactly [[Drift]]'s frozen reference-mix discipline; the
 * batch `ts_cusum_changepoint` scales the mean out instead, which needs
 * the closed-series total).
 *
 * Ordering contract: points are folded in (event-time, value) order
 * WITHIN each micro-batch, and the fold is sequential per metric, so with
 * in-order delivery per key the stream fold is bit-equal to
 * [[detectBatch]] under ANY micro-batch split (CusumSpec's gate). A
 * late point that lands in a later micro-batch folds late — CUSUM alarm
 * positions are order-sensitive by definition; the watermark bounds how
 * late that can be.
 *
 * State budget: four longs per live metric key (two accumulators, the
 * since-reset count, the eviction anchor), no growth in stream length;
 * event-time timeout drops metrics silent past the horizon.
 */
object Cusum {

  private def fold(sp0: Long, sn0: Long, n0: Long,
                   points: Seq[MetricPoint], mu0: Long, slack: Long,
                   threshold: Long): (CusumState, Seq[CusumAlarm]) = {
    var sp = sp0; var sn = sn0; var n = n0
    val alarms = Seq.newBuilder[CusumAlarm]
    points.foreach { p =>
      sp = math.max(0L, sp + (p.value - mu0 - slack))
      sn = math.max(0L, sn + (mu0 - slack - p.value))
      n += 1
      if (sp > threshold) {
        alarms += CusumAlarm(p.metric, p.ts, "up", sp, n)
        sp = 0L; sn = 0L; n = 0L
      } else if (sn > threshold) {
        alarms += CusumAlarm(p.metric, p.ts, "down", sn, n)
        sp = 0L; sn = 0L; n = 0L
      }
    }
    (CusumState(sp, sn, n), alarms.result())
  }

  /** The streaming detector; see the ordering contract above. */
  def detect(points: Dataset[MetricPoint], mu0: Long, slack: Long,
             threshold: Long, idleDays: Int = 30,
             watermark: String = "1 hour"): Dataset[CusumAlarm] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withWatermark("ts", watermark)
      .groupByKey(_.metric)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (metric: String, batch: Iterator[MetricPoint],
         state: GroupState[CusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(CusumState(0L, 0L, 0L))
            val ordered = batch.toSeq.sortBy(p => (p.ts.getTime, p.value))
            val (folded, alarms) =
              fold(prev.sp, prev.sn, prev.n, ordered, mu0, slack, threshold)
            // max over EVER-seen event time: a batch of late stragglers
            // must not rewind a horizon set by an earlier, newer event
            val lastMs = (prev.lastMs +: ordered.map(_.ts.getTime)).max
            state.update(folded.copy(lastMs = lastMs))
            if (lastMs > 0L)
              state.setTimeoutTimestamp(lastMs + idleDays.toLong * 86400000L)
            alarms.iterator
          }
      }
  }

  /** Batch twin: the same fold over each metric's complete ordered
    * series — what the delta stream must equal under any split. */
  def detectBatch(points: Dataset[MetricPoint], mu0: Long, slack: Long,
                  threshold: Long): Dataset[CusumAlarm] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.metric)
      .flatMapGroups { (_: String, it: Iterator[MetricPoint]) =>
        val ordered = it.toSeq.sortBy(p => (p.ts.getTime, p.value))
        fold(0L, 0L, 0L, ordered, mu0, slack, threshold)._2.iterator
      }
  }
}
