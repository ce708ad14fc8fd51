package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Continuous value-distribution quantiles per (window, event_type) — the
 * streaming twin of the batch `agg_quantiles_sketch`: one
 * [[graft.functions.HistogramSketch]] per open group, `nBins` longs of
 * state regardless of event volume, merged across micro-batches by the
 * engine's partial aggregation. Exact percentiles are impossible here
 * (append mode forbids both the full-window sort and a stacked bin→pick
 * aggregate); the mergeable sketch is the standard production answer
 * (latency/value dashboards), with error bounded by one bin width of the
 * dialed-in [lo, hi] span.
 *
 * Append-mode with a watermark: a window's quantile row is emitted once,
 * when the watermark passes its end — the contract the lake's idempotent
 * upsert sink (graft.streaming.Enrich.kpisToLake) expects.
 */
object Quantiles {

  /** `events` must carry (`ts` timestamp, `event_type`, `value` double).
    * Cents conversion rounds (value·100 in IEEE can land just under the
    * integer); bounds are cents, sized from the batch profile. */
  def windowed(events: DataFrame, loCents: Long, hiCents: Long,
               windowDur: String = "10 minutes",
               watermark: String = "20 minutes"): DataFrame = {
    val hq = udaf(new graft.functions.HistogramSketch(loCents, hiCents))
    events
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(hq(col("cents")).as("q"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("q.n").as("n"), col("q.p25").as("p25"), col("q.p50").as("p50"),
        col("q.p75").as("p75"), col("q.p95").as("p95"))
  }

  /** [[windowed]] without the [lo, hi] dial: the
    * [[graft.functions.KllSketch]] rank sketch adapts to any value range
    * (no clamp bias, no span sizing from a batch profile) at
    * O(k·log(n/k)) state per open group. Windows smaller than `k` values
    * are read out EXACTLY; larger ones carry ~log2(n/k)/k relative rank
    * error. Same output columns as [[windowed]], drop-in. */
  def windowedKll(events: DataFrame, k: Int = 256,
                  windowDur: String = "10 minutes",
                  watermark: String = "20 minutes"): DataFrame = {
    val kq = udaf(new graft.functions.KllSketch(k))
    events
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(kq(col("cents")).as("q"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("q.n").as("n"), col("q.p25").as("p25"), col("q.p50").as("p50"),
        col("q.p75").as("p75"), col("q.p95").as("p95"))
  }
}
