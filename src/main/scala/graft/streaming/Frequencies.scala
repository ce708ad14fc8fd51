package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CountMinSketch

/**
 * Continuous per-window frequency sketches — the streaming twin of the
 * batch `agg_cms_probe_counts`: one [[CountMinSketch]] grid per window,
 * depth×width longs of state regardless of key cardinality, merged across
 * micro-batches by the engine's partial aggregation. This is the shape
 * that answers "how often did key K occur in window W" for keys chosen
 * AFTER the stream ran — exact per-key counting would need unbounded
 * per-window state (one counter per distinct key; user-id grain makes
 * that the whole user table per window), the sketch caps it at the grid.
 *
 * Append-mode with a watermark: a window's sketch row is emitted once,
 * when the watermark passes its end; downstream, day sketches union into
 * months by elementwise addition (the [[CountMinSketch]] merge law).
 */
object Frequencies {

  /** `events` must carry (`ts` timestamp, `keyCol`). One finished sketch
    * row per closed window. */
  def windowedCms(events: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024,
                  windowDur: String = "10 minutes",
                  watermark: String = "20 minutes"): DataFrame = {
    val cms = udaf(new CountMinSketch(depth, width))
    events
      .select(col("ts"),
        CountMinSketch.cells(col(keyCol), depth, width).as("cells"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(cms(col("cells")).as("sketch"))
      .select(col("window.start").as("win_start"), col("sketch"))
  }

  /** Batch-side readout: point estimates of `k` against a sketch column
    * produced by [[windowedCms]] (same depth/width dials). */
  def estimate(sketch: Column, k: Column, depth: Int = 4,
               width: Int = 1024): Column =
    CountMinSketch.estimate(sketch, k, depth, width)
}
