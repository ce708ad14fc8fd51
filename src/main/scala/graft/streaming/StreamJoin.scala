package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream event-time join: attribute each purchase to the view that
 * preceded it within an attribution horizon — both sides unbounded streams
 * (SURVEY.md §2.8; the streaming twin of the batch
 * `attribution_first_last_touch` / `conversion_latency` family).
 *
 * Scale posture: Spark co-partitions both streams on the join key, so
 * per-micro-batch work is a local state-store probe — no rescan of history.
 * The event-time range condition PLUS both watermarks bound the state: a
 * buffered view is dropped once the purchase-side watermark passes
 * `view_ts + horizon`, so state is O(throughput × horizon) per key range,
 * never O(stream). Without the range condition Spark would keep both sides
 * forever — that unbounded-state shape is the thing this operator exists
 * to avoid.
 */
object StreamJoin {

  /**
   * Inner attribution join: (user_id, view_ts, purchase_ts, latency_s) for
   * every purchase within `horizonMin` minutes after a view by the same
   * user. A purchase matching several views emits one row per qualifying
   * view (downstream picks first/last touch — that ranking is a separate
   * stateful op; the join itself stays multiplicity-faithful).
   */
  def attribute(views: DataFrame, purchases: DataFrame,
                horizonMin: Int = 30,
                watermark: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("user_id"), col("view_ts"), col("purchase_ts"), col("value"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("latency_us"))
  }

  /**
   * Left-outer variant: views that never converted inside the horizon are
   * still emitted (null purchase columns) once the watermark proves no
   * match can arrive — the streaming "abandonment" feed. Same state bound
   * as [[attribute]]; the null row is emitted at watermark passage, so
   * downstream sees it `watermark + horizon` after the view, not instantly.
   */
  def attributeWithAbandonment(views: DataFrame, purchases: DataFrame,
                               horizonMin: Int = 30,
                               watermark: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizonMin MINUTES"),
      "left_outer")
      .select(col("user_id"), col("view_ts"), col("purchase_ts"), col("value"))
  }
}
