package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming enrichment + continuous KPI gold: stream-static dimension join,
 * watermarked tumbling-window aggregation, and an idempotent partition-
 * overwrite sink — the "events stream in, dimensions sit in the lake,
 * KPIs land upsert-safe" wiring (SURVEY.md §2.8).
 *
 * Scale posture: the dimension side is broadcast (bounded dims — the same
 * rule as the batch star joins), so each micro-batch is a map-side hash
 * join, no stream shuffle. The windowed aggregate keeps state only inside
 * the watermark horizon; the sink overwrites whole group-partitions so a
 * replayed micro-batch converges to the same files instead of appending
 * duplicates.
 */
object Enrich {

  /**
   * Stream-static join: enrich a stream against a static (lake) dimension.
   * The static side is re-read at each micro-batch planning, so a dim
   * refresh in the lake is picked up at the next batch boundary — no
   * restart. Broadcast keeps the stream side shuffle-free; drop the hint
   * only for dims too big to broadcast (then Spark shuffles the BATCH side
   * each micro-batch — usually the wrong trade at 100 TB/day).
   */
  def joinDim(stream: DataFrame, dim: DataFrame, keys: Seq[String],
              broadcastDim: Boolean = true): DataFrame =
    stream.join(if (broadcastDim) broadcast(dim) else dim, keys)

  /**
   * Watermarked tumbling-window KPIs per event_type: the continuous twin of
   * the batch `events_daily_kpis` catalog query, at minute granularity.
   * Decimal-accumulated value sum (graft.ops.Exact discipline); window
   * boundaries surface as epoch-micros (no raw timestamps downstream).
   */
  def windowKpis(events: DataFrame, windowLen: String = "1 minute",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
        col("n_events"), col("total_value"))

  /**
   * Idempotent micro-batch upsert: dynamic partition overwrite keyed by the
   * FULL aggregation group (win_us, event_type), so each arriving update
   * rewrites exactly its group's directory — a replayed/retried batch
   * converges to identical files instead of duplicating rows. This is the
   * exactly-once-effect contract for a parquet gold table without a
   * transactional table format.
   */
  def upsertBatch(batch: DataFrame, path: String): Unit =
    batch.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("win_us", "event_type")
      .parquet(path)

  /** Continuous gold: windowed KPIs upserted to `path` via [[upsertBatch]].
    * Update output mode: late events re-emit their group, and the sink
    * overwrites that group's partition with the corrected row. */
  def kpisToLake(kpis: DataFrame, path: String,
                 checkpoint: String): StreamingQuery =
    kpis.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) => upsertBatch(batch, path))
      .start()
}
