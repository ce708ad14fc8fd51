package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured Streaming sessionization (SURVEY.md §2.8): the same 30-minute
 * gap semantics as the batch `sessionize_30min` catalog query, expressed
 * with `session_window` so it runs identically over a bounded DataFrame or
 * a `readStream` source.
 *
 * Streaming usage:
 * {{{
 *   spark.readStream.schema(eventSchema).parquet(lakePath)
 *     .transform(Sessions.sessionize(_))
 *     .writeStream.outputMode("append").format("parquet")...
 * }}}
 * The 1-hour watermark bounds state: sessions close (and emit, in append
 * mode) once event time passes session end + watermark — at 100 TB/day this
 * is what keeps per-user session state from growing without bound.
 *
 * Boundary note vs the batch query: `session_window` starts a new session
 * when a gap is >= the gap duration, the batch lag+cumsum starts one when
 * strictly >; they differ only for gaps of exactly 30:00.000000.
 */
object Sessions {

  /**
   * Streaming exact dedup with bounded state: duplicates arriving within
   * the watermark horizon are dropped, state for older keys is evicted —
   * the streaming twin of the batch `dedup_exact` catalog query (a 100 TB
   * ingest can't keep every key forever; the watermark is the contract for
   * how late a duplicate may arrive).
   */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("session_value"))
}
