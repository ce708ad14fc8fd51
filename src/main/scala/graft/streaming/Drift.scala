package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One typed event on the wire (input to the drift monitor). */
final case class DriftEvent(ts: Timestamp, event_type: String)

/**
 * Streaming twin of the oracle-checked `drift_event_mix_chi2` catalog
 * query: the event-type mix of each CLOSED event-time window tested
 * against a frozen reference mix (the training period's distribution) —
 * the online data-quality monitor that catches a pipeline regression or
 * bot flood before the next nightly batch does.
 *
 * Two stages so the significance math stays engine-agnostic and testable:
 *  - [[windowCounts]] — the streaming part: a watermarked tumbling-window
 *    count per (window, type), append-mode (only closed windows emit, so
 *    every emitted row is final; state ∝ open windows × live types);
 *  - [[flagDrift]] — a STATIC transform over those counts (works on the
 *    stream's sink table and on a batch frame alike): per (window, type) a
 *    2x2 Pearson chi-square of type-vs-rest × window-vs-reference, decided
 *    in exact DECIMAL(38,0) products exactly like the catalog query — IEEE
 *    only in the reported chi2.
 *
 * DriftStreamSpec gates stream == batch on the counts and the planted
 * positive/negative flag paths.
 */
object Drift {

  def windowCounts(events: Dataset[DriftEvent], windowLen: String = "1 hour",
                   watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"))

  /** Batch twin of [[windowCounts]] over a complete frame. */
  def windowCountsBatch(events: Dataset[DriftEvent],
                        windowLen: String = "1 hour"): DataFrame = {
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"))
  }

  /** Per (window, type) drift decision against `ref` (type → count over the
    * reference period). Types unseen in the reference count as 0 there —
    * a brand-new type with enough volume flags immediately, which is the
    * point. Returns (win_us, event_type, n, win_total, chi2, drift_flag)
    * ordered by (win_us, event_type). */
  def flagDrift(counts: DataFrame, ref: Map[String, Long]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    require(ref.values.forall(_ >= 0) && ref.values.sum > 0,
      "reference mix must be non-empty")
    val dec = DecimalType(38, 0)
    val refDf = ref.toSeq.toDF("event_type", "ref_n")
    val refTotal = ref.values.sum
    val tot = counts.groupBy(col("win_us")).agg(sum(col("n")).as("win_total"))
    val a = col("n").cast(dec)
    val b = (col("win_total") - col("n")).cast(dec)
    val c = col("ref_n").cast(dec)
    val d = (lit(refTotal) - col("ref_n")).cast(dec)
    val num = (a + b + c + d) * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    counts
      .join(broadcast(refDf), Seq("event_type"), "left")
      .na.fill(0L, Seq("ref_n"))
      .join(tot, Seq("win_us"))
      .select(col("win_us"), col("event_type"), col("n"), col("win_total"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("chi2"),
        (num * 1000000 > den * 3841459).cast("int").as("drift_flag"))
      .orderBy(col("win_us"), col("event_type"))
  }
}
