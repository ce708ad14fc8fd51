package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: fixed-width bin counts (allocated lazily so `zero`
  * stays allocation-free on empty partials). */
case class HistBuf(b: Array[Long])

/** Finished sketch readout: row count + histogram-quantile estimates. */
case class HistQuantiles(n: Long, p25: Double, p50: Double, p75: Double,
                         p95: Double)

/**
 * Mergeable fixed-grid histogram-quantile sketch over an integer-cents
 * column — the [[graft.catalog.Relational]] `agg_quantiles_sketch` bin math
 * (integer bins, cum ≥ ceil(q·n/100) tested as 100·cum ≥ q·n, upper-edge
 * estimate, ONE IEEE division at readout) packaged as an `Aggregator` so it
 * runs where the two-level window formulation cannot: a SINGLE aggregation
 * with `nBins` longs of state per group, map-side combinable, and legal in
 * a watermarked streaming window (exact percentiles need the full sorted
 * window; Structured Streaming append mode forbids the stacked aggregate).
 *
 * Bounds are FIXED dial-ins (a stream cannot 2-pass min/max): out-of-range
 * values clamp into the edge bins, which biases those bins' estimates
 * toward the clamp edge — size [lo, hi] from the batch profile
 * (`profile_price_histogram` / `agg_quantiles_sketch`) as a deployment
 * would. Error within range is bounded by one bin width.
 */
class HistogramSketch(loCents: Long, hiCents: Long, nBins: Int = 128)
    extends Aggregator[Long, HistBuf, HistQuantiles] {

  require(nBins >= 2 && nBins <= 65536, s"nBins out of range: $nBins")
  require(hiCents > loCents, s"empty span: [$loCents, $hiCents]")
  private val span = hiCents - loCents + 1
  require(span > 0, s"span [$loCents, $hiCents] overflows int64")
  require(span <= Long.MaxValue / nBins,
    s"span $span overflows the bin multiply at nBins=$nBins")

  override def zero: HistBuf = HistBuf(Array.emptyLongArray)

  private def bins(b: HistBuf): HistBuf =
    if (b.b.nonEmpty) b else HistBuf(Array.ofDim[Long](nBins))

  override def reduce(buf0: HistBuf, v: Long): HistBuf = {
    val buf = bins(buf0)
    // clamp BEFORE the bin multiply: a far-out-of-range value (corrupt
    // stream, saturated double->long cast) would otherwise overflow
    // (v - lo) * nBins and wrap a huge outlier into the WRONG edge bin
    val c = math.max(loCents, math.min(hiCents, v))
    val bin = ((c - loCents) * nBins / span).toInt
    buf.b(bin) += 1
    buf
  }

  override def merge(a: HistBuf, b: HistBuf): HistBuf =
    if (a.b.isEmpty) b
    else if (b.b.isEmpty) a
    else {
      var i = 0
      while (i < nBins) { a.b(i) += b.b(i); i += 1 }
      a
    }

  override def finish(buf: HistBuf): HistQuantiles = {
    if (buf.b.isEmpty) return HistQuantiles(0L, 0d, 0d, 0d, 0d)
    val n = buf.b.sum
    def est(q: Int): Double = {
      var cum = 0L
      var i = 0
      while (i < nBins) {
        cum += buf.b(i)
        if (100L * cum >= q * n)
          return (loCents + (i + 1L) * span / nBins) / 100.0
        i += 1
      }
      (loCents + span) / 100.0
    }
    HistQuantiles(n, est(25), est(50), est(75), est(95))
  }

  override def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
  override def outputEncoder: Encoder[HistQuantiles] =
    Encoders.product[HistQuantiles]
}
