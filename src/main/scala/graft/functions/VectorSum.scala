package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Aggregation buffer: elementwise running sum (empty until the first row
  * fixes the dimensionality). */
case class VecSumBuf(s: Array[Double])

/**
 * Elementwise vector sum aggregate: `VectorSum` reduces an `array<double>`
 * column to one array of per-position sums, with map-side partials and
 * O(dim) merges — the centroid-build primitive.
 *
 * Scale rationale: the alternative (posexplode to (pos, v) rows, then
 * groupBy) materializes dim× the row count and shuffles twice (once to the
 * (key, pos) grid, once to regroup the arrays). This aggregate keeps the
 * vector whole: one pass, one shuffle of (groups × dim) doubles — at 1e9
 * vectors × 64 dims that is the difference between shuffling partial sums
 * per partition and generating 6.4e10 intermediate rows. Centroid = sums /
 * count (divide at the end — same arithmetic as Spark's own Average), with
 * the caller rounding before any cross-engine comparison.
 *
 * Rows with NULL embeddings are skipped (contribute to neither sum nor the
 * caller's count filter); mixed dimensionalities fail fast — a corpus with
 * ragged embedding widths is corrupt input, not something to average over.
 */
class VectorSum extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {

  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray)

  override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf =
    if (v == null) b
    else if (b.s.isEmpty) VecSumBuf(v.toArray)
    else {
      require(b.s.length == v.length,
        s"ragged embedding width: ${b.s.length} vs ${v.length}")
      var i = 0
      while (i < v.length) { b.s(i) += v(i); i += 1 }
      b
    }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf =
    if (a.s.isEmpty) b
    else if (b.s.isEmpty) a
    else {
      require(a.s.length == b.s.length,
        s"ragged embedding width: ${a.s.length} vs ${b.s.length}")
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      a
    }

  override def finish(b: VecSumBuf): Seq[Double] =
    if (b.s.isEmpty) null else b.s.toSeq

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
