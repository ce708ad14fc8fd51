package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Compactor-hierarchy buffer: `levels(l)` holds items of weight `2^l`;
  * `parities` bit `l` is the alternating-offset state of level `l`'s next
  * compaction (deterministic stand-in for KLL's coin flip). */
case class KllBuf(n: Long, parities: Long, levels: Seq[Seq[Long]])

/** Finished readout: exact count + rank-sketch quantile estimates. */
case class KllQuantiles(n: Long, p25: Double, p50: Double, p75: Double,
                        p95: Double)

/**
 * Mergeable rank-based quantile sketch over an integer-cents column — the
 * UNBOUNDED-domain companion of [[HistogramSketch]]: that sketch needs a
 * dialed-in [lo, hi] span and clamps outliers into its edge bins; this one
 * adapts to any value range with no dial at all, the KLL/MRL compactor
 * hierarchy (Karnin-Lang-Liberty 2016; Manku-Rajagopalan-Lindsay 1998):
 *
 *  - level `l` holds up to `k` items, each standing for `2^l` originals;
 *  - a full level sorts and keeps one item of each adjacent pair at
 *    doubled weight (total weight is conserved, an odd leftover stays);
 *  - the kept index alternates per compaction via a parity bit carried in
 *    the buffer — DETERMINISTIC, unlike KLL's random coin, so a fixed
 *    input through a fixed merge tree always reproduces its output, and
 *    the pair-alternation cancels the keep-upper bias the way the coin
 *    does in expectation.
 *
 * State is O(k · log(n/k)) longs per group regardless of volume, partials
 * merge by level-wise concatenation + recompaction (parities XOR —
 * commutative), so the same UDAF runs in a watermarked streaming window
 * and a batch aggregate. Groups with fewer than `k` values never compact:
 * the sketch holds the exact multiset and the readout is EXACT (and
 * arrival-order independent) — the stream==batch equality regime. Beyond
 * that, rank error after R compactions at level l is ≤ R_l · 2^(l-1) with
 * R_l ≈ n/(k·2^l), giving ε ≈ log2(n/k)/k relative rank error — k=256
 * holds ~3% at n=50k, tightening as k grows.
 *
 * Readout follows the [[HistogramSketch]] discipline: integer rank test
 * (100·cum ≥ q·n), ONE IEEE division per estimate at the end.
 */
class KllSketch(k: Int = 256) extends Aggregator[Long, KllBuf, KllQuantiles] {

  require(k >= 8 && k % 2 == 0, s"k must be even and >= 8: $k")
  require(k <= (1 << 20), s"k unreasonably large: $k")

  override def zero: KllBuf = KllBuf(0L, 0L, Nil)

  /** Compact every full level bottom-up. A full level compacts WHOLLY
    * (eager): sorted, one of each adjacent pair promoted at doubled
    * weight, odd leftover retained — weight is conserved exactly. */
  private def compacted(n: Long, parities0: Long,
                        levels0: Seq[Seq[Long]]): KllBuf = {
    var levels = levels0.toVector
    var par = parities0
    var l = 0
    while (l < levels.length) {
      if (levels(l).size >= k) {
        val sorted = levels(l).toArray
        java.util.Arrays.sort(sorted)
        val off = ((par >> l) & 1L).toInt
        par ^= 1L << l
        val nPairs = sorted.length / 2
        val keep = (0 until nPairs).map(i => sorted(2 * i + off))
        val rem: Vector[Long] =
          if (sorted.length % 2 == 1) Vector(sorted.last) else Vector.empty
        levels = levels.updated(l, rem)
        if (l + 1 >= levels.length) levels = levels :+ Vector.empty[Long]
        levels = levels.updated(l + 1, levels(l + 1) ++ keep)
      }
      l += 1
    }
    KllBuf(n, par, levels)
  }

  override def reduce(b: KllBuf, v: Long): KllBuf = {
    val levels =
      if (b.levels.isEmpty) Vector(Vector(v))
      else b.levels.toVector.updated(0, v +: b.levels.head.toVector)
    if (levels.head.size < k) KllBuf(b.n + 1, b.parities, levels)
    else compacted(b.n + 1, b.parities, levels)
  }

  override def merge(a: KllBuf, b: KllBuf): KllBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val depth = math.max(a.levels.length, b.levels.length)
      val combined = Vector.tabulate(depth) { l =>
        (a.levels.lift(l).getOrElse(Nil) ++ b.levels.lift(l).getOrElse(Nil)).toVector
      }
      compacted(a.n + b.n, a.parities ^ b.parities, combined)
    }

  override def finish(buf: KllBuf): KllQuantiles = {
    if (buf.n == 0) return KllQuantiles(0L, 0d, 0d, 0d, 0d)
    val items = (for {
      (lv, l) <- buf.levels.zipWithIndex.iterator
      v <- lv.iterator
    } yield (v, 1L << l)).toArray
    java.util.Arrays.sort(items, Ordering.by((x: (Long, Long)) => x))
    val w = items.iterator.map(_._2).sum // == n: compaction conserves weight
    def est(q: Int): Double = {
      var cum = 0L
      var i = 0
      while (i < items.length) {
        cum += items(i)._2
        if (100L * cum >= q * w) return items(i)._1 / 100.0
        i += 1
      }
      items.last._1 / 100.0
    }
    KllQuantiles(buf.n, est(25), est(50), est(75), est(95))
  }

  override def bufferEncoder: Encoder[KllBuf] = Encoders.product[KllBuf]
  override def outputEncoder: Encoder[KllQuantiles] =
    Encoders.product[KllQuantiles]
}
