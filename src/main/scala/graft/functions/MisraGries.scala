package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MG summary buffer: parallel arrays (term, residual count), ≤ cap entries. */
case class MgBuf(ks: Array[String], vs: Array[Long])

/**
 * Mergeable Misra-Gries heavy-hitter sketch over a string column: one pass,
 * ≤ `cap` counters of state per partial, output = the surviving candidate
 * terms. Guarantee (Misra-Gries 1982; merge form Agarwal et al., PODS'12
 * "Mergeable Summaries"): after any tree of merges over N total rows, every
 * term with true frequency > N/(cap+1) is present in the output, and each
 * retained residual undercounts its true frequency by ≤ N/(cap+1).
 *
 * Scale rationale: exact term counting shuffles the full token stream
 * (one row per token occurrence) — the dominant cost of a naive top-k over
 * a 100 TB corpus, where the long tail is almost all of the traffic. This
 * sketch reduces each partition to ≤ cap (term, count) pairs map-side, so
 * the shuffle carries `partitions × cap` rows regardless of corpus size.
 * The intended two-pass pattern (see `freq_heavy_hitters`): sketch pass →
 * tiny candidate set → exact counts restricted to candidates (the filter
 * prunes the tail BEFORE the exact shuffle) → exact top-k. When k-th place
 * frequency clears the N/(cap+1) bound, the result is exactly the true
 * top-k — a sketch-assisted exact answer, not an approximation.
 *
 * reduce: classic MG — increment a present counter; insert while < cap
 * counters live; otherwise decrement-all-and-drop-zeros (each decrement-all
 * sheds `cap` stored counts, so there are ≤ N/cap of them: O(N) amortized).
 * merge: sum counters pairwise, then subtract the (cap+1)-th largest
 * residual from all and drop non-positives (the mergeable-summaries rule).
 */
class MisraGries(cap: Int)
    extends Aggregator[String, MgBuf, Seq[String]] {
  require(cap > 0, s"cap must be positive: $cap")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  override def reduce(b: MgBuf, term: String): MgBuf = {
    if (term == null) return b
    val i = b.ks.indexOf(term)
    if (i >= 0) { b.vs(i) += 1; b }
    else if (b.ks.length < cap)
      MgBuf(b.ks :+ term, b.vs :+ 1L)
    else {
      // decrement-all: drop zeros, keep survivors decremented
      val keep = b.vs.indices.filter(j => b.vs(j) > 1)
      MgBuf(keep.map(b.ks).toArray, keep.map(j => b.vs(j) - 1).toArray)
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (a.ks.isEmpty) return b
    if (b.ks.isEmpty) return a
    val m = mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < a.ks.length) { m(a.ks(i)) = a.vs(i); i += 1 }
    i = 0
    while (i < b.ks.length) {
      m(b.ks(i)) = m.getOrElse(b.ks(i), 0L) + b.vs(i); i += 1
    }
    if (m.size <= cap) MgBuf(m.keys.toArray, m.values.toArray)
    else {
      // subtract the (cap+1)-th largest count; strictly larger survive
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val kept = m.iterator.filter(_._2 > cut).toArray
      MgBuf(kept.map(_._1), kept.map(_._2 - cut))
    }
  }

  /** Candidates sorted for a deterministic array (downstream re-counts
    * exactly, so residual counts are internal state, not output). */
  override def finish(b: MgBuf): Seq[String] = b.ks.toSeq.sorted

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
