package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate: ordering is (score desc, key asc) — the same total
  * order a `row_number() OVER (ORDER BY score DESC, key)` window yields. */
case class ScoredKey(score: Double, key: Long)

/**
 * Bounded top-k aggregate: reduces (score, key) rows to the k best under
 * (score desc, key asc), with map-side partials — the scale-path alternative
 * to `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`.
 *
 * Scale rationale: the window formulation shuffles EVERY group row to its
 * group's reducer and sorts the full group before discarding all but k —
 * at 100 TB the shuffle carries the entire aggregate output and the sort is
 * the bottleneck. This aggregate keeps at most k entries per partition per
 * group (a bounded insertion buffer), so the shuffle carries `groups × k`
 * rows and nothing is ever globally sorted. Same two-phase shape as Spark's
 * own TakeOrderedAndProject, but per group.
 *
 * The buffer is a sorted array (size ≤ k, k is small by contract): insertion
 * is O(k) per row after an O(1) reject of rows worse than the current k-th —
 * the common case on skewed data — and merge is a linear array merge.
 *
 * Determinism: ties in `score` break by `key` asc, so the result is a total
 * order — identical for any partitioning and to the window/SQL twin (exact
 * doubles in, e.g. decimal-summed revenue, mean bit-identical comparisons).
 */
class TopKAgg(k: Int) extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
  require(k > 0, s"k must be positive: $k")

  private def better(a: ScoredKey, b: ScoredKey): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(buf: Seq[ScoredKey], row: ScoredKey): Seq[ScoredKey] =
    if (row == null) buf
    else if (buf.size >= k && !better(row, buf.last)) buf // O(1) reject
    else {
      val i = buf.indexWhere(e => better(row, e)) match {
        case -1 => buf.size
        case n  => n
      }
      val grown = (buf.take(i) :+ row) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  override def merge(a: Seq[ScoredKey], b: Seq[ScoredKey]): Seq[ScoredKey] = {
    // linear merge of two sorted runs, truncated at k
    val out = Vector.newBuilder[ScoredKey]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[ScoredKey]): Seq[ScoredKey] = buf

  override def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
  override def outputEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
}
