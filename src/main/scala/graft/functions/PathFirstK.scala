package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One event in a user's ordered path: (event-time micros, event id as the
  * tiebreak, event type as the path token). */
case class PathEvent(tsUs: Long, eventId: Long, eventType: String)

/** Bounded aggregation buffer: at most k [[PathEvent]]s, kept sorted
  * ascending by (tsUs, eventId, eventType). */
case class PathBuf(items: Seq[PathEvent])

/**
 * Bounded "first k events as a path string" aggregate — the scale-safe form
 * of `slice(array_sort(collect_list(...)), 1, k)`: the per-group state is
 * AT MOST k rows at every point of the partial/merge tree, so one
 * pathological key (bot traffic with millions of events) costs k*rowsize of
 * aggregation buffer, not its entire history.
 *
 * Spark runs this as a TypedImperativeAggregate with map-side partials:
 * each partition reduces its rows into a k-bounded sorted buffer (O(1)
 * reject when the row sorts after the current k-th — the common case once
 * the buffer fills), and merge is a k-bounded sorted-list merge. The result
 * is identical to the unbounded collect-sort-slice formulation, which
 * remains the oracle's shape (`journey_first10_paths`).
 *
 * INPUT CONTRACT: all three [[PathEvent]] fields must be non-null — the
 * input encoder is non-nullable, so a null ts/event_id/event_type row fails
 * at encode time ("Null value appeared in non-nullable field"), it is not
 * silently skipped. Callers must pre-filter null fields (a null field
 * carries no position in a path anyway) the way `journey_first10_paths`
 * does, mirroring the filter in any oracle.
 */
class PathFirstK(k: Int, sep: String = ">")
    extends Aggregator[PathEvent, PathBuf, String] {
  require(k > 0)

  private val ord: Ordering[PathEvent] =
    Ordering.by(e => (e.tsUs, e.eventId, e.eventType))

  override def zero: PathBuf = PathBuf(Vector.empty)

  override def reduce(b: PathBuf, e: PathEvent): PathBuf =
    if (b.items.size >= k && ord.gteq(e, b.items.last)) b // O(1) hot path
    else {
      val (lo, hi) = b.items.span(x => ord.lt(x, e))
      PathBuf(((lo :+ e) ++ hi).take(k))
    }

  override def merge(a: PathBuf, b: PathBuf): PathBuf = {
    val (x, y) = (a.items.toIndexedSeq, b.items.toIndexedSeq)
    val out = Vector.newBuilder[PathEvent]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.size || j < y.size)) {
      if (j >= y.size || (i < x.size && ord.lteq(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
      n += 1
    }
    PathBuf(out.result())
  }

  override def finish(b: PathBuf): String = b.items.map(_.eventType).mkString(sep)

  override def bufferEncoder: Encoder[PathBuf] = Encoders.product[PathBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
