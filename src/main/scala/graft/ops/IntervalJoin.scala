package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval join via fixed-width bucketing — the generic operator
 * Spark lacks natively (a plain `p.ts BETWEEN i.lo AND i.hi` join plans as
 * a nested-loop over each key group, quadratic in the group size).
 *
 * Shape: each interval explodes to the bucket ids it overlaps
 * (`floor(lo/w) .. floor(hi/w)` — a bounded Generate when interval spans
 * are bounded by a few bucket widths); each point maps to its single
 * bucket; the pair space is then an EQUI-join on (keys..., bucket) with
 * the range predicate applied as a post-join filter. A matching pair is
 * emitted exactly once without dedup: the point's bucket is unique, and
 * `lo <= pt <= hi` implies the interval covers that bucket.
 *
 * Scale posture: the equi-join shuffles on (keys, bucket), so a hot key
 * (one user with millions of events) is spread across its time buckets
 * instead of melting one reducer, and per-task pair fanout is bounded by
 * per-(key,bucket) density × interval span, not by per-key row counts.
 * Pick `bucketWidth` ≈ the typical interval span: wider wastes residual
 * filtering, narrower multiplies the interval-side Generate.
 */
object IntervalJoin {

  /**
   * Join `points` to every row of `intervals` whose `[lo, hi]` contains the
   * point's `pt`, matching on `keys` first. `pt`, `lo`, `hi` are long-typed
   * columns on one axis (epoch micros, epoch days, any monotone integer).
   * Output: all point columns + all non-key interval columns.
   */
  def pointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pt: String,
      lo: String,
      hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact integer floor division (`div` truncates toward zero; pmod's
    // non-negative remainder turns it into a floor) — no IEEE arithmetic
    // on the axis, so epoch-micros magnitudes keep every bit
    def bucketOf(name: String): Column =
      expr(s"(`$name` - pmod(`$name`, ${bucketWidth}L)) div ${bucketWidth}L")
    val iv = intervals.withColumn("_ij_bucket",
      explode(sequence(bucketOf(lo), bucketOf(hi))))
    val p = points.withColumn("_ij_bucket", bucketOf(pt))
    val cond = keys.map(k => p(k) === iv(k))
      .foldLeft(p("_ij_bucket") === iv("_ij_bucket"))(_ && _) &&
      p(pt) >= iv(lo) && p(pt) <= iv(hi)
    val ivCols = intervals.columns.filterNot(keys.contains).map(iv(_))
    p.join(iv, cond)
      .select(points.columns.map(p(_)) ++ ivCols: _*)
  }
}
