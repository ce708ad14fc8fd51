package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Aggregation buffer: the depth×width counter grid, flattened row-major
  * (allocated lazily so `zero` stays allocation-free on empty partials). */
case class CmsBuf(b: Array[Long])

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
 * `Aggregator`: a depth×width grid of counters; every key increments one
 * counter per row (chosen by that row's hash); a point estimate reads the
 * MIN of a key's cells — always ≥ the true count, over by at most the
 * collision mass ε·N with probability 1−δ (width = ⌈e/ε⌉, depth =
 * ⌈ln 1/δ⌉). The frequency-sketch sibling of [[HistogramSketch]] (ranks)
 * / [[MisraGries]] (top-k) / KMV (distinct): Misra-Gries answers "which
 * keys are heavy", CMS answers "how often is THIS key" for keys chosen
 * AFTER the pass, in depth×width longs of mergeable state — the shape that
 * counts 100 TB in one map-side-combinable pass and merges across
 * days/shards by addition.
 *
 * The hash cells are computed OUTSIDE the aggregator ([[CountMinSketch
 * .cells]]: md5-derived, whole-stage-codegen'd) and fed in as an int
 * array, keeping this class a pure counter-merger; deterministic
 * engine-portable hashing is also what makes the DuckDB oracle twin exact
 * (`agg_cms_probe_counts` reproduces the same cells and collision sums in
 * SQL).
 */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Seq[Int], CmsBuf, Seq[Long]] {

  require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  require(width >= 2 && width <= (1 << 20), s"width out of range: $width")

  override def zero: CmsBuf = CmsBuf(Array.emptyLongArray)

  private def grid(b: CmsBuf): CmsBuf =
    if (b.b.nonEmpty) b else CmsBuf(Array.ofDim[Long](depth * width))

  override def reduce(buf0: CmsBuf, cells: Seq[Int]): CmsBuf = {
    // a NULL key has no identity to count — [[CountMinSketch.cells]] maps
    // it to a NULL array and it is skipped here (count(col) semantics).
    // Without the guard, concat_ws would silently DROP the null and hash
    // the bare row index, piling every null row onto one phantom key whose
    // collision mass inflates real keys' estimates.
    if (cells == null) return buf0
    val buf = grid(buf0)
    require(cells.length == depth,
      s"expected $depth cells, got ${cells.length}")
    var j = 0
    while (j < depth) {
      val c = cells(j)
      require(c >= 0 && c < width, s"cell $c out of [0, $width)")
      buf.b(j * width + c) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf =
    if (a.b.isEmpty) b
    else if (b.b.isEmpty) a
    else {
      var i = 0
      while (i < a.b.length) { a.b(i) += b.b(i); i += 1 }
      a
    }

  override def finish(b: CmsBuf): Seq[Long] = grid(b).b.toSeq

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinSketch {

  /** The depth hash cells of `k`, as one codegen'd array column:
    * cell_j = md5("j:k")'s first 60 bits mod width — deterministic and
    * engine-portable (DuckDB computes the identical cells from the same
    * expression, which is what makes the sketch's oracle twin exact).
    * A NULL key yields a NULL array (skipped by the aggregator) — the
    * formula is unchanged for non-null keys, preserving oracle parity. */
  def cells(k: Column, depth: Int, width: Int): Column =
    when(k.isNull, lit(null)).otherwise(
      array((0 until depth).map { j =>
        (conv(substring(md5(concat_ws(":", lit(j), k)), 1, 15), 16, 10)
          .cast("long") % width).cast("int")
      }: _*))

  /** Point estimate of `k`'s count from a finished `sketch` array column:
    * min over the key's depth cells (1-based element_at). NULL key ->
    * NULL estimate (a NULL key was never counted — see [[cells]]). */
  def estimate(sketch: Column, k: Column, depth: Int, width: Int): Column =
    when(k.isNull, lit(null)).otherwise(
      least((0 until depth).map { j =>
        element_at(sketch,
          (lit(j * width + 1) +
            (conv(substring(md5(concat_ws(":", lit(j), k)), 1, 15), 16, 10)
              .cast("long") % width).cast("int")).cast("int"))
      }: _*))
}
