package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustered writes — multi-dimensional data skipping.
 * [[Cluster]] gives disjoint file ranges on ONE key prefix: selective on
 * `a`, blind on `b`. Interleaving the bits of both keys makes every output
 * file cover a compact rectangle-union of (a, b) space, so parquet footer
 * min/max statistics skip its row groups for predicates on `a`, on `b`,
 * or on a box over both (vanilla Spark skips at row-group granularity
 * during the read; a stats-indexed table format — Delta/Iceberg — skips
 * the same files at planning time) — the layout trade those formats make
 * for multi-column point-lookup workloads at lake scale.
 *
 * Plan shape: one 1-row min/max aggregate (broadcast back), one map-only
 * projection building the Morton value from static-unrolled bitwise ops
 * (codegen'd — no UDF), one range exchange on `_z`. The z column itself is
 * dropped before the write; skipping works through the ORIGINAL columns'
 * per-file statistics, which the z layout makes tight.
 */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative ints:
    * result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. Static unroll
    * — a fixed expression tree of shifts/masks, whole-stage codegen'd. */
  def morton(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-width bucket id in [0, 2^bits) for `x` given broadcast min/max
    * columns. Integer arithmetic throughout (exact, engine-portable).
    * `(x-lo) * 2^bits` overflows int64 when the key span exceeds
    * 2^(63-bits), silently mis-bucketing — so the multiplier is gated on
    * the observed span and raises instead. The guard lives INSIDE the
    * bucket expression (not a droppable side column) so column pruning
    * can never eliminate it; codegen folds it to one comparison per row. */
  private def bucket(x: Column, lo: Column, hi: Column, bits: Int,
                     dim: String): Column = {
    // try_subtract guards the guard itself: a span >= 2^63 (mixed-sign keys
    // spanning most of int64) overflows hi - lo, which under ANSI would
    // throw before this check and under non-ANSI would wrap negative and
    // satisfy a naive <= — try_subtract yields NULL instead, which fails
    // the condition and routes to raise_error. (The product's own x - lo
    // may still ANSI-throw first for such spans — also a fail-fast, just
    // with the engine's overflow message.)
    val span = try_subtract(hi, lo)
    val mult = when(span.isNotNull && span <= lit(Long.MaxValue >> bits),
      lit(1L << bits))
      .otherwise(raise_error(concat(
        lit(s"ZOrder: $dim span "), hi - lo,
        lit(s" exceeds 2^${63 - bits} for bits=$bits — lower bits or narrow the key"))))
    ((x - lo) * mult) / (hi - lo + 1)
  }

  /**
   * Write `df` as `nFiles` z-clustered parquet files on (`a`, `b`).
   * `bits` buckets per dimension (default 12 → 4096×4096 z cells) bound
   * the bucket-scaling multiplier so `(x-min)*2^bits` stays in int64 for
   * any realistic key domain.
   */
  def writeZClustered(df: DataFrame, path: String, nFiles: Int,
                      a: Column, b: Column, bits: Int = 12): Unit = {
    require(nFiles > 0)
    val stats = df.agg(min(a).as("_alo"), max(a).as("_ahi"),
      min(b).as("_blo"), max(b).as("_bhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", morton(
        bucket(a, col("_alo"), col("_ahi"), bits, "a"),
        bucket(b, col("_blo"), col("_bhi"), bits, "b"), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
      .write.mode("overwrite").parquet(path)
  }
}
