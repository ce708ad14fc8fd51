package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Cross-engine exact-aggregation discipline.
 *
 * The correctness oracle re-runs every catalog query in a different engine
 * (DuckDB) and hash-compares results. Double summation order differs between
 * engines (and between Spark partitionings of the same data!), so any
 * `sum(double)` is nondeterministic at the ulp level. The lake's money-like
 * columns are all 2-decimal-clean, so we:
 *
 *   1. do per-row arithmetic in double (bit-identical in any IEEE-754 engine),
 *   2. cast each row to a DECIMAL wide enough to recover the exact rational
 *      (2dp inputs -> products have 4dp/6dp),
 *   3. sum decimals (exact, order-independent),
 *   4. cast the total back to double for a stable, engine-neutral output type.
 *
 * This also holds on a 1000-executor cluster: decimal sums are associative,
 * so partial (map-side) aggregation stays enabled and the result is identical
 * for any partitioning.
 */
object Exact {

  /** Exact per-row decimal image of a 2-decimal-clean double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** For products of two 2dp values (e.g. price * (1-discount)). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** For products of three 2dp values (e.g. price * (1-disc) * (1+tax)). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent exact sum of a 2dp double column, output as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of a 4dp-rational double expression, output as double. */
  def sum4(c: Column): Column = sum(dec4(c)).cast("double")

  /** Exact sum of a 6dp-rational double expression, output as double. */
  def sum6(c: Column): Column = sum(dec6(c)).cast("double")

  /** Exact sum of a 4dp-rational with wide integral headroom (power sums:
    * squares/cross-products of money columns reach ~1e10 per row). */
  def sumPow4(c: Column): Column =
    sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Exact mean of a 2dp double column: exact decimal sum / count. */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)
}
