package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix sums — the primitive behind sequence packing (assign
 * documents to fixed token-budget training bins in a stable order). The
 * naive form is `sum(x) OVER (ORDER BY key)`: an un-partitioned window that
 * funnels the ENTIRE corpus through one reducer — the single worst plan
 * shape at 100 TB.
 *
 * Two-phase shape instead (the classic scan algorithm, Blelloch 1990):
 *   1. range-repartition by `key` (total order across partitions; this is
 *      the one shuffle, same as any global sort),
 *   2. per-partition running sums (parallel, no cross-partition traffic),
 *   3. per-partition TOTALS — #partitions rows, metadata-sized — collected,
 *      prefix-summed on the driver, and broadcast back as offsets.
 * Result is row-for-row identical to the global window (spec-checked).
 */
object Prefix {

  /**
   * Adds `cumCol` = running sum of `valueCol` in ascending `key` order
   * (inclusive of the current row). `df` must have unique keys.
   */
  def runningSum(df: DataFrame, key: String, valueCol: String,
                 cumCol: String, partitions: Int = 0): DataFrame = {
    // offsets are summed as exact int64 — a fractional valueCol would get
    // floor-truncated offsets while in-partition sums stayed fractional
    require({
      import org.apache.spark.sql.types._
      Set[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(valueCol).dataType)
    }, s"runningSum requires an integral $valueCol (token counts, bytes, rows)")
    val parts =
      if (partitions > 0) df.repartitionByRange(partitions, col(key))
      else df.repartitionByRange(col(key))
    // MUST materialize before the two consumers below: RangePartitioner
    // seeds its boundary sampling from the rdd id, so re-executing the
    // repartition in a second job can shift boundaries — offsets computed
    // against job 1's partitions would then be applied to job 2's, silently
    // corrupting every cumulative sum after a moved boundary
    val withPid = org.apache.spark.sql.graftbridge.bridge.freshFrame(
      parts.withColumn("_pid", spark_partition_id()).localCheckpoint(true))
    // per-partition totals: one row per partition — metadata, not data
    // (null values count as 0 so a null-bearing partition can't null the
    // offset chain; the window sum below skips nulls the same way)
    val offsets = withPid.groupBy(col("_pid"))
      .agg(sum(coalesce(col(valueCol), lit(0L))).as("_ptot"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Number]("_ptot").longValue())
      .sortBy(_._1)
    // offset of partition i = sum of the totals of partitions before it
    val sumsBefore = offsets.map(_._2).scanLeft(0L)(_ + _)
    val offsetOf = typedlit(offsets.map(_._1).zip(sumsBefore).toMap)
    val inPartW = Window.partitionBy(col("_pid")).orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .withColumn(cumCol,
        sum(col(valueCol)).over(inPartW) +
          coalesce(element_at(offsetOf, col("_pid")), lit(0L)))
      .drop("_pid")
  }

  /**
   * Sequence packing: assign each document to the token-budget bin its
   * FIRST token lands in, filling bins in ascending `key` order (documents
   * may straddle a boundary — the deterministic streaming-pack rule, SQL-
   * expressible, unlike closed-bin first-fit which is inherently serial).
   */
  def packBins(df: DataFrame, key: String, tokensCol: String,
               budget: Long): DataFrame = {
    require(budget > 0)
    runningSum(df, key, tokensCol, "_cum")
      .withColumn("bin_id", floor((col("_cum") - col(tokensCol)) / lit(budget)))
      .drop("_cum")
  }
}
