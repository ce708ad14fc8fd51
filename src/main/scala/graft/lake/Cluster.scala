package graft.lake

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Range-clustered writes — the data-skipping complement to partitioning
 * and bucketing: `repartitionByRange` + `sortWithinPartitions` on the
 * cluster keys gives every output file a DISJOINT key range, so parquet
 * footer min/max statistics skip row groups (vanilla Spark prunes at
 * row-group granularity during the read; a stats-indexed table format —
 * Delta/Iceberg — would skip the same files at planning time) for
 * selective range scans. Partition dirs prune coarse dimensions (day);
 * clustering prunes within a partition (user id, order key) where
 * directory-per-value would explode the namespace.
 *
 * At 100 TB the difference is a range query decoding the ~2 files' worth
 * of row groups whose [min,max] straddle the predicate instead of all
 * ~800 per day. Multi-column point/box workloads: see [[ZOrder]].
 *
 * Range boundaries come from Spark's sampling of THIS write's input — a
 * single job, so the instability of `repartitionByRange` across separate
 * jobs (see graft.ops.Prefix) does not apply; every row lands under the
 * same boundary set that was sampled.
 */
object Cluster {

  /** Write `df` as `nFiles` range-clustered parquet files on `keys`. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
                     keys: Column*): Unit = {
    require(nFiles > 0 && keys.nonEmpty)
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }
}
