package graft.lake

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Range-clustered writes — the data-skipping complement to partitioning
 * and bucketing: `repartitionByRange` + `sortWithinPartitions` on the
 * cluster keys gives every output file a DISJOINT key range, so parquet
 * footer min/max statistics prune whole files (and row groups within
 * them) for selective range scans. Partition dirs prune coarse dimensions
 * (day); clustering prunes within a partition (user id, order key) where
 * directory-per-value would explode the namespace.
 *
 * At 100 TB the difference is a range query touching the 2 files whose
 * [min,max] straddle the predicate instead of all ~800 per day.
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
