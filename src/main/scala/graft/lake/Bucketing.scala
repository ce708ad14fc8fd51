package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed tables: pre-shuffle a table ONCE at write time so every future
 * equi-join/aggregation on the bucket key runs exchange-free — the
 * co-located join strategy for repeated 100 TB fact⋈fact joins, where the
 * per-query shuffle, not the scan, is the bottleneck.
 *
 * Spark-native mechanics: `bucketBy(n, key)` + `sortBy` on a saveAsTable
 * parquet write records bucket spec in the catalog; the planner then treats
 * the table's HashPartitioning as satisfied and elides both Exchanges of a
 * sort-merge join between same-bucketed tables (spec-asserted).
 */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** True iff the executed plan of `df` contains no shuffle exchange. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
