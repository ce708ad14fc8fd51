package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table loaders for the graft lake.
 *
 * The engine's unit of data is a partitioned Parquet table (the reference
 * stores one Parquet object per calendar day under Hive-style
 * `year=/month=/day=` paths — /root/reference/src/pipeline/loaders/s3_loader.py:85-86).
 * Test inputs are one flat Parquet file per table; loaders are thin wrappers
 * over `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom.
 *
 * Scale note: nothing here materializes on the driver; a 100 TB table behind
 * the same path layout reads identically (partition pruning via the
 * `year/month/day` columns, column pruning + predicate pushdown via Parquet).
 */
object Tables {

  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")

  /** Plain parquet read of one named table under `sfDir`. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /**
   * The `events` table ships nanosecond-precision timestamps, which Spark's
   * Parquet reader rejects ([PARQUET_TYPE_ILLEGAL] INT64 TIMESTAMP(NANOS)).
   * We read them as raw nanos longs (`spark.sql.legacy.parquet.nanosAsLong`)
   * and surface a microsecond `TimestampType` column, truncating like the
   * oracle's `CAST(ts_ns AS TIMESTAMP)` does (floor division — timestamps in
   * the lake are all post-epoch).
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Integer `div`, NOT `/`: epoch-nanos (~1.7e18) overflow double's 2^53
    // exact-integer range, so float division is off by ±1 µs.
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")
}
