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
   * Spread a table across the cluster before CPU-heavy per-row map work
   * (regex, JSON parsing, hashing). The testdata tables are single parquet
   * files = ONE scan partition, which would serialize such work onto one
   * core; a real 100 TB lake has thousands of files and gets this
   * parallelism from the scan itself, so the round-robin shuffle here is a
   * test-input equalizer, not part of the 100 TB plan shape.
   */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /**
   * The `events` table ships nanosecond-precision timestamps, which Spark's
   * Parquet reader rejects ([PARQUET_TYPE_ILLEGAL] INT64 TIMESTAMP(NANOS)).
   * Sessions reading it MUST set `spark.sql.legacy.parquet.nanosAsLong=true`
   * at build time (as Verify/Bench/Scratch and the test fixture do) — the
   * conf is read at scan planning, so a runtime `spark.conf.set` here would
   * mutate session-global state and could arrive after schema caching. The
   * raw nanos longs surface as a microsecond `TimestampType` column,
   * truncating like the oracle's `CAST(ts_ns AS TIMESTAMP)` does.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) {
      // Fallback for sessions built without the conf (e.g. an external
      // harness session): setting it before the FIRST events read is safe —
      // the hazard is only a set that races a previously planned scan.
      System.err.println(
        "graft WARN: enabling spark.sql.legacy.parquet.nanosAsLong at runtime; " +
          "prefer setting it in the SparkSession builder (see graft.Conf.local)")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
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
