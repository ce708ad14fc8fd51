package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
   * JDBC-source variant of [[load]] — the external-warehouse extraction
   * posture (the reference pulls day slices from BigQuery,
   * `bigquery_extractor.py:21-83`; SURVEY §2.1-S1 maps that to lake reads,
   * and this is the connector shape for sources that stay behind a SQL
   * endpoint). Spark's JDBC relation pushes projection and filters into
   * the remote engine's WHERE clause, so a day-slice read
   * (`loadJdbc(...).filter(col(dateCol) === day)`) ships only that day
   * over the wire — the reference's one-day-per-query extraction unit,
   * minus its driver-RAM materialization.
   *
   * Scale posture: `partitionCol` + `bounds` + `numPartitions` turn the
   * single-cursor read into N range-parallel cursors
   * (`WHERE partitionCol BETWEEN ...` per task), which is the only way a
   * JDBC extract scales past one connection's throughput; size N to the
   * source's connection budget, not the cluster's cores. The column must
   * be indexed/clustered source-side or each cursor full-scans the table.
   * Bounds only steer the split points — rows outside them are still read
   * (Spark makes the edge partitions unbounded), so a stale min/max
   * underestimates skew but never loses rows.
   *
   * Credentials/driver selection ride in `props` (`user`, `password`,
   * `driver`); embedded engines (Derby in the spec) need none.
   */
  def loadJdbc(spark: SparkSession, url: String, table: String,
               partitionCol: Option[String] = None,
               bounds: Option[(Long, Long)] = None,
               numPartitions: Int = 0,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = props.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
    val reader = partitionCol match {
      case Some(c) =>
        val (lo, hi) = bounds.getOrElse(throw new IllegalArgumentException(
          s"partitionCol $c needs explicit (lower, upper) bounds"))
        withProps.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions",
            if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism)
      case None => withProps
    }
    reader.load()
  }

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
   * The `events` table's `ts` column has shipped in two on-disk shapes over
   * time: INT64 TIMESTAMP(NANOS) (which Spark's Parquet reader rejects with
   * [PARQUET_TYPE_ILLEGAL] unless `spark.sql.legacy.parquet.nanosAsLong=true`,
   * surfacing the raw nanos as a LongType) and plain `timestamp[us]` (which
   * reads as TimestampType / TimestampNTZType directly). The loader adapts to
   * whichever shape the footer declares and always yields a microsecond
   * `TimestampType` column, matching the oracle's shape-agnostic
   * `CAST(ts AS TIMESTAMP)`. `nanosAsLong` is only enabled when a footer
   * actually needs it — set before the very first events scan of the session,
   * which is the one safe moment (the conf is read at scan planning).
   */
  /**
   * True when `e` (or anything in its cause chain) is the Parquet
   * illegal-type rejection the nanos footer triggers. Matched on the
   * STABLE error condition (`SparkThrowable.getCondition` —
   * `PARQUET_TYPE_ILLEGAL` in Spark's error-conditions registry) first;
   * the message-substring check is only the fallback for wrappers that
   * lose the SparkThrowable type, so a Spark release rewording the
   * message cannot silently disable the fallback and re-break the 16
   * events queries (the round-9 drift incident this guards).
   */
  private[lake] def isNanosFooterError(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 10) {
      t match {
        case st: org.apache.spark.SparkThrowable
            if st.getCondition != null &&
              st.getCondition.startsWith("PARQUET_TYPE_ILLEGAL") =>
          return true
        case _ =>
      }
      val msg = t.getMessage
      if (msg != null && (msg.contains("PARQUET_TYPE_ILLEGAL") ||
          msg.contains("TIMESTAMP(NANOS"))) return true
      t = t.getCause
      depth += 1
    }
    false
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw =
      try load(spark, sfDir, "events")
      catch {
        case e: Exception if isNanosFooterError(e) =>
          System.err.println(
            "graft WARN: events.parquet carries INT64 TIMESTAMP(NANOS); " +
              "enabling spark.sql.legacy.parquet.nanosAsLong for this session")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(spark, sfDir, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long shape. Integer `div`, NOT `/`: epoch-nanos (~1.7e18)
        // overflow double's 2^53 exact-integer range, so float division is
        // off by ±1 µs.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case TimestampNTZType =>
        // Session TZ is pinned to UTC (graft.Conf), so this cast is a pure
        // type-tag change, not a wall-clock shift.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected int64 nanos or timestamp")
    }
  }

  /**
   * Documents and embeddings get the same drift insurance as [[events]]
   * (round 9: a testdata regen silently flipped `events.ts` and erred 13%
   * of the catalog): key/ vector columns are normalized to the dtypes the
   * catalog assumes. Each cast is compile-time identity on today's footers
   * (Catalyst's SimplifyCasts drops same-type casts), so the normal path
   * costs nothing; a regen to int32 ids / float64 embeddings keeps loading.
   */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .withColumn("doc_id", col("doc_id").cast("bigint"))

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")
      .withColumn("vec_id", col("vec_id").cast("bigint"))
      .withColumn("embedding", col("embedding").cast("array<float>"))
}
