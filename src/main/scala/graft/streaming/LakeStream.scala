package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bronze.Lake

/**
 * Streaming source over the bronze lake: tail the `year=/month=/day=`
 * partition tree that graft.bronze.Runner writes, as a file stream — the
 * "bronze lands daily, gold streams continuously" wiring. New day
 * partitions are picked up as they commit (`maxFilesPerTrigger` bounds each
 * micro-batch; at 100 TB/day that is the backpressure knob).
 *
 * Bronze rows carry `ts_us` epoch-micros (timestamps don't survive the
 * extraction — SURVEY §7.3); the stream surfaces a real `ts` for
 * watermarks/session windows.
 */
object LakeStream {

  def events(spark: SparkSession, root: String, dataType: String = "events",
             maxFilesPerTrigger: Int = 10): DataFrame = {
    // file streams need an a-priori schema: read one committed partition's
    // footer (metadata-only driver work, no data scan)
    val schema = spark.read.parquet(s"$root/$dataType").schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$root/$dataType")
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Convenience: lake -> 30-minute session gold, ready for writeStream. */
  def sessionizedEvents(spark: SparkSession, root: String): DataFrame =
    Sessions.sessionize(events(spark, root))
}
