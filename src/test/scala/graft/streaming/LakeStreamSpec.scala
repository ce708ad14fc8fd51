package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.bronze.Runner

/** End-to-end: bronze lake written by the batch runner, streamed into the
  * session gold layer — the full reference pipeline plus its declared
  * (never-built) continuous analytics, wired together. */
class LakeStreamSpec extends SparkSpec {

  test("bronze backfill -> file stream -> sessionized gold == batch result") {
    val root = Files.createTempDirectory("graft-lakestream").toString
    val r = Runner.backfill(spark, root, "events", "2024-01-01", "2024-01-05",
      Runner.extractEvents(spark, sf001, _))
    assert(r.failedDays.isEmpty && r.successfulDays.size == 5)

    val q = LakeStream.sessionizedEvents(spark, root)
      .writeStream.format("memory").queryName("lake_sessions")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("lake_sessions")
      val batch = Sessions.sessionize(
        spark.read.parquet(s"$root/events")
          .withColumn("ts", timestamp_micros(col("ts_us"))))
      assert(streamed.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
