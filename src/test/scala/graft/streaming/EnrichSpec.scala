package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class EnrichSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  /** Epoch-micros start of the tumbling 1-minute window containing t(min)
    * (windows align to the epoch, not to the first event). */
  private def winUs(min: Int): Long =
    (1700000000000L + min * 60000L) / 60000L * 60000L * 1000L

  test("stream-static dim join enriches micro-batches and tracks the static side") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val dim = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val q = Enrich.joinDim(events, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData((0L, t(0), 1.0), (1L, t(1), 2.0), (999999L, t(2), 3.0))
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select("user_id", "c_mktsegment").as[(Long, String)].collect().toMap
      // inner join: the unknown key drops, known keys carry the dim value
      assert(out.keySet == Set(0L, 1L))
      val expect = dim.filter(col("user_id") < 2)
        .as[(Long, String)].collect().toMap
      assert(out == expect)
    } finally q.stop()
  }

  test("windowed KPIs agree with the batch aggregation over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Enrich.windowKpis(events, windowLen = "1 minute",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("kpi_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, t(0), "view", 1.5), (2L, t(0), "view", 2.5),
        (3L, t(0), "click", 1.0), (4L, t(1), "view", 4.0))
      q.processAllAvailable()
      // watermark 0s: windows <= minute 1 close once a later event arrives
      input.addData((5L, t(60), "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("kpi_out")
        .select("win_us", "event_type", "n_events", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(out.contains((winUs(0), "view", 2L, 4.0)))
      assert(out.contains((winUs(0), "click", 1L, 1.0)))
      assert(out.contains((winUs(1), "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("upsertBatch is idempotent: a replayed batch converges to the same content") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/gold"
    val batch = Seq(
      (1000L, "view", 3L, 7.5), (1000L, "click", 1L, 2.0),
      (2000L, "view", 2L, 1.0))
      .toDF("win_us", "event_type", "n_events", "total_value")
    Enrich.upsertBatch(batch, dir)
    val first = spark.read.parquet(dir).collect().toSet
    // replay the same batch (retried micro-batch): content must not change
    Enrich.upsertBatch(batch, dir)
    assert(spark.read.parquet(dir).collect().toSet == first)
    // a corrected group overwrites ONLY its partition, others survive
    val update = Seq((1000L, "view", 4L, 9.0))
      .toDF("win_us", "event_type", "n_events", "total_value")
    Enrich.upsertBatch(update, dir)
    val after = spark.read.parquet(dir)
      .select("win_us", "event_type", "n_events", "total_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(after == Set(
      (1000L, "view", 4L, 9.0), (1000L, "click", 1L, 2.0),
      (2000L, "view", 2L, 1.0)))
  }

  test("end-to-end: stream -> windowed KPIs -> idempotent lake upsert") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_kpigold")
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Enrich.kpisToLake(
      Enrich.windowKpis(events, "1 minute", "0 seconds"),
      s"$base/gold", s"$base/ckpt")
    try {
      input.addData((1L, t(0), "view", 1.0), (2L, t(0), "view", 2.0))
      q.processAllAvailable()
      input.addData((3L, t(0), "view", 4.0), (4L, t(5), "click", 1.0))
      q.processAllAvailable()
      val gold = spark.read.parquet(s"$base/gold")
        .select("win_us", "event_type", "n_events", "total_value")
        .as[(Long, String, Long, Double)].collect().toSet
      // update mode + partition overwrite: the late third view REPLACED the
      // minute-0 row — one corrected row, no duplicate
      assert(gold.contains((winUs(0), "view", 3L, 7.0)))
      assert(gold.count(_._2 == "view") == 1)
    } finally q.stop()
  }
}
