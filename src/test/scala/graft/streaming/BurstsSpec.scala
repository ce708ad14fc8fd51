package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class BurstsSpec extends SparkSpec {

  import spark.implicits._

  test("batch fold == the oracle-checked events_user_burst query") {
    val viaState = Bursts.trackBatch(
      Tables.events(spark, sf001).select($"user_id", $"ts").as[BurstEvent])
      .toDF()
    val viaCatalog = graft.SparkEntry.queries("events_user_burst")(spark, sf001)
    assert(viaState.exceptAll(viaCatalog).isEmpty &&
      viaCatalog.exceptAll(viaState).isEmpty)
  }

  test("stream final snapshots == batch fold, across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    def t(hr: Double) = new Timestamp(1700000000000L + (hr * 3600000L).toLong)
    // user 1: 11 events inside one 24h span (flags at >=10); user 2: spread
    // over 3 days, max trailing-24h burst 3
    val all =
      (0 until 11).map(i => BurstEvent(1L, t(i * 2.0))) ++
        Seq(0.0, 5.0, 23.0, 30.0, 52.0, 71.0).map(h => BurstEvent(2L, t(h)))
    val input = MemoryStream[BurstEvent]
    val q = Bursts.track(input.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("bursts_stream")
      .outputMode("update").start()
    try {
      val batches = all.sortBy(_.ts.getTime).grouped(5).toSeq
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val last = spark.table("bursts_stream").as[BurstRow]
        .groupByKey(_.user_id)
        .mapGroups { (_, it) => it.maxBy(r => (r.n_events, r.max_burst_24h)) }
      val batch = Bursts.trackBatch(all.toDS())
      assert(last.toDF().exceptAll(batch.toDF()).isEmpty &&
        batch.toDF().exceptAll(last.toDF()).isEmpty,
        last.collect().mkString(", "))
    } finally q.stop()
  }

  test("a late event retro-raises an earlier pending window exactly") {
    implicit val sqlCtx = spark.sqlContext
    def t(hr: Double) = new Timestamp(1700000000000L + (hr * 3600000L).toLong)
    val input = MemoryStream[BurstEvent]
    // 3h lateness allowance: the hr=1 event arrives after hr=3 is seen
    // (watermark sits at 0h then, so the straggler is strictly admissible)
    val q = Bursts.track(input.toDS(), watermark = "3 hours")
      .writeStream.format("memory").queryName("bursts_late")
      .outputMode("update").start()
    try {
      input.addData(BurstEvent(7L, t(0)), BurstEvent(7L, t(3)))
      q.processAllAvailable()
      input.addData(BurstEvent(7L, t(1))) // late but admissible
      q.processAllAvailable()
      val last = spark.table("bursts_late").as[BurstRow]
        .collect().maxBy(r => (r.n_events, r.max_burst_24h))
      assert(last.max_burst_24h == 3L && last.n_events == 3L, last.toString)
    } finally q.stop()
  }

  test("state keeps only the live horizon (old events evicted, still exact)") {
    // 3 events/day for 40 days: buffer must never hold all 120 events once
    // the watermark advances, yet the final answer equals batch
    implicit val sqlCtx = spark.sqlContext
    def t(day: Int, hr: Int) =
      new Timestamp(1700000000000L + day * 86400000L + hr * 3600000L)
    val all = for (d <- 0 until 40; h <- Seq(1, 7, 13))
      yield BurstEvent(3L, t(d, h))
    val input = MemoryStream[BurstEvent]
    val q = Bursts.track(input.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("bursts_horizon")
      .outputMode("update").start()
    try {
      all.grouped(9).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val last = spark.table("bursts_horizon").as[BurstRow]
        .collect().maxBy(r => (r.n_events, r.max_burst_24h))
      val batch = Bursts.trackBatch(all.toDS()).collect().head
      assert(last == batch, s"$last vs $batch")
    } finally q.stop()
  }
}
