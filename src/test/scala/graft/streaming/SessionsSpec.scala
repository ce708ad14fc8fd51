package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class SessionsSpec extends SparkSpec {

  import spark.implicits._

  test("batch session_window agrees with the lag+cumsum catalog query") {
    val viaStream = Sessions.sessionize(Tables.events(spark, sf001))
    val viaBatch = graft.SparkEntry.queries("sessionize_30min")(spark, sf001)
    // same number of sessions and events per user (boundary semantics can
    // only differ on exact-30:00 gaps, absent from ns-precision testdata)
    val a = viaStream.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val b = viaBatch.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // per-session value totals match too
    val av = viaStream.agg(sum("session_value")).head().getDouble(0)
    val bv = viaBatch.agg(sum("session_value")).head().getDouble(0)
    assert(math.abs(av - bv) < 1e-6)
  }

  test("dropDuplicatesWithinWatermark dedups a replayed stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "payload")
    val q = Sessions.dedupWithinWatermark(events, Seq("event_id"),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
      input.addData((1L, t(0), "a"), (2L, t(1), "b"))
      q.processAllAvailable()
      // replay of 1 and 2 within the horizon + one new event
      input.addData((1L, t(2), "a"), (2L, t(3), "b"), (3L, t(4), "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }

  test("streaming micro-batches emit closed sessions through the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = Sessions.sessionize(events, gap = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(3600000L * 24 * 365 * 50 + min * 60000L)
      // user 1: two events 10 min apart (one session), then a 2h silence
      input.addData((1L, t(0), 1.0), (1L, t(10), 2.0))
      q.processAllAvailable()
      input.addData((1L, t(150), 5.0)) // advances watermark past session 1
      q.processAllAvailable()
      input.addData((1L, t(400), 0.0)) // closes session 2
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("user_id", "n_events", "session_value").collect()
      assert(out.exists(r => r.getLong(1) == 2 && r.getDouble(2) == 3.0),
        s"first session (2 events, value 3.0) missing: ${out.mkString(", ")}")
    } finally q.stop()
  }
}
