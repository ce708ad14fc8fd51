package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // hour-grid-aligned base so each test hour lands in exactly one tumbling
  // window (1699999200000 ms is a multiple of 3600000)
  private def t(hr: Double) =
    new Timestamp(1699999200000L + (hr * 3600000L).toLong)

  // window 0 (hr 0-1): the reference mix; window 1 (hr 1-2): a bot flood
  private val all =
    (0 until 40).map(i => DriftEvent(t(0.01 + i * 0.02), "view")) ++
    (0 until 40).map(i => DriftEvent(t(0.015 + i * 0.02), "click")) ++
    (0 until 40).map(i => DriftEvent(t(1.01 + i * 0.01), "view")) ++
    (0 until 40).map(i => DriftEvent(t(1.015 + i * 0.01), "click")) ++
    (0 until 60).map(i => DriftEvent(t(1.02 + i * 0.01), "bot"))

  private val ref = Map("view" -> 400L, "click" -> 400L)

  test("stream window counts == batch window counts (closed windows)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DriftEvent]
    val q = Drift.windowCounts(input.toDS(), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try {
      val batches = all.sortBy(_.ts.getTime).grouped(50).toSeq
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // close the last window: a far-future sentinel advances the watermark
      input.addData(DriftEvent(t(30.0), "view")); q.processAllAvailable()
      val streamed = spark.table("drift_counts")
      val batch = Drift.windowCountsBatch(all.toDS(), "1 hour")
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        streamed.collect().mkString(", "))
    } finally q.stop()
  }

  test("the bot-flood window flags; the reference-mix window does not") {
    val counts = Drift.windowCountsBatch(all.toDS(), "1 hour")
    val flags = Drift.flagDrift(counts, ref)
      .select($"win_us", $"event_type", $"drift_flag")
      .as[(Long, String, Int)].collect()
    val w0 = flags.map(_._1).min // tumbling starts align to the hour grid
    val w1 = w0 + 3600L * 1000000
    val m = flags.map { case (w, ty, f) => (w, ty) -> f }.toMap
    assert(m((w0, "view")) == 0 && m((w0, "click")) == 0, m.toString)
    assert(m((w1, "bot")) == 1, m.toString)
  }

  test("a type absent from the reference counts as 0 there (new-type path)") {
    val counts = Drift.windowCountsBatch(all.toDS(), "1 hour")
    val botRow = Drift.flagDrift(counts, ref)
      .filter($"event_type" === "bot")
      .select($"n", $"win_total", $"drift_flag")
      .as[(Long, Long, Int)].collect()
    assert(botRow.length == 1 && botRow.head == ((60L, 140L, 1)),
      botRow.mkString(", "))
  }
}
