package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class TransitionsSpec extends SparkSpec {

  import spark.implicits._

  private def toTyped(sfDir: String) =
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type").as[TypedEvent]

  test("batch state machine == the oracle-checked events_markov_transitions") {
    val viaState = Transitions.counts(Transitions.trackBatch(toTyped(sf001)))
    val viaCatalog = graft.SparkEntry
      .queries("events_markov_transitions")(spark, sf001)
      .select($"prev_type", $"next_type", $"n_transitions")
    assert(viaState.exceptAll(viaCatalog).isEmpty &&
      viaCatalog.exceptAll(viaState).isEmpty)
  }

  test("stream over ordered micro-batches == batch counts on the same data") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val all = Seq(
      TypedEvent(1L, t(0), 10L, "view"), TypedEvent(1L, t(1), 11L, "click"),
      TypedEvent(2L, t(1), 12L, "view"), TypedEvent(1L, t(3), 13L, "purchase"),
      TypedEvent(2L, t(4), 14L, "view"), TypedEvent(1L, t(5), 15L, "view"),
      TypedEvent(2L, t(6), 16L, "click"))
    val input = MemoryStream[TypedEvent]
    val q = Transitions.track(input.toDS(), idleMinutes = 120,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("transitions_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(4)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("transitions_stream").as[Transition]
      val batch = Transitions.trackBatch(all.toDS())
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty,
        streamed.collect().mkString(", "))
    } finally q.stop()
  }

  test("in-batch disorder is sorted away before stepping the chain") {
    val shuffled = Seq(
      TypedEvent(5L, new Timestamp(3000L), 3L, "purchase"),
      TypedEvent(5L, new Timestamp(1000L), 1L, "view"),
      TypedEvent(5L, new Timestamp(2000L), 2L, "click"))
    val got = Transitions.trackBatch(shuffled.toDS()).collect().toSeq
    assert(got == Seq(Transition(5L, "view", "click"),
      Transition(5L, "click", "purchase")))
  }

  test("event-time timeout drops idle users and restarts the chain") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[TypedEvent]
    val q = Transitions.track(input.toDS(), idleMinutes = 30,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("transitions_timeout")
      .outputMode("append").start()
    try {
      input.addData(TypedEvent(9L, t(0), 1L, "view"),
        TypedEvent(9L, t(5), 2L, "click"))
      q.processAllAvailable()
      // another user far in the future advances the watermark past the
      // idle horizon -> user 9's chain state times out and is dropped
      input.addData(TypedEvent(8L, t(500), 3L, "view"))
      q.processAllAvailable()
      // user 9 returns: no cross-gap transition (chain restarted)
      input.addData(TypedEvent(9L, t(501), 4L, "purchase"))
      q.processAllAvailable()
      val out = spark.table("transitions_timeout").as[Transition].collect()
      assert(out.toSet == Set(Transition(9L, "view", "click")),
        out.mkString(", "))
    } finally q.stop()
  }
}
