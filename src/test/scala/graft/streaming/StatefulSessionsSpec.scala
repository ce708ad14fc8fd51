package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def toEvents(sfDir: String) =
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"value").as[SessionEvent]

  test("batch state machine == the oracle-checked sessionize_30min query") {
    val viaState = StatefulSessions.sessionizeBatch(toEvents(sf001))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    val viaCatalog = graft.SparkEntry.queries("sessionize_30min")(spark, sf001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    assert(viaState.exceptAll(viaCatalog).isEmpty &&
      viaCatalog.exceptAll(viaState).isEmpty)
  }

  test("streaming flatMapGroupsWithState closes sessions by gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(input.toDS(), gapMinutes = 30,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
      input.addData(SessionEvent(7L, t(0), 1.0), SessionEvent(7L, t(5), 2.0))
      q.processAllAvailable()
      // 2h later: previous session closes via the explicit gap branch
      input.addData(SessionEvent(7L, t(125), 4.0))
      q.processAllAvailable()
      // advance watermark far past session 2 -> event-time timeout closes it
      input.addData(SessionEvent(8L, t(500), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(8L, t(600), 0.0))
      q.processAllAvailable()
      val out = spark.table("stateful_sessions").as[ClosedSession].collect()
      val first = out.find(s => s.user_id == 7L && s.n_events == 2)
      assert(first.exists(_.session_value == 3.0), out.mkString(", "))
      val second = out.find(s => s.user_id == 7L && s.n_events == 1)
      assert(second.exists(_.session_value == 4.0), out.mkString(", "))
    } finally q.stop()
  }
}
