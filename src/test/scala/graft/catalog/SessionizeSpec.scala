package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/**
 * The native session_window twin (sessionize_session_window) must carry
 * the SAME sessions as the lag+cumsum formulation, boundary included:
 * session_window's merge rule is gap-INCLUSIVE (an event exactly gap
 * after its predecessor joins the session; one microsecond more splits),
 * which is exactly the islands rule's strict `> gap`.
 */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private val gapUs = 30L * 60 * 1000 * 1000

  private def frame(deltaUs: Long) = {
    val t0 = 1700000000000000L // epoch micros
    Seq((7L, t0, 1.0), (7L, t0 + deltaUs, 2.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
  }

  test("an exact-gap event still joins the session (inclusive merge)") {
    val out = Events.sessionWindowAgg(frame(gapUs)).collect()
    assert(out.length == 1, s"expected a merge, got ${out.toSeq}")
    assert(out.head.getAs[Long]("n_events") == 2L)
    assert(out.head.getAs[Double]("session_value") == 3.0)
  }

  test("one microsecond past the gap splits the session") {
    val out = Events.sessionWindowAgg(frame(gapUs + 1)).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_events") == 1L))
  }

  test("row-identical to sessionize_30min on the whole corpus") {
    val islands = SparkEntry.queries("sessionize_30min")(spark, sf001)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("session_value"))
    val native = SparkEntry.queries("sessionize_session_window")(spark, sf001)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("session_value"))
    assert(islands.exceptAll(native).isEmpty
      && native.exceptAll(islands).isEmpty)
  }
}
