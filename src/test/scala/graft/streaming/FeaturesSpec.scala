package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class FeaturesSpec extends SparkSpec {

  import spark.implicits._

  private def toFeatureEvents(sfDir: String) =
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value")
      .as[FeatureEvent]

  test("batch fold == the oracle-checked train_user_features event columns") {
    val viaState = Features.trackBatch(toFeatureEvents(sf001)).toDF()
    val viaCatalog = graft.SparkEntry
      .queries("train_user_features")(spark, sf001)
      .select($"user_id", $"n_events", $"n_purchases", $"event_value",
        $"first_us", $"last_us")
    assert(viaState.exceptAll(viaCatalog).isEmpty &&
      viaCatalog.exceptAll(viaState).isEmpty)
  }

  test("stream final snapshots == batch fold over the same events") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val all = Seq(
      FeatureEvent(1L, t(0), 10L, "view", 1.10),
      FeatureEvent(2L, t(1), 11L, "purchase", 20.05),
      FeatureEvent(1L, t(2), 12L, "purchase", 5.25),
      FeatureEvent(1L, t(3), 13L, "click", 0.10),
      FeatureEvent(2L, t(4), 14L, "view", 0.30),
      FeatureEvent(3L, t(5), 15L, "purchase", 7.77))
    val input = MemoryStream[FeatureEvent]
    val q = Features.track(input.toDS(), idleDays = 30,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("features_stream")
      .outputMode("update").start()
    try {
      val (b1, b2) = all.splitAt(3)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // update mode emits one row per touched user per batch — the LAST
      // emission per user is the live feature row
      val finalRows = spark.table("features_stream").as[UserFeatureRow]
        .groupByKey(_.user_id)
        .mapGroups { (_, it) => it.maxBy(_.n_events) }
      val batch = Features.trackBatch(all.toDS())
      assert(finalRows.toDF().exceptAll(batch.toDF()).isEmpty &&
        batch.toDF().exceptAll(finalRows.toDF()).isEmpty,
        finalRows.collect().mkString(", "))
    } finally q.stop()
  }

  test("running spend is exact under drift-prone values") {
    // 100 x 0.10 sums to exactly 10.00 in integer cents; a double
    // accumulator would land on 9.99999999999998
    val events = (1 to 100).map(i =>
      FeatureEvent(9L, new Timestamp(1700000000000L + i * 1000L), i.toLong,
        "view", 0.10))
    val got = Features.trackBatch(events.toDS()).collect().head
    assert(got.event_value == 10.0 && got.n_events == 100L)
  }
}
