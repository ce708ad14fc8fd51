package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("purchases join the views that precede them within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamJoin.attribute(
      views.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      horizonMin = 30)
    val q = out.writeStream.format("memory").queryName("sj_inner")
      .outputMode("append").start()
    try {
      views.addData((1L, t(0)), (2L, t(0)), (3L, t(0)))
      purchases.addData(
        (1L, t(10), 5.0),  // in horizon -> match
        (2L, t(45), 7.0),  // past 30 min horizon -> no match
        (3L, t(0), 9.0),   // same instant -> match (>= lower bound)
        (4L, t(5), 1.0))   // no view at all -> no match
      q.processAllAvailable()
      val rows = spark.table("sj_inner")
        .select("user_id", "latency_us").as[(Long, Long)].collect().sorted
      assert(rows.toSeq == Seq((1L, 10L * 60000000L), (3L, 0L)))
    } finally q.stop()
  }

  test("one view matching several purchases emits one row per purchase") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamJoin.attribute(
      views.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      horizonMin = 30)
    val q = out.writeStream.format("memory").queryName("sj_multi")
      .outputMode("append").start()
    try {
      views.addData((1L, t(0)))
      purchases.addData((1L, t(1), 1.0), (1L, t(2), 2.0), (1L, t(31), 3.0))
      q.processAllAvailable()
      val vals = spark.table("sj_multi").select("value").as[Double].collect().sorted
      assert(vals.toSeq == Seq(1.0, 2.0), "t(31) purchase must fall outside the horizon")
    } finally q.stop()
  }

  test("left-outer emits abandonment rows only after the watermark closes the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamJoin.attributeWithAbandonment(
      views.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      horizonMin = 30, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sj_outer")
      .outputMode("append").start()
    try {
      views.addData((1L, t(0)), (2L, t(0)))
      purchases.addData((1L, t(5), 5.0))
      q.processAllAvailable()
      // user 2 unmatched, but the watermark hasn't passed t(0)+30min yet:
      // no abandonment row may appear.
      val early = spark.table("sj_outer").select("user_id").as[Long].collect()
      assert(early.toSeq == Seq(1L), s"premature abandonment emit: ${early.toSeq}")

      // Advance event time far enough that watermark (max ts - 10 min)
      // passes t(0) + horizon(30) on both sides -> user 2's null row emits.
      views.addData((9L, t(120)))
      purchases.addData((9L, t(120), 0.0))
      q.processAllAvailable()
      views.addData((9L, t(121)))
      purchases.addData((9L, t(121), 0.0))
      q.processAllAvailable()
      val byUser = spark.table("sj_outer")
        .select("user_id", "value").as[(Long, Option[Double])].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(byUser(1L) == Set(Some(5.0)))
      assert(byUser.contains(2L) && byUser(2L) == Set(None),
        s"abandonment row for user 2 missing or wrong: $byUser")
    } finally q.stop()
  }
}
