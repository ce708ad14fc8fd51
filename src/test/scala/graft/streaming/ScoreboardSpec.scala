package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.lake.Tables

/** The confusion-matrix delta stream folds to the batch scoreboard under
  * any micro-batch split, retracts on threshold crossings, and (at the
  * catalog's median thresholds) reproduces the oracle-checked
  * eval_confusion_threshold cells. */
class ScoreboardSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def ev(u: Long, min: Int, typ: String) =
    FeatureEvent(u, t(min), min.toLong, typ, 1.0)

  private def fold(deltas: Seq[CellDelta]): Map[String, Long] =
    deltas.groupBy(_.cell).view
      .mapValues(_.map(_.delta.toLong).sum).toMap.filter(_._2 != 0)

  private def runStream(chunks: Seq[Seq[FeatureEvent]], predT: Long,
                        labelT: Long, name: String): Seq[CellDelta] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FeatureEvent]
    val q = Scoreboard.track(input.toDS(), predT, labelT,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      spark.table(name).as[CellDelta].collect().toSeq
    } finally q.stop()
  }

  private val mixed = Seq(
    ev(1, 0, "view"), ev(1, 1, "view"), ev(1, 2, "purchase"),
    ev(2, 3, "purchase"), ev(2, 4, "purchase"),
    ev(3, 5, "view"), ev(3, 6, "click"), ev(3, 7, "view"),
    ev(4, 8, "click"), ev(4, 9, "purchase"), ev(4, 10, "purchase"))

  test("delta stream folds to the batch scoreboard (multi-batch)") {
    val chunks = Seq(mixed.take(4), mixed.slice(4, 8), mixed.drop(8))
    val stream = fold(runStream(chunks, predT = 1, labelT = 1, "sb1"))
    val batch = fold(
      Scoreboard.trackBatch(mixed.toDS(), 1, 1).collect().toSeq)
    assert(stream == batch, s"stream $stream vs batch $batch")
    assert(batch.values.sum == 4L) // one cell per user
  }

  test("split-invariance: one batch vs per-event batches fold identically") {
    val oneShot = fold(runStream(Seq(mixed), 1, 1, "sb2"))
    val perEvent = fold(runStream(mixed.map(Seq(_)), 1, 1, "sb3"))
    assert(oneShot == perEvent)
  }

  test("a threshold crossing retracts the old cell") {
    // user 7: two views (tn at predT=2), then a third view crosses into fp
    val es = Seq(ev(7, 0, "view"), ev(7, 1, "view"), ev(7, 2, "view"))
    val deltas = runStream(Seq(es.take(2), es.drop(2)), 2, 0, "sb4")
      .filter(_.user_id == 7L)
    assert(deltas == Seq(CellDelta(7L, "tn", 1),
      CellDelta(7L, "tn", -1), CellDelta(7L, "fp", 1)))
    assert(fold(deltas) == Map("fp" -> 1L))
  }

  test("eviction retracts the cell; a returning user does not double-count") {
    // idleDays=1; user 8 goes idle, user 9's later events advance the
    // watermark past 8's timeout (watermarks bound late data, not future
    // events — 8 CAN return), then 8 returns and re-asserts from zero.
    implicit val sqlCtx = spark.sqlContext
    val day = 24 * 60
    val input = MemoryStream[FeatureEvent]
    val q = Scoreboard.track(input.toDS(), predThreshold = 0,
        labelThreshold = 0, idleDays = 1, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sb_evict")
      .outputMode("append").start()
    try {
      input.addData(ev(8, 0, "view")); q.processAllAvailable()
      input.addData(ev(9, 2 * day, "view")); q.processAllAvailable()
      input.addData(ev(9, 2 * day + 1, "view")); q.processAllAvailable()
      input.addData(ev(8, 3 * day, "purchase")); q.processAllAvailable()
      val deltas = spark.table("sb_evict").as[CellDelta].collect().toSeq
      val u8 = deltas.filter(_.user_id == 8L)
      // +1 fp (first view), -1 fp (eviction), +1 fn (return as purchaser
      // from a clean slate — NOT fp+tp double-count)
      assert(u8 == Seq(CellDelta(8L, "fp", 1), CellDelta(8L, "fp", -1),
        CellDelta(8L, "fn", 1)), s"user-8 deltas: $u8")
      assert(fold(u8) == Map("fn" -> 1L))
      assert(fold(deltas).values.sum == 2L) // one live cell per active user
    } finally q.stop()
  }

  test("at frozen median thresholds the fold matches eval_confusion_threshold") {
    // freeze the thresholds the batch query derives (sf0.001 medians are
    // x.5-interpolated, so score > floor(med) == score > med on integers)
    val events = Tables.events(spark, sf001)
      .selectExpr("user_id", "ts", "event_id", "event_type", "value")
      .as[FeatureEvent]
    val byUser = events.collect().groupBy(_.user_id).values.toSeq
      .map { es =>
        val np = es.count(_.event_type == "purchase").toLong
        (es.length - np, np)
      }
    def med(xs: Seq[Long]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2).toDouble
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val predT = math.floor(med(byUser.map(_._1))).toLong
    val labelT = math.floor(med(byUser.map(_._2))).toLong
    val folded = fold(
      Scoreboard.trackBatch(events, predT, labelT).collect().toSeq)
    val row = graft.SparkEntry
      .queries("eval_confusion_threshold")(spark, sf001).collect().head
    for (c <- Seq("tp", "fp", "fn", "tn"))
      assert(folded.getOrElse(c, 0L) == row.getAs[Long](c),
        s"cell $c: ${folded.getOrElse(c, 0L)} vs oracle ${row.getAs[Long](c)}")
  }
}
