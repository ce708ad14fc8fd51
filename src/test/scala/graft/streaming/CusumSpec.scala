package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming CUSUM == batch fold under any micro-batch split; alarms fire
  * at the exact deterministic crossing points and reset per Page's rule. */
class CusumSpec extends SparkSpec {

  import spark.implicits._

  private def t(day: Int) = new Timestamp(1700000000000L + day * 86400000L)

  private def pt(day: Int, v: Long, m: String = "rev") =
    MetricPoint(m, t(day), v)

  // reference mean 100, slack 10, threshold 50: values at 100 accumulate
  // nothing; a shift to 130 adds +20/point -> alarm on the 3rd shifted point
  private val mu0 = 100L; private val slack = 10L; private val h = 50L

  private val series: Seq[MetricPoint] =
    (0 until 5).map(d => pt(d, 100L)) ++ // stable: no evidence
    (5 until 8).map(d => pt(d, 130L)) ++ // +20/pt: 20, 40, 60 -> alarm d7
    (8 until 10).map(d => pt(d, 100L)) ++ // reset, stable again
    (10 until 13).map(d => pt(d, 70L))    // -20/pt: alarm "down" at d12

  private def runStream(chunks: Seq[Seq[MetricPoint]],
                        name: String): Seq[CusumAlarm] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = Cusum.detect(input.toDS(), mu0, slack, h,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      spark.table(name).as[CusumAlarm].collect().toSeq
        .sortBy(_.ts.getTime)
    } finally q.stop()
  }

  test("alarms fire at the deterministic crossing points and reset") {
    val alarms = Cusum.detectBatch(series.toDS(), mu0, slack, h)
      .collect().toSeq.sortBy(_.ts.getTime)
    assert(alarms.map(a => (a.side, a.ts, a.stat)) == Seq(
      ("up", t(7), 60L),    // 20+20+20 crosses 50 on the third point
      ("down", t(12), 60L)))
    assert(alarms.head.n_since_reset == 8L)  // 5 stable + 3 shifted
    assert(alarms(1).n_since_reset == 5L)    // 2 stable + 3 shifted
  }

  test("stream fold equals the batch fold under any micro-batch split") {
    val batch = Cusum.detectBatch(series.toDS(), mu0, slack, h)
      .collect().toSeq.sortBy(_.ts.getTime)
    val oneShot = runStream(Seq(series), "cusum1")
    val perPoint = runStream(series.map(Seq(_)), "cusum2")
    val ragged = runStream(Seq(series.take(6), series.slice(6, 7),
      series.drop(7)), "cusum3")
    assert(oneShot == batch)
    assert(perPoint == batch)
    assert(ragged == batch)
  }

  test("a late straggler batch cannot rewind the idle-eviction horizon") {
    // rev: d10 then a LATE d9 (watermark-admissible at 2-day delay). The
    // horizon must stay anchored at d10+idle, not rewind to d9+idle — the
    // rewound horizon would evict rev when the watermark reaches d29.5,
    // zeroing its accumulator (sp=40), and the d30.5 point would then fold
    // from scratch (sp=20, silent). The surviving state alarms: 20+20+20.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = Cusum.detect(input.toDS(), mu0, slack, h,
        idleDays = 20, watermark = "2 days")
      .writeStream.format("memory").queryName("cusum_rewind")
      .outputMode("append").start()
    try {
      def halfDay(d2: Int) = new Timestamp(1700000000000L + d2 * 43200000L)
      input.addData(pt(10, 130L)); q.processAllAvailable()       // horizon d30
      input.addData(pt(9, 130L)); q.processAllAvailable()        // late; sp=40
      input.addData(MetricPoint("other", halfDay(63), 100L))     // wm -> d29.5
      q.processAllAvailable()
      input.addData(MetricPoint("other", t(32), 100L))           // timeouts run at wm d29.5
      q.processAllAvailable()
      input.addData(MetricPoint("rev", halfDay(61), 130L))       // d30.5: sp=60 if alive
      q.processAllAvailable()
      val alarms = spark.table("cusum_rewind").as[CusumAlarm]
        .collect().toSeq.filter(_.metric == "rev")
      assert(alarms.map(a => (a.side, a.stat, a.n_since_reset))
        == Seq(("up", 60L, 3L)),
        "rev state was evicted early: the late batch rewound the timeout")
    } finally q.stop()
  }

  test("metrics are independent keys") {
    val two = series ++ (0 until 4).map(d => pt(d, 130L, m = "errs"))
    val alarms = Cusum.detectBatch(two.toDS(), mu0, slack, h)
      .collect().toSeq
    assert(alarms.count(_.metric == "rev") == 2)
    // errs: 20,40,60 -> one alarm on its own accumulator
    val e = alarms.filter(_.metric == "errs")
    assert(e.map(a => (a.side, a.ts, a.stat)) == Seq(("up", t(2), 60L)))
  }
}
