package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming quantile sketch must equal its batch twin bin-for-bin
  * (same UDAF, same windows), estimate within one bin width of the exact
  * percentile, and hold fixed state (the sketch array) per open group. */
class QuantilesStreamSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // tumbling windows align to EPOCH multiples of 10 min, not to t(0) — the
  // base sits 3:20 into its window, so only minutes 0..6 share window 1.
  // Window 1: purchase values 1..20 (minutes 0-4); window 2: purchase 100s
  // and clicks; a far-future row closes both windows
  private val feed: Seq[(Timestamp, String, Double)] =
    (1 to 20).map(i => (t(i % 5), "purchase", i.toDouble)) ++
      Seq((t(12), "purchase", 100.0), (t(13), "purchase", 200.0),
        (t(14), "click", 5.0), (t(15), "click", 7.0),
        (t(45), "sentinel", 0.0))

  private val lo = 0L
  private val hi = 25000L // cents span covering the feed

  test("stream == batch: same UDAF over the same windows, row for row") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = Quantiles.windowed(input.toDF().toDF("ts", "event_type", "value"),
        lo, hi)
      .writeStream.format("memory").queryName("quant_stream")
      .outputMode("append").start()
    try {
      input.addData(feed: _*)
      q.processAllAvailable()
      val got = spark.table("quant_stream").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getLong(2), r.getDouble(4), r.getDouble(6))).toMap
      // batch twin: identical plan over the closed-window slice
      val batch = Quantiles.windowed(
          feed.filter(_._1.getTime < t(20).getTime)
            .toDF("ts", "event_type", "value"), lo, hi)
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getLong(2), r.getDouble(4), r.getDouble(6))).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      // hand-check: w1 purchases are 1..20 -> exact p50 is ~10.0; the
      // sketch upper-edge estimate must land within one bin width
      // (span/128 = ~1.95 units) above it
      val w1 = t(0).getTime - t(0).getTime % 600000L
      val (n1, p50, p95) = got((w1, "purchase"))
      assert(n1 == 20L)
      assert(p50 >= 10.0 && p50 <= 10.0 + hi / 128.0 / 100.0 + 0.01, s"p50 $p50")
      assert(p95 >= 19.0 && p95 <= 20.0 + hi / 128.0 / 100.0 + 0.01, s"p95 $p95")
    } finally q.stop()
  }

  test("KLL twin: stream == batch exactly for windows below capacity") {
    implicit val sqlCtx = spark.sqlContext
    // every window holds far fewer than k=256 values, so the rank sketch
    // retains the exact multiset: stream and batch must agree EXACTLY,
    // independent of arrival order or micro-batch splits — and with no
    // [lo, hi] dial, the 1e15 outlier needs no clamp to stay correct
    val kllFeed = feed :+ (t(2), "purchase", 1.0e15)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, String, Double)]
    val q = Quantiles.windowedKll(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("kll_stream")
      .outputMode("append").start()
    try {
      // two separate micro-batches: state merges across batches
      val (first, rest) = kllFeed.splitAt(10)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(rest: _*)
      q.processAllAvailable()
      val got = spark.table("kll_stream").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(6))).toMap
      val batch = Quantiles.windowedKll(
          kllFeed.filter(_._1.getTime < t(20).getTime)
            .toDF("ts", "event_type", "value"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(6))).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      // exactness: w1 purchases are 1..20 plus the outlier — 21 values.
      // Rank rule 100·cum >= q·21: p25 → 6th = 6.0, p50 → 11th = 11.0,
      // p95 → 20th = 20.0 — EXACT members, no bin-width slop, and the
      // unclamped 1e15 outlier didn't distort any of them
      val w1 = t(0).getTime - t(0).getTime % 600000L
      val (n1, p25, p50, p95) = got((w1, "purchase"))
      assert(n1 == 21L)
      assert(p25 == 6.0, s"p25 $p25")
      assert(p50 == 11.0, s"p50 $p50")
      assert(p95 == 20.0, s"p95 $p95")
    } finally q.stop()
  }

  test("out-of-range values clamp into edge bins instead of corrupting state") {
    // 1e15 dollars -> 1e17 cents: (v-lo)*128 would overflow int64 and wrap
    // a huge outlier into bin 0 without the pre-multiply clamp
    val df = Seq(
      (t(1), "x", -50.0), (t(2), "x", 10.0), (t(3), "x", 99999.0),
      (t(4), "x", 1.0e15),
      (t(45), "sentinel", 0.0)).toDF("ts", "event_type", "value")
    val rows = Quantiles.windowed(df, lo, hi).filter($"event_type" === "x")
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(2) == 4L)
    // clamped extremes sit in bins 0 and 127: p25 near the low edge, the
    // top estimates at the high edge — never outside the dialed span, and
    // the overflow-scale outlier lands in the TOP bin, not bin 0
    assert(r.getDouble(3) <= hi / 128.0 / 100.0 + 0.01)
    val topEdge = (lo + hi + 1) / 100.0
    assert(math.abs(r.getDouble(6) - topEdge) < 0.03, s"p95 ${r.getDouble(6)}")
    assert(math.abs(r.getDouble(5) - topEdge) < 0.03, s"p75 ${r.getDouble(5)}")
  }
}
