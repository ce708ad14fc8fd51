package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming frequency sketch must equal its batch twin grid-for-grid
  * (same UDAF, same windows, independent of micro-batch splits), and its
  * point estimates must be exact at a collision-free width. */
class FrequenciesSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // window 1 (minutes 0-4 of the epoch-aligned 10-min window): key 7 hits
  // 12 times, key 3 hits 5 times, keys 100-109 once each; window 2 (12-15):
  // key 7 twice; a far-future sentinel closes both
  private val feed: Seq[(Timestamp, Long)] =
    (1 to 12).map(i => (t(i % 5), 7L)) ++
      (1 to 5).map(i => (t(i % 5), 3L)) ++
      (100L to 109L).map(k => (t(2), k)) ++
      Seq((t(12), 7L), (t(13), 7L), (t(45), 999L))

  test("stream == batch grid; estimates exact at collision-free width") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = Frequencies.windowedCms(
        input.toDF().toDF("ts", "user_id"), "user_id")
      .writeStream.format("memory").queryName("freq_stream")
      .outputMode("append").start()
    try {
      // two separate addData calls force a micro-batch split mid-window:
      // the grid must merge across partials to the single-pass answer
      input.addData(feed.take(9): _*)
      input.addData(feed.drop(9): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("freq_stream")
      .select($"win_start", $"sketch").as[(Timestamp, Seq[Long])]
      .collect().toMap
    val closed = feed.filter(_._1.getTime < t(20).getTime)
    val batch = Frequencies.windowedCms(
        closed.toDF("ts", "user_id"), "user_id")
      .select($"win_start", $"sketch").as[(Timestamp, Seq[Long])]
      .collect().toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (w, sk) => assert(sk == batch(w), s"window $w grid") }
    // point estimates: 1024 cells vs 12 distinct keys — collision-free,
    // so the sketch answers exactly
    val w1 = got.keys.minBy(_.getTime)
    val sk1 = got(w1)
    def est(k: Long): Long =
      Seq(k).toDF("k")
        .select(Frequencies.estimate(typedLit(sk1), $"k"))
        .as[Long].head()
    assert(est(7L) == 12L)
    assert(est(3L) == 5L)
    assert(est(104L) == 1L)
    // grid mass = rows in the window × depth
    assert(sk1.sum == (12L + 5L + 10L) * 4)
  }
}
