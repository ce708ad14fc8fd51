package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrendingSpec extends SparkSpec {

  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // window 1 (min 0-9): "alpha" x6, "beta" x3, "gamma" x1
  // window 2 (min 10-19): "beta" x5, "delta" x2
  private val feed = Seq(
    (t(1), "alpha alpha alpha beta"),
    (t(5), "alpha alpha alpha beta beta gamma"),
    (t(12), "beta beta beta delta"),
    (t(14), "beta beta delta"),
    (t(45), "late watermark sentinel")) // closes both windows

  test("exact windowed term counts match the hand-counted feed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = Trending.termCounts(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("trend_exact")
      .outputMode("append").start()
    try {
      input.addData(feed: _*)
      q.processAllAvailable()
      val got = spark.table("trend_exact")
        .select(col("win_start"), col("term"), col("n"))
        .as[(Timestamp, String, Long)].collect()
        .map { case (w, term, n) => (w.getTime, term) -> n }.toMap
      // tumbling windows align to epoch multiples of 10 min, not to t(0)
      val w1 = t(0).getTime - t(0).getTime % 600000L; val w2 = w1 + 600000L
      assert(got == Map(
        (w1, "alpha") -> 6L, (w1, "beta") -> 3L, (w1, "gamma") -> 1L,
        (w2, "beta") -> 5L, (w2, "delta") -> 2L))
    } finally q.stop()
  }

  test("MG sketch candidates contain every true heavy hitter per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    // cap=2: guarantee covers terms with freq > N/(cap+1) = N/3
    val q = Trending.sketchCandidates(input.toDF().toDF("ts", "text"), cap = 2)
      .writeStream.format("memory").queryName("trend_mg")
      .outputMode("append").start()
    try {
      input.addData(feed: _*)
      q.processAllAvailable()
      val got = spark.table("trend_mg")
        .select(col("win_start"), col("candidates"))
        .as[(Timestamp, Seq[String])].collect()
        .map { case (w, c) => w.getTime -> c.toSet }.toMap
      // w1: N=10, bound 10/3 -> alpha (6) guaranteed; w2: N=7 -> beta (5)
      val w1 = t(0).getTime - t(0).getTime % 600000L
      assert(got(w1).contains("alpha"))
      assert(got(w1 + 600000L).contains("beta"))
      // state bound: never more than cap candidates per window
      got.values.foreach(c => assert(c.size <= 2))
    } finally q.stop()
  }

  test("sketch candidates == batch MG on the same window slice") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = Trending.sketchCandidates(input.toDF().toDF("ts", "text"), cap = 2)
      .writeStream.format("memory").queryName("trend_mg_batch")
      .outputMode("append").start()
    try {
      input.addData(feed: _*)
      q.processAllAvailable()
      val stream = spark.table("trend_mg_batch")
        .select(col("win_start"), col("candidates"))
        .as[(Timestamp, Seq[String])].collect()
        .map { case (w, c) => w.getTime -> c.toSet }.toMap
      val mg = udaf(new graft.functions.MisraGries(2))
      val batch = feed.take(4).toDF("ts", "text")
        .select(col("ts"), explode(split(col("text"), " ")).as("term"))
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(mg(col("term")).as("cands"))
        .select(col("window.start").as("w"), col("cands"))
        .as[(Timestamp, Seq[String])].collect()
        .map { case (w, c) => w.getTime -> c.toSet }.toMap
      assert(stream == batch)
    } finally q.stop()
  }
}
