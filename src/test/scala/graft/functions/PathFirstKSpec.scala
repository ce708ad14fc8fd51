package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class PathFirstKSpec extends SparkSpec {

  import spark.implicits._

  private val agg = new PathFirstK(10)

  test("buffer is bounded by k at every reduce/merge step") {
    val rnd = new Random(42)
    val events = (1 to 100000).map(i =>
      PathEvent(rnd.nextLong(1000000), i.toLong, s"e${i % 7}"))
    var buf = agg.zero
    events.take(50000).foreach { e =>
      buf = agg.reduce(buf, e)
      assert(buf.items.size <= 10)
      assert(buf.items == buf.items.sortBy(x => (x.tsUs, x.eventId, x.eventType)))
    }
    // merge of two full buffers over disjoint halves stays bounded and exact
    val other = events.drop(50000).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(buf, other)
    assert(merged.items.size <= 10)
    assert(agg.finish(merged) ==
      events.sortBy(x => (x.tsUs, x.eventId, x.eventType)).take(10)
        .map(_.eventType).mkString(">"))
  }

  test("reduce/merge order never changes the result") {
    val rnd = new Random(7)
    val events = (1 to 500).map(i =>
      PathEvent(rnd.nextLong(50), rnd.nextLong(50), s"t${i % 5}"))
    val expected = agg.finish(events.foldLeft(agg.zero)(agg.reduce))
    (1 to 10).foreach { seed =>
      val shuffled = new Random(seed).shuffle(events)
      val parts = shuffled.grouped(37).map(_.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(parts.foldLeft(agg.zero)(agg.merge)) == expected)
    }
  }

  test("null-bearing rows are droppable before the udaf (call-site contract)") {
    // PathEvent's encoder rejects null fields at runtime; the catalog
    // pre-filters (journey_first10_paths, mirrored in its oracle). This
    // pins the pattern: filtered input aggregates cleanly, nulls gone.
    val firstTen = udaf(new PathFirstK(3))
    val rows = Seq(
      (Some(3L), Some(1L), Some("a"), "u1"),
      (None, Some(2L), Some("x"), "u1"), // null ts
      (Some(1L), Some(3L), Some("b"), "u1"),
      (Some(2L), None, Some("x"), "u1"), // null id
      (Some(4L), Some(4L), None, "u1"), // null type
      (Some(2L), Some(5L), Some("c"), "u1"))
      .toDF("ts_us", "event_id", "event_type", "user_id")
    val out = rows
      .filter($"ts_us".isNotNull && $"event_id".isNotNull && $"event_type".isNotNull)
      .groupBy($"user_id")
      .agg(firstTen($"ts_us", $"event_id", $"event_type").as("path"))
      .as[(String, String)].collect()
    assert(out.sameElements(Array(("u1", "b>c>a"))))
  }

  test("udaf == unbounded collect-sort-slice on the events table") {
    val firstTen = udaf(new PathFirstK(10))
    val ev = Tables.events(spark, sf001)
    val bounded = ev.groupBy($"user_id")
      .agg(firstTen(unix_micros($"ts"), $"event_id", $"event_type").as("path"))
    val unbounded = ev.groupBy($"user_id")
      .agg(array_join(
        transform(
          slice(array_sort(collect_list(struct(
            unix_micros($"ts").as("ts_us"), $"event_id", $"event_type"))),
            1, 10),
          x => x.getField("event_type")), ">").as("path"))
    assert(bounded.exceptAll(unbounded).isEmpty &&
      unbounded.exceptAll(bounded).isEmpty)
  }

  test("a 1M-event hot user aggregates with flat state") {
    // the scenario that sinks the unbounded form at 100 TB: one key owning
    // a huge slice of the input; state here stays at 10 rows per partial
    val hot = spark.range(1000000).select(
      lit(1L).as("user_id"),
      (lit(2000000L) - $"id").as("ts_us"), // descending ts: worst case —
      $"id".as("event_id"),                // every early row displaces
      concat(lit("e"), pmod($"id", lit(3))).as("event_type"))
    val firstTen = udaf(new PathFirstK(10))
    val path = hot.groupBy($"user_id")
      .agg(firstTen($"ts_us", $"event_id", $"event_type").as("path"))
      .head().getString(1)
    // smallest ts_us = 2000000-999999 ... ids 999999 down to 999990
    val expected = (999999L to 999990L by -1)
      .map(i => s"e${i % 3}").mkString(">")
    assert(path == expected)
  }
}
