package graft.bronze

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bronze-layer parity with the reference pipeline: partitioned write +
  * sidecar (S5/S6), idempotence (S7), listing (S8), reconciliation (J1),
  * daily/backfill orchestration (§3.1-3.3). */
class BronzeSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-bronze").toString

  private def extract(date: String) =
    Runner.extractEvents(spark, sf001, date)

  test("writeDay writes parquet + sidecar; checkExists flips; listing sees the day") {
    val root = freshRoot()
    assert(!Lake.checkExists(spark, root, "events", "2024-01-03"))
    val n = Lake.writeDay(spark, extract("2024-01-03"), root, "events", "2024-01-03")
    assert(n > 0)
    assert(Lake.checkExists(spark, root, "events", "2024-01-03"))
    val back = spark.read.parquet(Lake.dayDir(root, "events", "2024-01-03"))
    assert(back.count() == n)
    assert(back.columns.sorted.sameElements(
      Array("event_id", "event_type", "prop_k", "ts_us", "user_id", "value")))
    val meta = Lake.readMetadata(spark, root, "events", "2024-01-03")
    assert(meta.isDefined)
    assert(meta.get.contains(s""""record_count": $n"""))
    assert(meta.get.contains(""""date": "2024-01-03""""))
    assert(Lake.listAvailableDates(spark, root, "events") == Seq("2024-01-03"))
  }

  test("runDaily is idempotent: second run skips, lake content unchanged") {
    val root = freshRoot()
    val r1 = Runner.runDaily(spark, root, "events", "2024-01-03", extract)
    assert(r1.success && !r1.skipped && r1.recordsExtracted > 0)
    val r2 = Runner.runDaily(spark, root, "events", "2024-01-03", extract)
    assert(r2.success && r2.skipped && r2.recordsExtracted == 0)
    assert(spark.read.parquet(Lake.dayDir(root, "events", "2024-01-03")).count()
      == r1.recordsExtracted)
  }

  test("runDaily captures empty days and extraction errors as results") {
    val root = freshRoot()
    val empty = Runner.runDaily(spark, root, "events", "1999-01-01", extract)
    assert(!empty.success && empty.error.exists(_.contains("no records")))
    val boom = Runner.runDaily(spark, root, "events", "2024-01-03",
      _ => sys.error("extractor exploded"))
    assert(!boom.success && boom.error.exists(_.contains("extractor exploded")))
    assert(!Lake.checkExists(spark, root, "events", "2024-01-03"))
  }

  test("backfill ledgers + reconciliation find the failed day") {
    val root = freshRoot()
    // sf0.001 events span 2024-01-01..2024-01-05 (6th is sparse at this SF)
    val r = Runner.backfill(spark, root, "events", "2024-01-01", "2024-01-03", extract)
    assert(r.successfulDays == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(r.failedDays.isEmpty && r.skippedDays.isEmpty)
    assert(r.totalRecords ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03").map(extract(_).count()).sum)
    // second backfill over a superset: existing days skip, only new days run
    val r2 = Runner.backfill(spark, root, "events", "2024-01-01", "2024-01-04", extract)
    assert(r2.skippedDays == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(r2.successfulDays == Seq("2024-01-04"))
    val sink = Lake.listAvailableDates(spark, root, "events")
    assert(sink == Seq("2024-01-04", "2024-01-03", "2024-01-02", "2024-01-01"))
    assert(Lake.missingDates(Runner.dateRange("2024-01-01", "2024-01-05"), sink)
      == Seq("2024-01-05"))
  }

  test("backfillUnified produces the same lake rows as the day loop") {
    val loopRoot = freshRoot()
    val uniRoot = freshRoot()
    Runner.backfill(spark, loopRoot, "events", "2024-01-02", "2024-01-04", extract)
    val slice = Runner.extractEvents0(spark, sf001)
    Runner.backfillUnified(spark, uniRoot, "events", "2024-01-02", "2024-01-04", slice)
    val fromLoop = spark.read.parquet(s"$loopRoot/events")
      .select("event_id", "ts_us", "user_id", "event_type", "value", "prop_k")
    val fromUni = spark.read.parquet(s"$uniRoot/events")
      .select("event_id", "ts_us", "user_id", "event_type", "value", "prop_k")
    assert(fromLoop.count() == fromUni.count())
    assert(fromLoop.exceptAll(fromUni).isEmpty && fromUni.exceptAll(fromLoop).isEmpty)
    // the two writers share ONE layout: unified-written days are visible to
    // the listing, count as committed (runDaily skips them), and a follow-up
    // day-loop write lands in the SAME directory, not a sibling spelling
    assert(Lake.listAvailableDates(spark, uniRoot, "events")
      == Seq("2024-01-04", "2024-01-03", "2024-01-02"))
    val again = Runner.runDaily(spark, uniRoot, "events", "2024-01-03", extract)
    assert(again.skipped)
    val more = Runner.runDaily(spark, uniRoot, "events", "2024-01-05", extract)
    assert(more.success && !more.skipped)
    val total = spark.read.parquet(s"$uniRoot/events").count()
    assert(total == fromUni.count() + more.recordsExtracted,
      "mixed writers duplicated a partition")
  }

  test("partitionPath zero-pads and dateRange is inclusive") {
    assert(Lake.partitionPath("2024-03-07") == "year=2024/month=03/day=07")
    assert(Runner.dateRange("2024-01-30", "2024-02-02")
      == Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
    assertThrows[IllegalArgumentException](Runner.dateRange("2024-02-02", "2024-01-30"))
  }

  test("expireDays drops exactly the pre-cutoff partitions, data and sidecar") {
    val root = freshRoot()
    val days = Seq("2024-01-29", "2024-01-30", "2024-01-31", "2024-02-01")
    days.foreach(d => Lake.writeDay(spark, extract(d), root, "events", d))
    // cutoff is INCLUSIVE: 01-31 survives, 01-29/30 go
    val dropped = Lake.expireDays(spark, root, "events", keepFrom = "2024-01-31")
    assert(dropped == Seq("2024-01-29", "2024-01-30"))
    assert(Lake.listAvailableDates(spark, root, "events")
      == Seq("2024-02-01", "2024-01-31"))
    assert(!Lake.checkExists(spark, root, "events", "2024-01-30"))
    // the whole partition dir went, sidecar included
    assert(!Files.exists(java.nio.file.Paths.get(
      Lake.dayDir(root, "events", "2024-01-30"))))
    assert(Lake.readMetadata(spark, root, "events", "2024-02-01").nonEmpty)
    // idempotent: nothing left to expire
    assert(Lake.expireDays(spark, root, "events", "2024-01-31").isEmpty)
    assertThrows[java.time.format.DateTimeParseException](
      Lake.expireDays(spark, root, "events", "not-a-date"))
    // a crashed write's partition (data, no _SUCCESS) is invisible to
    // listAvailableDates but must still expire — it holds bytes
    val torn = Lake.dayDir(root, "events", "2024-01-02")
    Files.createDirectories(java.nio.file.Paths.get(torn))
    Files.write(java.nio.file.Paths.get(s"$torn/part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(Lake.listAvailableDates(spark, root, "events")
      == Seq("2024-02-01", "2024-01-31")) // readers never see it
    assert(Lake.expireDays(spark, root, "events", "2024-01-31")
      == Seq("2024-01-02"))               // retention reclaims it
    assert(!Files.exists(java.nio.file.Paths.get(torn)))
    // a partition another tool wrote UN-zero-padded parses to the same
    // date but lives at a different path — expiry must delete the dir the
    // glob actually FOUND, not a reconstructed zero-padded spelling
    // (which wouldn't exist: the delete would fail and the bytes leak)
    val sloppy = s"$root/events/year=2024/month=1/day=3"
    Files.createDirectories(java.nio.file.Paths.get(sloppy))
    Files.write(java.nio.file.Paths.get(s"$sloppy/part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(Lake.expireDays(spark, root, "events", "2024-01-31")
      == Seq("2024-01-03"))
    assert(!Files.exists(java.nio.file.Paths.get(sloppy)))
  }
}
