package graft.bronze

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoldSpec extends SparkSpec {

  test("incremental gold refresh == full recompute; re-runs are no-ops") {
    val bronze = Files.createTempDirectory("graft-gold-bronze").toString
    val gold = Files.createTempDirectory("graft-gold").toString
    def extract(d: String) = Runner.extractEvents(spark, sf001, d)

    Runner.backfill(spark, bronze, "events", "2024-01-01", "2024-01-03", extract)
    val first = Gold.refreshDailyKpis(spark, bronze, gold)
    assert(first == Seq("2024-01-01", "2024-01-02", "2024-01-03"))

    // idempotent: nothing new -> nothing recomputed
    assert(Gold.refreshDailyKpis(spark, bronze, gold).isEmpty)

    // a late-arriving bronze day becomes pending on the next refresh
    Runner.runDaily(spark, bronze, "events", "2024-01-04", extract)
    assert(Gold.refreshDailyKpis(spark, bronze, gold) == Seq("2024-01-04"))

    // union of per-day gold partitions == direct aggregation over all bronze
    // roll up through decimal: per-day totals are exact 2dp rationals, so
    // decimal summation recovers the exact grand total (double addition of
    // the day values would drift an ulp vs the single-pass decimal sum)
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy("event_type")
      .agg(sum("n_events").as("n_events"),
        sum(col("total_value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
    val goldAll = rollup(spark.read.parquet(s"$gold/events_kpis"))
    val directRolled = rollup(
      Gold.dailyKpis(spark.read.parquet(s"$bronze/events"))
        .select(col("event_type"), col("n_events"), col("total_value")))
    assert(goldAll.exceptAll(directRolled).isEmpty &&
      directRolled.exceptAll(goldAll).isEmpty)
    // and each gold day carries its sidecar like any lake partition
    assert(Lake.readMetadata(spark, gold, "events_kpis", "2024-01-02").isDefined)
  }
}
