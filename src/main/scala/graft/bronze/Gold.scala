package graft.bronze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental gold materialization over the bronze lake: the
 * declared-but-unbuilt silver/gold layer of the reference (README.md:23-33)
 * as day-partitioned materialized aggregates with bronze-style idempotence.
 *
 * `refresh` computes ONLY bronze days missing from the gold table — each
 * one a partition-pruned read of a single bronze day directory — and
 * commits them through the same `_SUCCESS` protocol as the bronze writer.
 * At 100 TB/day this is the difference between reprocessing history and
 * touching one day: cost is O(new data), re-runs are no-ops, and a
 * backfilled bronze day automatically becomes a pending gold day on the
 * next refresh (reconciliation = Lake.missingDates).
 */
object Gold {

  /** Per-day event KPIs (counts, distinct users, exact value total by
    * event_type) from one bronze day's rows. */
  def dailyKpis(day: DataFrame): DataFrame =
    day.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Refresh the gold KPI table: materialize every committed bronze day not
    * yet committed in gold. Returns the days refreshed this call. */
  def refreshDailyKpis(spark: SparkSession, bronzeRoot: String,
                       goldRoot: String, dataType: String = "events"): Seq[String] = {
    val bronzeDays = Lake.listAvailableDates(spark, bronzeRoot, dataType)
    val goldDays = Lake.listAvailableDates(spark, goldRoot, s"${dataType}_kpis")
    val todo = Lake.missingDates(bronzeDays, goldDays)
    todo.foreach { d =>
      val day = spark.read.parquet(Lake.dayDir(bronzeRoot, dataType, d))
      Lake.writeDay(spark, dailyKpis(day), goldRoot, s"${dataType}_kpis", d)
    }
    todo
  }
}
