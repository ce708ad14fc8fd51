package graft.catalog

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The drift monitor's POSITIVE path — the catalog corpus is stationary
  * (no flags, correct), so the decision branch is exercised on a planted
  * regime shift written as a real events.parquet. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("a planted second-half event type trips the drift flag") {
    def t(day: Int, i: Int) =
      new Timestamp(1700000000000L + day * 86400000L + i * 60000L)
    // "view": 50/day across days 0-9 (stationary); "bot": only days 5-9
    val rows =
      (for (d <- 0 until 10; i <- 0 until 50)
        yield (d.toLong * 1000 + i, t(d, i), i.toLong, "view", 1.0, "{}")) ++
      (for (d <- 5 until 10; i <- 0 until 8)
        yield (90000L + d * 100 + i, t(d, 500 + i), 7L, "bot", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("drift-events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val byType = SparkEntry.queries("drift_event_mix_chi2")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    val (botA, botB, botFlag) = byType("bot")
    assert(botA == 0L && botB == 40L && botFlag == 1, byType.toString)
    // with only two types the 2x2 is symmetric: view mirrors bot's shift
    assert(byType("view")._3 == 1, byType.toString)
  }

  test("the stationary catalog corpus reports zero flags (no false drift)") {
    val flags = SparkEntry.queries("drift_event_mix_chi2")(spark, sf001)
      .agg(sum($"drift_flag")).as[Long].head()
    assert(flags == 0L)
  }
}
