package graft.tools

import org.apache.spark.sql.SparkSession

/** Rehearses the driver's smoke gate with a BARE session (no graft configs,
  * no extensions) — guards the contract that SparkEntry.entry works in a
  * harness session we didn't build (Tables.events self-heals the
  * nanos-as-long conf at runtime there). */
object SmokeBare {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    assert(n > 0, "smoke gate would fail: entry returned no rows")
    spark.stop()
  }
}
