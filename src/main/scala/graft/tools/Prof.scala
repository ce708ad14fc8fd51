package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftExtensions

/** Throwaway: inspect post-execution AQE plan strings. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.01")
    df.count()
    println("=== executedPlan.toString after count ===")
    println(df.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
