package graft.bronze

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.Tables

/**
 * CLI parity with the reference's entry point
 * (/root/reference/scripts/run_pipeline.py:34-137): daily run, backfill,
 * status/reconciliation, connection test — over a source lake
 * (`--source`, default $SPARK_GRAFT_SF_DIR) and a bronze sink root
 * (`--root`).
 *
 * Usage (runMain graft.bronze.PipelineCli ...):
 *   daily    --root /lake [--date 2024-01-03] [--force]
 *   backfill --root /lake --start 2024-01-01 --end 2024-01-05
 *   status   --root /lake
 *   test     --root /lake
 *
 * `daily` without --date processes the newest source day (the reference
 * defaults to yesterday; a synthetic lake's clock is its data).
 */
object PipelineCli {

  private def arg(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("status")
    val source = arg(args, "--source")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val root = arg(args, "--root").getOrElse(sys.error("--root required"))
    val spark = graft.Conf.local(SparkSession.builder(), 4)
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cmd, args, source, root) finally spark.stop()
  }

  /** Distinct event days present in the source, newest first (the
    * reference's get_available_dates, bigquery_extractor.py:130-163). */
  def sourceDates(spark: SparkSession, source: String, limit: Int = 30): Seq[String] =
    Tables.events(spark, source)
      .select(to_date(col("ts")).cast("string").as("d"))
      .distinct().orderBy(col("d").desc).limit(limit)
      .collect().map(_.getString(0)).toSeq

  private[bronze] def run(spark: SparkSession, cmd: String, args: Array[String],
                          source: String, root: String): Unit = cmd match {
    case "daily" =>
      val date = arg(args, "--date")
        .getOrElse(sourceDates(spark, source, 1).headOption
          .getOrElse(sys.error("source has no event days")))
      val force = args.contains("--force")
      val r = Runner.runDaily(spark, root, "events", date,
        Runner.extractEvents(spark, source, _), skipExisting = !force)
      println(s"""{"cmd":"daily","date":"${r.date}","success":${r.success},""" +
        s""""skipped":${r.skipped},"records":${r.recordsExtracted}""" +
        r.error.map(e => s""","error":${graft.Jsons.quote(e)}""").getOrElse("") + "}")
    case "backfill" =>
      val (s, e) = (arg(args, "--start").get, arg(args, "--end").get)
      val r = Runner.backfill(spark, root, "events", s, e,
        Runner.extractEvents(spark, source, _),
        skipExisting = !args.contains("--force"))
      println(s"""{"cmd":"backfill","ok":${r.failedDays.isEmpty},""" +
        s""""successful":${r.successfulDays.size},"skipped":${r.skippedDays.size},""" +
        s""""failed":${r.failedDays.size},"records":${r.totalRecords}}""")
    case "status" =>
      val src = sourceDates(spark, source)
      val sink = Lake.listAvailableDates(spark, root, "events", limit = 30)
      val missing = Lake.missingDates(src, sink)
      println(s"""{"cmd":"status","source_days":${src.size},""" +
        s""""sink_days":${sink.size},""" +
        s""""missing":[${missing.map("\"" + _ + "\"").mkString(",")}]}""")
    case "test" =>
      // connection self-test (S9): source tables readable, sink root writable
      val srcOk = Tables.all.forall { t =>
        try { Tables.load(spark, source, t).schema.nonEmpty } catch { case _: Exception => false }
      }
      val sinkOk = try {
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(root)); true
      } catch { case _: Exception => false }
      println(s"""{"cmd":"test","source_ok":$srcOk,"sink_ok":$sinkOk}""")
    case other => sys.error(s"unknown command: $other")
  }
}
